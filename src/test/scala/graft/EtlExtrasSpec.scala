package graft

import graft.analytics.TimeSeries
import graft.ingest.EtlExtras
import org.apache.spark.sql.functions._

/** Semantics of the ETL-hygiene and time-series batch that the row-hash
  * oracle can't see: mergeSchema/unionEvolved equivalence, pseudonym
  * stability, planted-gap recovery, and distribution closure properties.
  */
class EtlExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("schema evolution: every gen0 row is default-filled, none of gen1") {
    val rows = EtlExtras.schemaEvolution(spark, sf).collect()
    assert(rows.length == 2)
    val byGen = rows.map(r => r.getInt(0) -> r).toMap
    assert(byGen(0).getLong(1) == byGen(0).getLong(2)) // all gen0 defaulted
    assert(byGen(1).getLong(2) == 0L) // no gen1 row defaulted
    assert(byGen(0).getDouble(3) == 0.0) // defaults contribute zero sum
  }

  test("pseudonymization preserves the key's cardinality and hides it") {
    val out = EtlExtras.pseudonymize(spark, sf)
    assert(!out.columns.contains("user_id"))
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(out.count() == nUsers)
    // stable mapping: total events conserved through the surrogate rollup
    val total = out.agg(sum($"n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("id gap detection recovers exactly the planted runs") {
    val gaps = EtlExtras.idGaps(spark, sf).collect()
    assert(gaps.nonEmpty)
    gaps.foreach { g =>
      assert(g.getLong(2) == EtlExtras.GapRun) // every planted gap is a full run
      assert(g.getLong(0) % (EtlExtras.GapRun * EtlExtras.GapEvery)
        == 7L * EtlExtras.GapRun) // ... at the planted offset
    }
  }

  test("seasonal profile shares close to 1 per event type") {
    val rows = TimeSeries.seasonalProfile(spark, sf)
      .groupBy($"event_type").agg(sum($"hour_share").as("s")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("cumulative uniques is monotone and ends at the user count") {
    val rows = TimeSeries.cumulativeUniques(spark, sf).collect()
    val cums = rows.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(cums.last == nUsers)
    assert(rows.map(_.getLong(1)).sum == nUsers)
  }

  test("rebased index starts at exactly 100") {
    val rows = TimeSeries.rebaseIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getDouble(2) == 100.0)
    rows.foreach(r => assert(r.getDouble(2) > 0))
    val yms = rows.map(_.getInt(0))
    assert(yms.sameElements(yms.sorted))
  }

  test("equi-depth bins partition each type evenly with nested spans") {
    val byType = TimeSeries.equidepthBins(spark, sf).collect()
      .groupBy(_.getString(0))
    val counts = Tables.events(spark, sf)
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (tpe, bins) =>
      assert(bins.map(_.getInt(1)).sorted.toSeq == (1 to TimeSeries.Bins))
      val sizes = bins.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1) // ntile balance
      assert(sizes.sum == counts(tpe))
      val ordered = bins.sortBy(_.getInt(1))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) <= b.getDouble(3))
        case _ =>
      }
    }
  }
}
