package graft

import graft.warehouse.Warehouse
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit semantics of the warehouse build (SURVEY §5): age-bucket bounds (F1),
  * ISO day-of-week (F4), decorrelated-count zero defaults (J7), EXISTS flag
  * (J6), conservation properties, idempotence of the materialize step.
  */
class WarehouseSpec extends SparkSpec {
  private lazy val wh = Warehouse.forDir(spark, sf)
  import spark.implicits._

  test("incremental agg maintenance is bit-identical to the full recompute") {
    val o = Tables.orders(spark, sf)
    val m = warehouse.IncrementalAgg.Mod
    // the carved change feed must actually exercise both delta branches
    assert(o.filter(pmod($"o_orderkey", lit(m)) === 0).count() > 0)
    assert(o.filter(pmod($"o_orderkey", lit(m)) === 1).count() > 0)
    val maintained = warehouse.IncrementalAgg.maintainedMonthly(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val direct = o.filter(pmod($"o_orderkey", lit(m)) =!= 1)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("rev"))
      .orderBy($"ym")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // exact equality including the double — the delta algebra is decimal-
    // exact, so the maintained view carries no drift whatsoever
    assert(maintained.nonEmpty && maintained.sameElements(direct))
  }

  test("age_group bucket bounds match the reference CASE (populate_warehouse.py:68-74)") {
    val got = Seq(-0.01, 0.0, 2499.99, 2500.0, 4999.99, 5000.0, 7499.99, 7500.0, 99999.0)
      .toDF("bal")
      .select(Warehouse.ageGroup($"bal"))
      .as[String].collect().toSeq
    assert(got == Seq("Unknown", "18-30", "18-30", "31-50", "31-50", "51-70",
      "51-70", "71+", "71+"))
  }

  test("dim_time day_of_week is ISO (Mon=1..Sun=7) and is_weekend matches") {
    // 2024-01-01 was a Monday, 2024-01-06 a Saturday, 2024-01-07 a Sunday.
    val dt = wh.dimTime.filter($"date_key".isin(20240101, 20240106, 20240107))
      .select($"date_key", $"day_of_week", $"day_name", $"is_weekend")
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getString(2), r.getBoolean(3)))).toMap
    if (dt.contains(20240101)) // only if the orders span covers it
      assert(dt(20240101) == ((1, "Monday", false)))
    if (dt.contains(20240106))
      assert(dt(20240106) == ((6, "Saturday", true)))
    if (dt.contains(20240107))
      assert(dt(20240107) == ((7, "Sunday", true)))
    // structural invariants hold over the whole dim
    val bad = wh.dimTime.filter(
      !$"day_of_week".between(1, 7) ||
        ($"is_weekend" =!= ($"day_of_week" >= 6))).count()
    assert(bad == 0)
    assert(wh.dimTime.select($"date_key").distinct().count() == wh.dimTime.count())
  }

  test("dim_time covers the full orders date span with no gaps") {
    val Row(lo: java.sql.Date, hi: java.sql.Date) = Tables.orders(spark, sf)
      .agg(min(to_date($"o_orderdate")), max(to_date($"o_orderdate"))).head()
    val expected = (hi.toLocalDate.toEpochDay - lo.toLocalDate.toEpochDay) + 1
    assert(wh.dimTime.count() == expected)
  }

  test("fact row count equals orders count (J4 preserves every encounter)") {
    assert(wh.factEncounters.count() == Tables.orders(spark, sf).count())
  }

  test("num_procedures conserves lineitem rows; num_diagnoses conserves bridge rows (J7)") {
    val sums = wh.factEncounters
      .agg(sum($"num_procedures"), sum($"num_diagnoses")).head()
    assert(sums.getLong(0) == Tables.lineitem(spark, sf).count())
    assert(sums.getLong(1) == wh.bridgeDiagnosis.count())
  }

  test("orders without lineitems default to zero counts, not null (J7 LEFT semantics)") {
    assert(wh.factEncounters.filter($"num_procedures".isNull || $"num_diagnoses".isNull).count() == 0)
    // the testdata does contain childless orders — the default path is exercised
    val childless = wh.factEncounters.filter($"num_procedures" === 0).count()
    val expected = Tables.orders(spark, sf).join(Tables.lineitem(spark, sf),
      $"o_orderkey" === $"l_orderkey", "left_anti").count()
    assert(childless == expected)
  }

  test("has_report is the EXISTS(documents) semi-join flag (J6)") {
    val flagged = wh.factEncounters.filter($"has_report").count()
    val expected = Tables.orders(spark, sf)
      .join(Tables.documents(spark, sf).select($"doc_id").distinct(),
        $"o_orderkey" === $"doc_id", "left_semi").count()
    assert(flagged == expected)
  }

  test("bridge tables have unique (encounter, key) PKs (D1 group-dedup)") {
    assert(wh.bridgeProcedure.groupBy($"encounter_key", $"procedure_key")
      .count().filter($"count" > 1).count() == 0)
    assert(wh.bridgeDiagnosis.groupBy($"encounter_key", $"diagnosis_key")
      .count().filter($"count" > 1).count() == 0)
  }

  test("partitioned fact layout: month partitions, same rows, pruned scans") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val work = java.nio.file.Files.createTempDirectory("graft-whpart").toString
    val whp = Warehouse.materialize(spark, sf, work, partitionFact = true)
    // physical layout: one directory per encounter month
    val dirs = new java.io.File(s"$work/fact_encounters").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("month_key=")), dirs.toSeq)
    // no rows lost or duplicated vs the flat layout
    assert(whp.factEncounters.count() == wh.factEncounters.count())
    assert(whp.factEncounters
      .filter($"month_key" =!= ($"date_key" / 100).cast("int")).count() == 0)
    // a month-ranged query reads only its partition (static pruning)
    val m = whp.factEncounters.select($"month_key").head.getInt(0)
    val q = whp.factEncounters.filter($"month_key" === m)
    q.collect()
    val scans = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.exists(_.partitionFilters.nonEmpty),
      s"month filter should prune partitions: ${scans.map(_.partitionFilters)}")
    // and the matviews built over the partitioned fact agree with the flat ones
    assert(whp.mvMonthlyEncounters.count() == wh.mvMonthlyEncounters.count())
  }

  test("reports entity: one row per document, facility rollup conserves reports") {
    val dim = warehouse.Reports.dimReport(spark, sf)
    assert(dim.count() == Tables.documents(spark, sf).count())
    assert(dim.filter($"impression".isNull || length($"findings") === 0).count() == 0)
    // every flagged encounter with a landed document appears in exactly one
    // facility bucket (facility_key is never null for testdata orders)
    val rolled = warehouse.Reports.textByFacility(spark, sf)
      .agg(sum($"n_reports")).head().getLong(0)
    val expected = wh.factEncounters.filter($"has_report")
      .join(Tables.documents(spark, sf).select($"doc_id"),
        $"encounter_key" === $"doc_id").count()
    assert(rolled == expected)
  }

  test("materialize is idempotent (re-run overwrites to the same state)") {
    val work = java.nio.file.Files.createTempDirectory("graft-idem").toString
    val w1 = Warehouse.materialize(spark, sf, work)
    val c1 = w1.factEncounters.count()
    val s1 = w1.factEncounters.agg(sum($"num_procedures")).head().getLong(0)
    val w2 = Warehouse.materialize(spark, sf, work)
    assert(w2.factEncounters.count() == c1)
    assert(w2.factEncounters.agg(sum($"num_procedures")).head().getLong(0) == s1)
  }

  test("write-audit-publish: failed audit invisible, publish atomic, time travel") {
    import graft.warehouse.Publish
    val dir = java.nio.file.Files.createTempDirectory("wap").toString
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val rowCountAudit: org.apache.spark.sql.DataFrame => Boolean =
      df => df.count() > 0
    val noNegatives: org.apache.spark.sql.DataFrame => Boolean =
      df => df.filter($"value" < 0).count() == 0

    // v1 publishes
    val v1 = Publish.writeAuditPublish(events, dir, Seq(rowCountAudit, noNegatives))
    assert(v1.contains(1) && Publish.currentVersion(spark, dir) == 1)
    assert(Publish.read(spark, dir).count() == events.count())

    // a bad batch (negative values) FAILS its audit: pointer untouched,
    // readers still see v1
    val bad = events.withColumn("value", -$"value" - 1)
    val rejected = Publish.writeAuditPublish(bad, dir, Seq(rowCountAudit, noNegatives))
    assert(rejected.isEmpty && Publish.currentVersion(spark, dir) == 1)
    assert(Publish.read(spark, dir).filter($"value" < 0).count() == 0)

    // v2 (a filtered rewrite) publishes; v1 remains readable (time travel)
    val v2data = events.filter($"event_id" % 2 === 0)
    val v2 = Publish.writeAuditPublish(v2data, dir, Seq(rowCountAudit, noNegatives))
    assert(v2.contains(2) && Publish.currentVersion(spark, dir) == 2)
    assert(Publish.read(spark, dir).count() == v2data.count())
    assert(Publish.readVersion(spark, dir, 1).count() == events.count())

    // crash-retry: an UNMARKED v3 (rename done, marker never written) must
    // stay invisible AND keep its version number occupied — the retry
    // publishes as v4, never renaming onto the stale directory
    val stale = new java.io.File(s"$dir/v3")
    assert(stale.mkdir())
    assert(Publish.currentVersion(spark, dir) == 2, "unmarked dir invisible")
    val v4 = Publish.writeAuditPublish(v2data, dir, Seq(rowCountAudit))
    assert(v4.contains(4), s"retry must skip the crashed v3, got $v4")
    assert(Publish.currentVersion(spark, dir) == 4)
    assert(Publish.read(spark, dir).count() == v2data.count())
  }
}
