package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.warehouse.ZOrderLayout

/** Z-order layout quality: the whole point of the curve is that file/bucket
  * bounding boxes stay tight on BOTH clustered dimensions — these specs
  * measure that, against the full domain and against a single-column sort.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def domain(col1: String): (Long, Long) = {
    val r = Tables.lineitem(spark, sf)
      .agg(min(col(col1)).cast("long"), max(col(col1)).cast("long"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  test("z-order buckets bound BOTH dimensions; a 1-D sort bounds only one") {
    val (pLo, pHi) = domain("l_partkey")
    val (sLo, sHi) = domain("l_suppkey")
    val pDom = (pHi - pLo).toDouble.max(1)
    val sDom = (sHi - sLo).toDouble.max(1)

    val z = ZOrderLayout.zorderStats(spark, sf)
      .agg(
        avg($"max_partkey" - $"min_partkey").as("p_span"),
        avg($"max_suppkey" - $"min_suppkey").as("s_span"))
      .head()
    val (zP, zS) = (z.getDouble(0) / pDom, z.getDouble(1) / sDom)
    // 6 bucket bits = 3 per dimension → each cell covers ~1/8 of each
    // domain; allow rounding slack but demand real 2-D locality
    assert(zP < 0.3, s"partkey span ratio $zP should be ~1/8")
    assert(zS < 0.3, s"suppkey span ratio $zS should be ~1/8")

    // the comparison layout: same bucket count, but ordered by partkey
    // only — its partkey spans are tiny and its suppkey spans are the
    // whole domain, the asymmetry z-order exists to remove
    val li = Tables.lineitem(spark, sf).select($"l_partkey", $"l_suppkey")
    val sorted = li
      .withColumn("bucket",
        shiftright(ZOrderLayout.normalize($"l_partkey", lit(pLo), lit(pHi)),
          13))
      .groupBy($"bucket")
      .agg((max($"l_suppkey") - min($"l_suppkey")).as("span"))
      .agg(avg($"span")).head().getDouble(0) / sDom
    assert(sorted > 0.9, s"1-D sort should leave suppkey unbounded, got $sorted")
    assert(zS < sorted / 2,
      s"z-order suppkey spans ($zS) must beat the 1-D sort's ($sorted)")
  }

  test("layout writer: files are z-contiguous with tight per-file boxes") {
    val out = Files.createTempDirectory("zorder").toString + "/li"
    val li = Tables.lineitem(spark, sf).select($"l_partkey", $"l_suppkey")
    ZOrderLayout.layout(li, "l_partkey", "l_suppkey", 8, out)
    val back = spark.read.parquet(out)
    assert(back.count() == li.count(), "layout must preserve every row")
    assert(back.columns.toSeq == Seq("l_partkey", "l_suppkey"),
      "the z column must not leak into the written schema")
    // each written file is one range-partition: measure its real box
    val (pLo, pHi) = domain("l_partkey")
    val (sLo, sHi) = domain("l_suppkey")
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 4, s"expected multiple files, got ${files.length}")
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(max($"l_partkey") - min($"l_partkey"),
          max($"l_suppkey") - min($"l_suppkey")).head()
      (r.getLong(0).toDouble / (pHi - pLo).max(1),
        r.getLong(1).toDouble / (sHi - sLo).max(1))
    }
    val avgP = spans.map(_._1).sum / spans.length
    val avgS = spans.map(_._2).sum / spans.length
    assert(avgP < 0.6 && avgS < 0.6,
      s"per-file boxes should be tight on both dims, got p=$avgP s=$avgS")
  }
}
