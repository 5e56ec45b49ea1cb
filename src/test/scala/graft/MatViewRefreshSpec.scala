package graft

import graft.warehouse.Warehouse
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental matview refresh: rebuilding one year's partition restores it
  * exactly, without touching the other partitions (A10 at scale).
  */
class MatViewRefreshSpec extends SparkSpec {
  import spark.implicits._

  test("refreshMonthlyYears restores a deleted year partition, leaves others intact") {
    val work = Files.createTempDirectory("mv-refresh").toString
    val wh = Warehouse.materialize(spark, sf, work)
    val full = wh.mvMonthlyEncounters
      .orderBy($"year", $"month").collect().map(_.toString)
    val years = wh.mvMonthlyEncounters.select($"year").distinct()
      .as[Int].collect().sorted
    assert(years.length >= 2, "need multiple year partitions")
    val victim = years.head

    // simulate a partition invalidated by late/corrected facts
    val victimDir = new java.io.File(s"$work/mv_monthly_encounters/year=$victim")
    assert(victimDir.exists)
    victimDir.listFiles().foreach(_.delete()); victimDir.delete()
    val after = spark.read.parquet(s"$work/mv_monthly_encounters")
    assert(after.filter($"year" === victim).count() == 0)

    Warehouse.refreshMonthlyYears(spark, sf, work, Seq(victim))
    val restored = spark.read.parquet(s"$work/mv_monthly_encounters")
      .orderBy($"year", $"month").collect().map(_.toString)
    assert(restored.sameElements(full), "partition refresh == full rebuild")
  }
}
