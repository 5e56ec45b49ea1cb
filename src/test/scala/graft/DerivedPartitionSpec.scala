package graft

import graft.plans.DerivedPartitionFilter
import graft.warehouse.PartitionedFact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Plan gates and soundness corners for
  * [[graft.plans.DerivedPartitionFilter]] — generated-column partition
  * pruning. Result correctness of the registered query is the DuckDB
  * oracle's job (`wh_derived_prune_scan`); this spec pins WHERE the scan
  * reads from (the executed PartitionFilters and partitions-read count)
  * and the shapes the rule must and must not touch.
  */
class DerivedPartitionSpec extends SparkSpec {

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    val scans = collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one scan, got ${scans.size}")
    scans.head
  }

  /** Partitions actually read, from the scan's own SQL metric (populated
    * at execution — hence the collect() first).
    */
  private def partitionsRead(df: DataFrame): Long = {
    df.collect()
    scanOf(df).metrics("numPartitions").value
  }

  test("date-range filter on the data column prunes the month layout to " +
      "the implied months; rows match the rule-off twin") {
    val on = PartitionedFact.derivedPruneScan(spark, sf)
    val scan = scanOf(on)
    assert(scan.partitionFilters.exists(
        _.references.exists(_.name == "month_key")),
      s"executed scan must carry an implied month_key partition filter, " +
        s"got ${scan.partitionFilters}")
    // Jan 15 .. Apr 10 implies months 199601..199604: exactly 4 read
    val onParts = partitionsRead(on)
    assert(onParts == 4, s"expected 4 partitions read, got $onParts")
    val off = PartitionedFact.derivedPruneScanOff(spark, sf)
    val offParts = partitionsRead(off)
    assert(offParts > 10,
      s"the control must really scan the whole layout, got $offParts")
    assert(on.collect().toSeq == off.collect().toSeq,
      "implied predicates must not change results (they are strictly weaker)")
  }

  // ---- planted layout for the shape corners -------------------------------

  private def planted(tag: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft-derived-part/$tag"
    spark.range(1000).selectExpr("id", "id % 7 AS v")
      .withColumn("pk", (col("id") / 100).cast("int"))
      .write.mode("overwrite").partitionBy("pk").parquet(dir)
    dir
  }

  private def ruleSession(): SparkSession = {
    val s = spark.newSession()
    DerivedPartitionFilter.install(s)
    s.conf.set(DerivedPartitionFilter.EnabledKey, "true")
    s
  }

  test("equality, IN, and strict-bound shapes derive; results stay exact") {
    val dir = planted("shapes")
    DerivedPartitionFilter.register(dir, "id", "pk", 100L)
    val s = ruleSession()
    def q(f: DataFrame => DataFrame): DataFrame =
      f(s.read.parquet(dir)).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    def stock(f: DataFrame => DataFrame): Seq[String] =
      f(spark.read.parquet(dir))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .collect().map(_.toString).toSeq

    // equality: id = 250 → pk = 2, one partition read
    val eq = q(_.filter(col("id") === 250))
    assert(partitionsRead(eq) == 1, "equality must prune to one partition")
    assert(eq.collect().map(_.toString).toSeq == stock(_.filter(col("id") === 250)))

    // IN: ids across two partitions → pk IN (0, 7)
    val in = q(_.filter(col("id").isin(25L, 77L, 704L)))
    assert(partitionsRead(in) == 2, "IN must prune to the implied partitions")
    assert(in.collect().map(_.toString).toSeq ==
      stock(_.filter(col("id").isin(25L, 77L, 704L))))

    // strict bounds: id > 199 && id < 401 → pk ∈ [1, 4] (sound, one month
    // loose on each open end — the original predicate keeps it exact)
    val rng = q(_.filter(col("id") > 199 && col("id") < 401))
    val nParts = partitionsRead(rng)
    assert(nParts <= 4 && nParts >= 3, s"strict bounds must prune, got $nParts")
    assert(rng.collect().map(_.toString).toSeq ==
      stock(_.filter(col("id") > 199 && col("id") < 401)))
  }

  test("negative controls: disabled session, unregistered path, and a " +
      "computed look-alike column stay untouched") {
    val dir = planted("neg")
    DerivedPartitionFilter.register(dir, "id", "pk", 100L)
    // disabled session (rule installed but not enabled): no derivation
    val off = spark.newSession()
    DerivedPartitionFilter.install(off)
    val q1 = off.read.parquet(dir).filter(col("id") === 250)
      .agg(count(lit(1)))
    assert(scanOf(q1).partitionFilters.isEmpty,
      "disabled session must not derive")
    // unregistered sibling path: enabled session, no derivation
    val dir2 = planted("neg-unreg")
    val s = ruleSession()
    val q2 = s.read.parquet(dir2).filter(col("id") === 250)
      .agg(count(lit(1)))
    assert(scanOf(q2).partitionFilters.isEmpty,
      "unregistered relation must not derive")
    // a COMPUTED column named like the data column breaks the exprId
    // match (the projection sits between the filter and the relation):
    // the rule must not derive from the look-alike
    val q3 = s.read.parquet(dir)
      .select((col("id") + 1000000).as("id"), col("v"), col("pk"))
      .filter(col("id") === 1000250)
      .agg(count(lit(1)).as("n"))
    assert(scanOf(q3).partitionFilters.isEmpty,
      "a computed look-alike must not derive a (wrong) partition filter")
    // and its result is exact
    assert(q3.collect().head.getLong(0) == 1L)
  }
}
