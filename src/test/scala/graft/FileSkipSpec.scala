package graft

import graft.plans.{FileSkipIndex, SkipPrunedFileIndex}
import graft.warehouse.FileSkip
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan gates for [[graft.plans.FileSkipIndex]]: result correctness is the
  * DuckDB oracle's job (the three `wh_fileskip_*` entries); this spec pins
  * WHAT the executed scan reads — the file-list cut itself, which the
  * oracle compare cannot see — plus the soundness edges (parity under
  * random probes, empty kept set, stale sidecar, unsupported predicates,
  * cleared-registry fresh-session sidecar load).
  */
class FileSkipSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    df.collect() // materialize so AQE final plan + metrics exist
    collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
  }

  private def filesRead(df: DataFrame): Long =
    scans(df).map(_.metrics("numFiles").value).sum

  test("both z-order dimensions prune the SAME layout's executed file list") {
    val x = FileSkip.xRange(spark, sf)
    val y = FileSkip.yRange(spark, sf)
    val (nx, ny) = (filesRead(x), filesRead(y))
    assert(nx > 0 && nx < FileSkip.NFiles, s"x-range read $nx files")
    assert(ny > 0 && ny < FileSkip.NFiles, s"y-range read $ny files")
    assert(scans(x).forall(_.relation.location.isInstanceOf[SkipPrunedFileIndex]))
  }

  test("point lookup on the unclustered key prunes via the Bloom page") {
    val p = FileSkip.pointLookup(spark, sf)
    val n = filesRead(p)
    // envelopes can't cut an unclustered key; only the Bloom filter can.
    // The key's rows live in ≤7 files; fpp ≪ 1% leaves no false opens.
    assert(n > 0 && n <= 8, s"point lookup read $n of ${FileSkip.NFiles} files")
    assert(p.collect().nonEmpty, "probe key must exist in the corpus")
  }

  test("pruned results equal the rule-off twins (kill-switch parity)") {
    assert(FileSkip.xRange(spark, sf).collect().toSeq ==
      FileSkip.xRangeOff(spark, sf).collect().toSeq)
    assert(FileSkip.pointLookup(spark, sf).collect().toSeq ==
      FileSkip.pointLookupOff(spark, sf).collect().toSeq)
  }

  test("random range/point/in probes: pruned ≡ unpruned, including empty " +
      "kept sets and absent keys") {
    import org.apache.spark.sql.functions._
    val path = FileSkip.layoutPath(spark, sf)
    val on = {
      val s = graft.plans.ChildSession(spark)
      FileSkipIndex.install(s)
      s.conf.set(FileSkipIndex.EnabledKey, "true")
      s.read.parquet(path)
    }
    val off = graft.plans.ChildSession(spark).read.parquet(path)
    val rnd = new scala.util.Random(0xF11E5)
    for (_ <- 1 to 12) {
      val lo = rnd.nextInt(260).toLong; val hi = lo + rnd.nextInt(120)
      val key = rnd.nextInt(40000).toLong // mostly absent keys
      val ins = Seq.fill(3)(rnd.nextInt(300).toLong)
      def probe(df: DataFrame) = Seq(
        df.filter(col("l_partkey") >= lo && col("l_partkey") <= hi)
          .agg(count(lit(1)), sum(col("l_quantity"))).collect().toSeq,
        df.filter(col("l_orderkey") === key)
          .agg(count(lit(1))).collect().toSeq,
        df.filter(col("l_suppkey").isin(ins: _*))
          .agg(count(lit(1))).collect().toSeq)
      assert(probe(on) == probe(off), s"mismatch at lo=$lo hi=$hi key=$key")
    }
  }

  test("a cleared registry reloads the sidecar: a fresh session still prunes") {
    FileSkip.layoutPath(spark, sf) // ensure landed + sidecar persisted
    FileSkipIndex.clear()
    val n = filesRead(FileSkip.xRange(spark, sf))
    assert(n > 0 && n < FileSkip.NFiles,
      s"fresh session read $n files — sidecar load must restore pruning")
  }

  test("stale sidecar (recorded lengths differ) disables pruning, never " +
      "results") {
    val path = FileSkip.layoutPath(spark, sf)
    val real = FileSkipIndex.registered(path)
      .getOrElse(fail("layout must be registered"))
    try {
      FileSkipIndex.register(real.copy(files =
        real.files.map(f => f.copy(len = f.len + 1))))
      val df = FileSkip.xRange(spark, sf)
      assert(filesRead(df) == FileSkip.NFiles,
        "every stat is stale ⇒ every file must be kept")
      assert(df.collect().toSeq == FileSkip.xRangeOff(spark, sf).collect().toSeq)
    } finally FileSkipIndex.register(real)
  }

  test("unsupported predicate shapes leave the plan untouched") {
    import org.apache.spark.sql.functions._
    val path = FileSkip.layoutPath(spark, sf)
    val s = graft.plans.ChildSession(spark)
    FileSkipIndex.install(s)
    s.conf.set(FileSkipIndex.EnabledKey, "true")
    // double-typed column: no integral envelope semantics
    val df = s.read.parquet(path).filter(col("l_quantity") > 25.0)
      .agg(count(lit(1)))
    df.collect()
    assert(collectAll(df.queryExecution.executedPlan) {
      case sc: FileSourceScanExec => sc.relation.location
    }.forall(!_.isInstanceOf[SkipPrunedFileIndex]))
  }
}
