package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural guard against ORPHANED MODULES — the failure class that
  * shipped twice (round 6: JsonOps, round 7: SkewAdvisor): a finished
  * module exposing `all`/`oracle` maps that nobody wired into
  * [[SparkEntry]], so its queries exist with ZERO gate coverage.
  *
  * `VerifySchemaSpec`'s orphan test only checks SparkEntry-internal
  * consistency (queries.keySet == oracleSql.keySet) — blind to a module
  * absent from BOTH maps. This spec closes the hole structurally via
  * [[Registry]]: the compiled classpath is scanned for every `graft.*`
  * singleton whose `all` method has the registry shape
  * `Map[String, (SparkSession, String) => DataFrame]`, and each such map
  * must be a SUBSET of `SparkEntry.queries` (same for `oracle` vs
  * `oracleSql`). Commenting out any one `++ module.all` line in SparkEntry
  * fails this spec with the module's name.
  *
  * The convention is discovered, not declared — a new module gets guarded
  * the moment it compiles, with no registration step to forget (which is
  * the whole point).
  */
class RegistryGuardSpec extends AnyFunSuite {

  test("the scan itself sees the known registry modules (not vacuous)") {
    val names = Registry.modules.map(_.className).toSet
    for (expected <- Seq("graft.warehouse.SkewAdvisor$", "graft.ingest.JsonOps$",
        "graft.analytics.Queries$", "graft.observability.ColumnLineage$"))
      assert(names.contains(expected), s"classpath scan lost $expected")
    assert(Registry.modules.size >= 90,
      s"only ${Registry.modules.size} registry modules found — scan broke")
  }

  test("every module's `all` map is registered in SparkEntry.queries") {
    val registered = SparkEntry.queries.keySet
    val orphans = Registry.modules.flatMap { m =>
      val missing = m.queries -- registered
      if (missing.nonEmpty)
        Some(s"${m.className}: ${missing.toSeq.sorted.mkString(", ")}")
      else None
    }
    assert(orphans.isEmpty,
      s"ORPHANED MODULES — queries never wired into SparkEntry:\n  " +
        orphans.mkString("\n  "))
  }

  test("no two modules declare the same query name (++ replaces silently)") {
    // the r9 near-miss: a new module declared "text_chunk_windows", which
    // TextAnalysis already owned — SparkEntry's `++` silently replaced the
    // original query AND its oracle, stripping its gate coverage while the
    // subset checks above stayed green. A name must have exactly one owner.
    val owners = Registry.modules
      .flatMap(m => m.queries.map(_ -> m.simpleName))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val dups = owners.filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"DUPLICATE QUERY NAMES across modules:\n  " +
        dups.map { case (q, ms) => s"$q <- ${ms.mkString(", ")}" }
          .mkString("\n  "))
  }

  test("every module's `oracle` map is registered in SparkEntry.oracleSql") {
    val registered = SparkEntry.oracleSql.keySet
    val orphans = Registry.modules.flatMap { m =>
      val missing = m.oracles -- registered
      if (missing.nonEmpty)
        Some(s"${m.className}: ${missing.toSeq.sorted.mkString(", ")}")
      else None
    }
    assert(orphans.isEmpty,
      s"ORPHANED ORACLES — never wired into SparkEntry.oracleSql:\n  " +
        orphans.mkString("\n  "))
  }
}
