package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** README's operator catalog is GENERATED from the registry
  * (`sbt "runMain graft.CatalogGen"`); this spec pins the no-drift
  * contract: every registered query appears in the committed README
  * section, and the section lists nothing stale.
  */
class CatalogSpec extends AnyFunSuite {

  private lazy val section: String = {
    val text = Files.readString(Paths.get("README.md"))
    val b = text.indexOf("operator-catalog:begin")
    val e = text.indexOf("operator-catalog:end")
    assert(b >= 0 && e > b, "README.md is missing the generated operator catalog")
    text.substring(b, e)
  }

  private lazy val listed: Set[String] =
    "\\| `([a-z0-9_]+)` \\|".r.findAllMatchIn(section).map(_.group(1)).toSet

  test("every registered query appears in the README catalog") {
    val missing = SparkEntry.queries.keySet -- listed
    assert(missing.isEmpty,
      s"queries missing from README catalog (re-run `sbt \"runMain graft.CatalogGen\"`): " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("the README catalog lists no stale queries") {
    val stale = listed -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"stale catalog rows (re-run `sbt \"runMain graft.CatalogGen\"`): " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("no query lands in the Uncategorized bucket") {
    assert(!section.contains("### Uncategorized"),
      "a new query-name family needs a one-liner in CatalogGen.families")
  }
}
