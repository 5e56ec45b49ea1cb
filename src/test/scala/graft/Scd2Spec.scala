package graft

import graft.warehouse.Scd2
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Invariants of the SCD2 dimension merge and the token-frequency scorer
  * that no SQL oracle states directly (the oracle pins values; these pin the
  * CONTRACT the values must satisfy for any corpus).
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val scd = Scd2.scd2Patient(spark, sf).cache()

  test("scd2: exactly one current row per business key") {
    val multi = scd.filter($"is_current")
      .groupBy($"patient_id").count().filter($"count" =!= 1).count()
    assert(multi == 0)
    // and every key has a current row (no key closed without a successor)
    val keys = scd.select($"patient_id").distinct().count()
    val current = scd.filter($"is_current").count()
    assert(current == keys)
  }

  test("scd2: closed rows end exactly where their successor begins") {
    val closed = scd.filter(!$"is_current")
    assert(closed.filter($"valid_to" =!= lit(Scd2.ChangeDate).cast("date")).count() == 0)
    // every closed v1 has a v2 successor starting at the change date
    val orphans = closed.select($"patient_id").as("c")
      .join(scd.filter($"is_current" && $"version" === 2).select($"patient_id").as("s"),
        Seq("patient_id"), "left_anti").count()
    assert(orphans == 0)
  }

  test("scd2: surrogate keys are unique and versions are 1 or 2") {
    assert(scd.select($"scd_key").distinct().count() == scd.count())
    assert(scd.filter(!$"version".isin(1, 2)).count() == 0)
    // inserts (fresh keys) are version 1 and current from the change date
    val ins = scd.filter($"patient_id" >= 10000000L)
    assert(ins.filter($"version" =!= 1 || !$"is_current"
      || $"valid_from" =!= lit(Scd2.ChangeDate).cast("date")).count() == 0)
  }

  test("scd2 as-of lookup: every encounter resolves exactly one version") {
    val fact = graft.warehouse.Warehouse.forDir(spark, sf).factEncounters
    val looked = Scd2.scd2AsofLookup(spark, sf)
      .agg(sum($"n_encounters")).head.getLong(0)
    // half-open validity intervals partition time → join is lossless and
    // never duplicates a fact row
    assert(looked == fact.count())
  }

  test("token_freq_score: probabilities and fractions stay in range") {
    val s = TextAnalysis.tokenFreqScore(spark, sf).cache()
    assert(s.filter($"mean_token_p" <= 0 || $"mean_token_p" > 1).count() == 0)
    assert(s.filter($"rare_frac" < 0 || $"rare_frac" > 1).count() == 0)
    assert(s.filter($"min_tf" < 1).count() == 0)
    // every document is scored (explode never drops a non-empty doc)
    assert(s.count() == graft.Tables.documents(spark, sf).count())
  }
}
