package graft

import org.apache.spark.sql.functions._
import warehouse.SkewAdvisor

/** The measurement→execution skew loop: the advisor's profile is sane, and
  * the join salted BY that profile (a) spreads every hot key over exactly
  * the advised number of sub-partitions, each bounded near TargetRows, and
  * (b) is output-equivalent to the plain join.
  *
  * Runs at sf0.01 — the smallest SF where the synthetic corpus is actually
  * skewed ('en' ≈ 44% of documents vs a 20% fair share).
  */
class SkewAdvisorSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("advisor flags exactly the over-represented keys, salt = ceil(rows/target)") {
    import spark.implicits._
    val freq = Tables.documents(spark, dir)
      .groupBy($"lang").agg(count(lit(1)).as("n")).as[(String, Long)]
      .collect().toMap
    val nRows = freq.values.sum
    val expectedHot = freq.filter { case (_, n) =>
      n.toDouble > SkewAdvisor.HotFactor * nRows.toDouble / freq.size }
    val advised = SkewAdvisor.skewAdvisor(spark, dir)
      .select($"lang", $"key_rows", $"salt")
      .as[(String, Long, Long)].collect()
    assert(advised.map(_._1).toSet == expectedHot.keySet)
    assert(advised.nonEmpty, "sf0.01 documents must contain a hot key")
    advised.foreach { case (lang, rows, salt) =>
      assert(rows == expectedHot(lang))
      assert(salt == (rows + SkewAdvisor.TargetRows - 1) / SkewAdvisor.TargetRows)
    }
  }

  test("advised salting spreads each hot key into `salt` buckets bounded near TargetRows") {
    import spark.implicits._
    val profile = SkewAdvisor.skewAdvisor(spark, dir)
      .select($"lang", $"salt").as[(String, Long)].collect().toMap
    assert(profile.nonEmpty)
    // re-derive the salted left side exactly as advisedSkewJoin builds it
    val salted = Tables.documents(spark, dir)
      .join(broadcast(SkewAdvisor.skewAdvisor(spark, dir)
        .select($"lang", $"salt")), Seq("lang"), "left")
      .withColumn("__salt",
        pmod(xxhash64($"doc_id"), coalesce($"salt", lit(1L))).cast("int"))
    val buckets = salted.filter($"lang".isin(profile.keys.toSeq: _*))
      .groupBy($"lang", $"__salt").agg(count(lit(1)).as("n"))
      .as[(String, Int, Long)].collect()
    profile.foreach { case (lang, saltF) =>
      val mine = buckets.filter(_._1 == lang)
      assert(mine.length == saltF,
        s"$lang: expected $saltF salt buckets, got ${mine.length}")
      // ceil(rows/salt) ≤ TargetRows by construction; the hash spread adds
      // binomial noise (σ≈√TargetRows), so the gate is 1.5× — a bucket
      // beyond that means the salt column isn't actually splitting the key
      val maxBucket = mine.map(_._3).max
      assert(maxBucket <= (SkewAdvisor.TargetRows * 3) / 2,
        s"$lang: hottest salted bucket $maxBucket exceeds 1.5×TargetRows")
    }
  }

  test("advised salted join ≡ plain inner join (salting is output-invariant)") {
    import spark.implicits._
    val advised = SkewAdvisor.advisedSkewJoin(spark, dir)
    val plain = {
      val dim = Seq(("en", 1.0), ("fr", 1.2), ("es", 1.1), ("de", 1.3),
        ("zh", 2.0)).toDF("lang", "char_weight")
      Tables.documents(spark, dir).join(dim, Seq("lang"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
          max($"char_weight").as("w"))
        .select($"lang", $"n_docs",
          ($"sum_chars".cast("double") * $"w").as("weighted_chars"))
        .orderBy($"lang")
    }
    assert(advised.collect().toSeq == plain.collect().toSeq)
  }
}
