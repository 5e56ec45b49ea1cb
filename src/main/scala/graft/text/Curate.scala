package graft.text

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed training-data pipeline the
  * individual operators exist for: quality-filter → near-dup removal →
  * per-language corpus stats. One declarative DAG; each stage is the
  * already-verified operator.
  *
  * Near-dup policy: from every Jaccard-≥τ pair, the lower doc_id survives —
  * i.e. a document is dropped iff it appears as the `doc_b` of some pair
  * (deterministic greedy; at corpus scale the same rule runs over the
  * MinHash-LSH pair stream instead of the exact join, identical shape).
  *
  * Scale notes: quality filtering is map-side; the drop set is tiny
  * (near-dup pairs) and broadcast into a left-anti join; the rollup shuffles
  * once on lang.
  */
object Curate {

  val MinChars = 100
  val NearDupTau = 0.5

  def curatedStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val quality = docs.filter($"n_chars" >= MinChars)
    // τ=0.5 drop set is a filter of the shared τ=0.2 materialized pair
    // table (NearDupTau ≥ Dedup.BaseTau) — no Jaccard re-derivation
    val dropIds = Dedup.pairsForDir(spark, dir)
      .filter($"jaccard" >= NearDupTau)
      .select($"doc_b".as("drop_id")).distinct()
    quality
      .join(broadcast(dropIds), $"doc_id" === $"drop_id", "left_anti")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        // closed-form round (engine-identical), not round(): see GraftFunctions
        (floor(avg($"n_chars") * 10 + lit(0.5)) / lit(10.0)).as("avg_chars"))
      .orderBy($"lang")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curate_corpus" -> (curatedStats _))

  val oracle: Map[String, String] = Map(
    "curate_corpus" -> s"""WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
  WHERE len(t) >= 3),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
ov AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS o
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
drops AS (
  SELECT DISTINCT doc_b AS drop_id
  FROM ov JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
  WHERE o * 1.0 / (sa.n + sb.n - o) >= $NearDupTau)
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       floor(avg(n_chars) * 10 + 0.5) / 10.0 AS avg_chars
FROM documents
WHERE n_chars >= $MinChars
  AND doc_id NOT IN (SELECT drop_id FROM drops)
GROUP BY lang ORDER BY lang""")
}
