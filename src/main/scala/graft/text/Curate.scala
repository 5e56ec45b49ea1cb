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

  /** Deterministic train/val/test assignment: first md5 hex digit of the
    * doc id → 16 buckets, 0-13 train / 14 val / 15 test (87.5 / 6.25 / 6.25).
    * A pure function of the key — reproducible across engines, retries, and
    * cluster sizes, and computable on ANY table carrying the id without a
    * join (the property [[decontaminate]] exploits). Map-side; the only
    * shuffle is the 3-row stats rollup.
    */
  private[text] def bucketOf(c: org.apache.spark.sql.Column) = {
    val h = ascii(substring(md5(c.cast("string")), 1, 1))
    when(h < 58, h - 48).otherwise(h - 87)
  }

  def trainValSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = bucketOf($"doc_id")
    val split = when(b <= 13, "train").when(b === 14, "val").otherwise("test")
    Tables.documents(spark, dir)
      .groupBy(split.as("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        countDistinct($"lang").as("n_langs"))
      .orderBy($"split")
  }

  /** Train/test decontamination ledger: every (train doc, test doc) pair
    * whose near-dup Jaccard ≥ τ — the train docs a training run must drop so
    * the test split stays uncontaminated. Because the split bucket is a pure
    * function of the id, both endpoints classify WITHOUT joining the corpus:
    * the whole query is a map-side filter over the materialized pair table
    * (val docs count as train here — they must not leak into test either).
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup.pairsForDir(spark, dir)
    val edges = pairs.select($"doc_a".as("x"), $"doc_b".as("y"), $"jaccard")
      .unionByName(pairs.select($"doc_b".as("x"), $"doc_a".as("y"), $"jaccard"))
    edges
      .filter(bucketOf($"x") <= 14 && bucketOf($"y") === 15)
      .select($"x".as("train_id"), $"y".as("test_id"), $"jaccard")
      .orderBy($"train_id", $"test_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curate_corpus" -> (curatedStats _),
    "curate_train_val_split" -> (trainValSplit _),
    "curate_decontaminate" -> (decontaminate _))

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
GROUP BY lang ORDER BY lang""",

    "curate_train_val_split" -> s"""WITH bucketed AS (
  SELECT *,
         CASE WHEN ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) < 58
              THEN ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 48
              ELSE ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 87
         END AS b
  FROM documents)
SELECT CASE WHEN b <= 13 THEN 'train' WHEN b = 14 THEN 'val'
            ELSE 'test' END AS split,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       count(DISTINCT lang) AS n_langs
FROM bucketed
GROUP BY 1 ORDER BY 1""",

    "curate_decontaminate" -> s"""WITH toks AS (
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
pairs AS (
  SELECT doc_a, doc_b, o * 1.0 / (sa.n + sb.n - o) AS jaccard
  FROM ov JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
  WHERE o * 1.0 / (sa.n + sb.n - o) >= ${Dedup.BaseTau}),
edges AS (
  SELECT doc_a AS x, doc_b AS y, jaccard FROM pairs
  UNION ALL SELECT doc_b, doc_a, jaccard FROM pairs),
bucketed AS (
  SELECT x, y, jaccard,
         CASE WHEN ascii(substring(md5(CAST(x AS VARCHAR)), 1, 1)) < 58
              THEN ascii(substring(md5(CAST(x AS VARCHAR)), 1, 1)) - 48
              ELSE ascii(substring(md5(CAST(x AS VARCHAR)), 1, 1)) - 87
         END AS bx,
         CASE WHEN ascii(substring(md5(CAST(y AS VARCHAR)), 1, 1)) < 58
              THEN ascii(substring(md5(CAST(y AS VARCHAR)), 1, 1)) - 48
              ELSE ascii(substring(md5(CAST(y AS VARCHAR)), 1, 1)) - 87
         END AS by
  FROM edges)
SELECT x AS train_id, y AS test_id, jaccard
FROM bucketed
WHERE bx <= 14 AND by = 15
ORDER BY train_id, test_id""")
}
