package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sample/synthetic operators (SURVEY §2.1 S1-S4 + J9) — the
  * reference's external-ingest surface re-expressed deterministically.
  *
  * The reference's external source is a HuggingFace download with a seeded
  * shuffle-sample and a synthetic fallback generator
  * (`/root/reference/src/etl_pipeline.py:20-63`); its "random assignment"
  * join picks a random patient/facility per staged record (`:142-147`).
  * Random choices are replaced by md5-bucket determinism so every operator
  * is reproducible across retries, cluster sizes, AND the DuckDB oracle —
  * nondeterminism in a distributed pipeline is a correctness bug the
  * reference only tolerates because it runs single-threaded.
  *
  * Scale notes: hash-sampling is a pure map-side filter (no orderBy-rand
  * global sort, which would shuffle the full corpus to sample 12 % of it);
  * the assignment join broadcasts the 16-row pool.
  */
object Sources {

  /** S2: deterministic sample — hash-bucket filter (md5 first hex digit in
    * 0..1 → exactly-reproducible ~1/8 sample) instead of
    * `shuffle(seed).select(range(n))`: same capability, no global sort, no
    * RNG state, identical on any engine.
    */
  def seededSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter(substring(md5($"event_id".cast("string")), 1, 1) < "2")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .orderBy($"event_id")
  }

  /** S3: synthetic fallback source — `spark.range` + deterministic column
    * expressions replaces the Faker row loop (the driver-testdata generator
    * plays the reference's `generate_synthetic_data.py` role; this operator
    * is the engine-side fallback-source capability).
    */
  def syntheticEvents(spark: SparkSession, n: Int = 1000): DataFrame = {
    import spark.implicits._
    spark.range(n).select(
      $"id".as("event_id"),
      to_timestamp(lit("2024-01-01 00:00:00")).plus(
        expr("make_interval(0, 0, 0, 0, 0, id, 0)")).as("ts"),
      pmod($"id", lit(97)).as("user_id"),
      element_at(
        array(lit("click"), lit("view"), lit("signup"), lit("purchase"), lit("error")),
        (pmod($"id", lit(5)) + 1).cast("int")).as("event_type"),
      (pmod($"id" * 37, lit(10000)) / lit(100.0)).as("value"))
  }

  private def synthetic(spark: SparkSession, dir: String): DataFrame =
    syntheticEvents(spark).orderBy(col("event_id"))

  /** J9: assignment join — each event deterministically "assigned" an owner
    * from a 16-row pool (reference: `ORDER BY RANDOM() LIMIT k` pool +
    * `random.choice` per record). Bucket = first md5 hex digit of the key;
    * pool = the 16 lowest customer keys, indexed 0-15; broadcast join.
    */
  def assignmentJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hexDigit = ascii(substring(md5($"event_id".cast("string")), 1, 1))
    val bucket = when(hexDigit < 58, hexDigit - 48).otherwise(hexDigit - 87)
    val pool = Tables.customer(spark, dir)
      .orderBy($"c_custkey").limit(16)
      .select(($"c_custkey" - 1).cast("int").as("pool_idx"),
        $"c_custkey".as("assigned_patient"), $"c_name".as("assigned_name"))
    Tables.events(spark, dir)
      .select($"event_id", bucket.as("pool_idx"))
      .join(broadcast(pool), "pool_idx")
      .select($"event_id", $"assigned_patient", $"assigned_name")
      .orderBy($"event_id")
  }

  /** F13: multi-valued field split — word-frequency rollup of the document
    * corpus (`labels TEXT` comma-list analog): split → explode → count.
    */
  def wordFrequency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_seeded_sample" -> (seededSample _),
    "src_synthetic_events" -> (synthetic _),
    "src_assignment_join" -> (assignmentJoin _),
    "src_word_frequency" -> (wordFrequency _))

  val oracle: Map[String, String] = Map(
    "src_seeded_sample" -> """SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) < '2'
ORDER BY event_id""",

    "src_synthetic_events" -> """SELECT i AS event_id,
       TIMESTAMP '2024-01-01 00:00:00' + to_minutes(i) AS ts,
       i % 97 AS user_id,
       ['click','view','signup','purchase','error'][(i % 5) + 1] AS event_type,
       (i * 37 % 10000) / 100.0 AS value
FROM range(1000) t(i)
ORDER BY event_id""",

    "src_assignment_join" -> """WITH pool AS (
  SELECT (c_custkey - 1)::INT AS pool_idx, c_custkey AS assigned_patient,
         c_name AS assigned_name
  FROM customer ORDER BY c_custkey LIMIT 16),
bucketed AS (
  SELECT event_id,
         CASE WHEN ascii(substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) < 58
              THEN ascii(substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 48
              ELSE ascii(substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 87
         END AS pool_idx
  FROM events)
SELECT event_id, assigned_patient, assigned_name
FROM bucketed JOIN pool USING (pool_idx)
ORDER BY event_id""",

    "src_word_frequency" -> """SELECT word, count(*)::BIGINT AS n
FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
      FROM documents)
GROUP BY word
ORDER BY n DESC, word""")
}
