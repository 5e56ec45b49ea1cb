package graft.similarity

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sign-random-projection (random hyperplane) LSH for approximate nearest
  * neighbors — the scale path next to [[Similarity.bruteForceTopK]].
  *
  * Signature: `Planes` pseudo-random hyperplanes whose components are
  * hash-derived doubles in [−1, 1] (deterministic — seeded by plane and
  * dimension index, reproducible across runs and executors with no driver
  * state or broadcast of plane matrices). Bit p of the signature is
  * sign(v·h_p). For vectors at angle θ, P[bits agree] = 1 − θ/π — near
  * duplicates collide with high probability.
  *
  * Search: corpus is grouped by signature (at scale: written bucketed /
  * partitioned by signature so a probe reads one partition); each probe
  * scans its own bucket plus all buckets at Hamming distance 1 (multi-probe
  * — recovers most of the recall lost to boundary flips for tiny extra
  * fan-out), then exact-ranks candidates with the codegen'd cosine kernel.
  *
  * Plane count trades recall for candidate-set size: 2^Planes buckets over
  * |corpus| vectors ⇒ ~|corpus|/2^Planes candidates per probe. 4 planes fit
  * the 500–2000-vector test corpus; a billion-vector corpus wants 16–24
  * planes (and/or IVF re-ranking), same code shape.
  */
object RandomHyperplaneLsh {

  val Planes = 4

  /** v·h_p where h_p[j] = xxhash64("p:j") scaled to [−1,1] — computed inside
    * the expression, no plane matrix materialized.
    */
  private def planeDot(emb: String, p: Int): String =
    s"""aggregate(sequence(0, size($emb) - 1), CAST(0.0 AS DOUBLE),
       |  (acc, j) -> acc + CAST(element_at($emb, j + 1) AS DOUBLE)
       |    * (CAST(xxhash64(concat('plane$p:', CAST(j AS STRING))) AS DOUBLE)
       |       / 9.223372036854775807E18))""".stripMargin

  /** The signature column expression over column `emb`. */
  def signature(emb: String): Column =
    (0 until Planes).map { p =>
      when(expr(planeDot(emb, p)) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Signatures at Hamming distance ≤ 1 from `sig` (multi-probe set). */
  private def probeSignatures(sig: Column): Column =
    array((sig +: (0 until Planes).map(p =>
      sig.bitwiseXOR(lit(1 << p)))): _*)

  def topK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    Similarity.register(spark)
    val e = Tables.embeddings(spark, dir)
    val corpus = e.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb"),
      signature("embedding").as("bucket"))
    val probes = e.filter($"vec_id" < Similarity.NumProbes)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        explode(probeSignatures(signature("embedding"))).as("bucket"))
    broadcast(probes)
      .join(corpus, "bucket")
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("cos", expr("graft_cosine(q_emb, n_emb)"))
      .select($"query_id", $"neighbor_id", $"cos").distinct()
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"rank",
        (floor($"cos" * 100 + lit(0.5)) / lit(100.0)).as("cosine_r2"))
      .orderBy($"query_id", $"rank")
  }
}
