package graft.dedup

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit sign-hash fingerprints compared
  * by Hamming distance, with chunk-bucketed candidate generation.
  *
  * Fingerprint: for each of 64 bit positions, sum +1/−1 over the document's
  * distinct word-3-gram shingles according to that bit of xxhash64(shingle);
  * the sign of each sum is the fingerprint bit. Shingle features (same
  * feature set as the Jaccard/MinHash families) rather than unigrams: this
  * corpus has a ~30-word vocabulary, so unigram sets are near-identical
  * across ALL documents and the bit sums hover at zero — shingles restore
  * the discriminative signal. Computed columnar: explode shingles once, 64
  * conditional sums in one hash aggregate (codegen'd, map-side partial),
  * then the long is assembled from the sums.
  *
  * Candidates: split the 64 bits into 8×8-bit chunks; by pigeonhole, any
  * pair at Hamming distance ≤ 7 shares at least one exact chunk, so an
  * equi-join on (chunk index, chunk value) has full recall for d ≤ 7 — no
  * pairwise product (Manku et al.'s chunk scheme, WWW'07). The accepted
  * radius is d ≤ 10: short documents make sign-sums noisy, so near-identical
  * pairs land at d 8–10 here; recall is guaranteed to 7 and empirical above.
  * Scale note: 8-bit chunks have only 256 bucket values, so bucket sizes
  * grow ~n/256 and the join fan-out ~n²/32 — at corpus scale use 16-bit
  * chunks (guaranteed d ≤ 3) or permuted chunk tables to keep buckets
  * sparse; 8-bit chunks fit this small-vocab corpus.
  */
object SimHash {

  val Chunks = 8
  val ChunkBits = 8
  val MaxHamming = 10

  /** doc_id → 64-bit simhash of the distinct shingle set. `docs` must carry
    * (doc_id, sh) — pass [[DocIndex.forDir]].
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(col("sh")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums: Seq[Column] = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val agg = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), simhash.as("simhash"))
  }

  def nearDuplicates(spark: SparkSession, dir: String,
      maxHamming: Int = MaxHamming): DataFrame = {
    import spark.implicits._
    val fps = fingerprints(DocIndex.forDir(spark, dir))
    val chunked = fps.select($"doc_id", $"simhash",
      explode(expr(
        s"""transform(sequence(0, ${Chunks - 1}),
           |  c -> struct(c AS chunk,
           |              shiftright(simhash, c * $ChunkBits) & ${(1 << ChunkBits) - 1} AS piece))""".stripMargin)).as("cp"))
      .select($"doc_id", $"simhash", $"cp.chunk", $"cp.piece")
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.piece") === col("b.piece")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
