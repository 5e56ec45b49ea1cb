package graft.dedup

import graft.functions.Md5Hash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.ConcurrentHashMap

/** SimHash near-duplicate detection: 64-bit sign-hash fingerprints compared
  * by Hamming distance, with chunk-bucketed candidate generation.
  *
  * Fingerprint: for each of 64 bit positions, sum +1/−1 over the document's
  * distinct word-3-gram shingles according to that bit of the shingle's hash;
  * the sign of each sum is the fingerprint bit. The 64 hash bits come from
  * md5 — two 32-bit words ([[Md5Hash.h32]] of hex chars 1-8 and 9-16) — so
  * the DuckDB oracle reproduces fingerprints, buckets, and the final pair
  * set exactly ([[oracleSql]]; round 3's xxhash64 bits were not expressible
  * in DuckDB and the query could only be spec-pinned). Shingle features
  * (same feature set as the Jaccard/MinHash families) rather than unigrams:
  * this corpus has a ~30-word vocabulary, so unigram sets are near-identical
  * across ALL documents and the bit sums hover at zero — shingles restore
  * the discriminative signal. Computed columnar: explode shingles once, 64
  * conditional sums in one hash aggregate (codegen'd, map-side partial),
  * then the long is assembled from the sums. Fingerprints are materialized
  * once per (app, corpus) ([[fpForDir]], the [[MinHashLsh.sigsForDir]]
  * pattern) — the candidate self-join references the fingerprint relation
  * twice, and at 100 TB the fingerprint table is the write-once artifact a
  * dedup pass reuses across runs.
  *
  * Candidates: split the 64 bits into 64/chunkBits exact-match chunks; by
  * pigeonhole, any pair at Hamming distance ≤ chunks−1 shares at least one
  * exact chunk, so an equi-join on (chunk index, chunk value) has full
  * recall for d < chunks — no pairwise product (Manku et al.'s chunk scheme,
  * WWW'07). Both documented operating points are implemented via
  * `chunkBits`:
  *
  *  - 8-bit chunks (default here): 8 chunks, guaranteed recall to d ≤ 7,
  *    empirically complete at the accepted d ≤ 10 radius on this small-vocab
  *    corpus (short docs make sign-sums noisy, so near-identical pairs land
  *    at d 8-10). Bucket values are only 2^8, so join fan-out grows ~n²/256
  *    per chunk — fine at test scale, NOT the corpus-scale setting.
  *  - 16-bit chunks (`chunkBits = 16`): 4 chunks over 2^16 bucket values —
  *    the corpus-scale setting (bucket sizes ~n/65536, fan-out bounded),
  *    guaranteed recall to d ≤ 3; candidates are by construction a subset of
  *    the 8-bit chunk candidates (a shared 16-bit chunk is two shared 8-bit
  *    chunks). ScaleVariantsSpec pins both relationships.
  */
object SimHash {

  val ChunkBits = 8
  val MaxHamming = 10

  /** doc_id → 64-bit simhash of the distinct shingle set. `docs` must carry
    * (doc_id, sh) — pass [[DocIndex.forDir]].
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    // md5 materialized into a column FIRST so the two word extractions share
    // one hash evaluation (HOF/expr re-evaluation is a measured footgun here)
    val words = docs
      .select(col("doc_id"), explode(col("sh")).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("m"))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("bigint").as("hi"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("bigint").as("lo"))
    val bitSums: Seq[Column] = (0 until 64).map { i =>
      val word = if (i < 32) col("lo") else col("hi")
      sum(when(shiftright(word, i % 32).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val agg = words.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), simhash.as("simhash"))
  }

  private val memo = new ConcurrentHashMap[String, DataFrame]()

  /** Fingerprint table materialized once per (app, corpus). */
  def fpForDir(spark: SparkSession, dir: String): DataFrame =
    memo.computeIfAbsent(s"${spark.sparkContext.applicationId}:$dir", { _ =>
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val p = s"${sys.props("java.io.tmpdir")}/graft-simhash/" +
        s"${spark.sparkContext.applicationId}/$safe"
      fingerprints(DocIndex.forDir(spark, dir)).write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    })

  def nearDuplicates(spark: SparkSession, dir: String,
      maxHamming: Int = MaxHamming, chunkBits: Int = ChunkBits): DataFrame = {
    import spark.implicits._
    require(64 % chunkBits == 0, s"chunkBits must divide 64, got $chunkBits")
    val chunks = 64 / chunkBits
    val mask = (1L << chunkBits) - 1
    val fps = fpForDir(spark, dir)
    // arithmetic >> sign-extends for high chunks; the & mask keeps the piece
    val chunked = fps.select($"doc_id", $"simhash",
      explode(expr(
        s"""transform(sequence(0, ${chunks - 1}),
           |  c -> struct(c AS chunk,
           |              shiftright(simhash, c * $chunkBits) & $mask AS piece))""".stripMargin)).as("cp"))
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

  /** DuckDB twin of the full pipeline (shingles → md5 word hashes → 64
    * sign-sums → fingerprint words → chunk buckets → candidates → Hamming
    * filter), computed in (hi, lo) 32-bit word space so no 64-bit sign or
    * overflow semantics are in play on either engine; Spark's single-long
    * pieces and popcounts decompose identically over the two words.
    */
  def oracleSql: String = {
    val chunks = 64 / ChunkBits
    val mask = (1L << ChunkBits) - 1
    val sumCols = (0 until 64).map { i =>
      val word = if (i < 32) "lo" else "hi"
      s"sum(CASE WHEN (($word >> ${i % 32}) & 1) = 1 THEN 1 ELSE -1 END) AS b$i"
    }.mkString(",\n         ")
    def wordExpr(lo: Int, hi: Int): String = (lo until hi).map { i =>
      s"CASE WHEN b$i > 0 THEN ${1L << (i % 32)}::BIGINT ELSE 0 END"
    }.mkString(" + ")
    val chunkSelects = (0 until chunks).map { c =>
      val piece =
        if (c * ChunkBits < 32) s"(lo_w >> ${c * ChunkBits}) & $mask"
        else s"(hi_w >> ${c * ChunkBits - 32}) & $mask"
      s"  SELECT doc_id, lo_w, hi_w, $c AS chunk, $piece AS piece FROM words"
    }.mkString("\n  UNION ALL\n")
    s"""WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
  WHERE len(t) >= 3),
hashed AS (
  SELECT doc_id, md5(shingle) AS m FROM sh),
words0 AS (
  SELECT doc_id,
         ${Md5Hash.hexParseSql("m", 1)} AS hi,
         ${Md5Hash.hexParseSql("m", 9)} AS lo
  FROM hashed),
sums AS (
  SELECT doc_id,
         $sumCols
  FROM words0 GROUP BY doc_id),
words AS (
  SELECT doc_id,
         ${wordExpr(0, 32)} AS lo_w,
         ${wordExpr(32, 64)} AS hi_w
  FROM sums),
chunked AS (
$chunkSelects),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         (bit_count(xor(a.lo_w, b.lo_w)) + bit_count(xor(a.hi_w, b.hi_w)))::INT AS hamming
  FROM chunked a JOIN chunked b
    ON a.chunk = b.chunk AND a.piece = b.piece AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, hamming
FROM cand
WHERE hamming <= $MaxHamming
ORDER BY doc_a, doc_b"""
  }
}
