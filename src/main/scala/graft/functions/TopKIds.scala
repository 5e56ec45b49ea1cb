package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Top-k ids by (score DESC, id ASC) as a native Catalyst
  * [[TypedImperativeAggregate]] — the aggregate form of the ranked-window
  * idiom `row_number() OVER (PARTITION BY g ORDER BY score DESC, id) ≤ k`.
  *
  * The window form SORTS every candidate row: even with Spark's
  * WindowGroupLimit pushdown the map side must sort its whole partition
  * slice before trimming (the exact-pair baselines feed it n² rows — a
  * 4M-row sort at sf0.1 per query). This aggregate replaces the sort with
  * a bounded insertion buffer: per input row one hash-probe into the
  * group map plus an O(k) compare-insert (k = 5 here), and the shuffle
  * carries ≤ k (score, id) pairs per (group, mapper) — the same
  * partial/final two-phase shape as [[KmvAgg]].
  *
  * Selection is IDENTICAL to the window form's: the k best rows under the
  * total order (score desc, id asc). Ties on score break toward the
  * smaller id, and the comparison is on the exact score values the input
  * expression produced — no arithmetic is re-ordered, so a query that
  * swaps the window for this aggregate is bit-equivalent against the
  * unchanged ranked-subquery oracle. NULL scores are skipped (a DESC
  * window ranks them last, so with ≥ k non-null candidates they can never
  * rank ≤ k; callers here score with [[CosineSimilarity]], which is
  * non-null on non-null inputs).
  *
  * Output: `array<bigint>` of ids in rank order (rank 1 first).
  * SQL: `graft_topk_ids(score, id, k)` with literal k ≥ 1.
  */
case class TopKIdsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKIdsAgg.Buffer]
  with BinaryLike[Expression] {

  require(k >= 1, s"graft_topk_ids needs k >= 1, got $k")

  override def createAggregationBuffer(): TopKIdsAgg.Buffer =
    new TopKIdsAgg.Buffer(k)

  override def update(buffer: TopKIdsAgg.Buffer,
      input: InternalRow): TopKIdsAgg.Buffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKIdsAgg.Buffer,
      other: TopKIdsAgg.Buffer): TopKIdsAgg.Buffer = {
    var j = 0
    while (j < other.size) {
      buffer.insert(other.scores(j), other.ids(j))
      j += 1
    }
    buffer
  }

  override def eval(buffer: TopKIdsAgg.Buffer): Any = {
    val out = new Array[Any](buffer.size)
    var j = 0
    while (j < buffer.size) { out(j) = buffer.ids(j); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKIdsAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var j = 0
    while (j < buffer.size) {
      bb.putDouble(buffer.scores(j)); bb.putLong(buffer.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKIdsAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKIdsAgg.Buffer(k)
    var j = 0
    while (j < n) { b.insert(bb.getDouble, bb.getLong); j += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_ids expects (double score, bigint id), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def prettyName: String = "graft_topk_ids"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKIdsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKIdsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKIdsAgg =
    copy(left = newLeft, right = newRight)
}

/** Distinct-by-id top-k (score, id) pairs as a native aggregate — the
  * aggregate form of the `SELECT DISTINCT …` → ranked-window idiom the
  * multi-probe LSH consumers and the beam search use: candidates arrive
  * with DUPLICATE ids (the same neighbor found through several probe
  * buckets / several beam parents), every copy carrying the IDENTICAL
  * score (the same kernel over the same vectors), and the query wants the
  * k best distinct ids. The window form pays a full exchange of every
  * candidate row just to `distinct()` before ranking (sim_hubness_ann:
  * 22 MB / 1.29M rows shuffled at sf0.1); this buffer dedups on insert —
  * a duplicate id either already sits in the buffer (O(k) scan finds it)
  * or was evicted by k strictly-better entries (in which case the copy
  * fails the same (score desc, id asc) comparison its twin failed) — so
  * ONLY ≤ k entries per (group, mapper) ever shuffle and the distinct
  * exchange disappears.
  *
  * Contract: duplicate ids are expected to carry EQUAL scores (true by
  * construction for every caller — the score is a pure kernel of the id's
  * vector); for robustness an id seen with several scores keeps its best.
  * Under equal-score duplicates the result is bit-identical to
  * `DISTINCT (group, id, score)` → `row_number() ≤ k` — TopKPairsSpec
  * pins the parity and merge-order invariance.
  *
  * Output: `array<struct<score double, id bigint>>` in rank order.
  * SQL: `graft_topk_pairs(score, id, k)` with literal k ≥ 1.
  */
case class TopKPairsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsAgg.Buffer]
  with BinaryLike[Expression] {

  require(k >= 1, s"graft_topk_pairs needs k >= 1, got $k")

  override def createAggregationBuffer(): TopKPairsAgg.Buffer =
    new TopKPairsAgg.Buffer(k)

  override def update(buffer: TopKPairsAgg.Buffer,
      input: InternalRow): TopKPairsAgg.Buffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKPairsAgg.Buffer,
      other: TopKPairsAgg.Buffer): TopKPairsAgg.Buffer = {
    var j = 0
    while (j < other.size) {
      buffer.insert(other.scores(j), other.ids(j))
      j += 1
    }
    buffer
  }

  override def eval(buffer: TopKPairsAgg.Buffer): Any = {
    val out = new Array[Any](buffer.size)
    var j = 0
    while (j < buffer.size) {
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](buffer.scores(j), buffer.ids(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKPairsAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var j = 0
    while (j < buffer.size) {
      bb.putDouble(buffer.scores(j)); bb.putLong(buffer.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKPairsAgg.Buffer(k)
    var j = 0
    while (j < n) { b.insert(bb.getDouble, bb.getLong); j += 1 }
    b
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score", DoubleType,
        nullable = false),
      org.apache.spark.sql.types.StructField("id", LongType,
        nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_pairs expects (double score, bigint id), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def prettyName: String = "graft_topk_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)
}

object TopKPairsAgg {
  /** [[TopKIdsAgg.Buffer]] plus dedup-by-id on insert: a duplicate id
    * already in the buffer keeps its better (score, id) slot — under the
    * equal-score contract that means the copy is simply dropped; a
    * duplicate whose twin was EVICTED fails the same boundary comparison
    * the twin failed (the buffer only ever improves), so it cannot
    * re-enter. Eviction therefore never lets a duplicate through.
    */
  final class Buffer(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    private def beats(s: Double, i: Long, j: Int): Boolean =
      s > scores(j) || (s == scores(j) && i < ids(j))

    def insert(s: Double, i: Long): Unit = {
      // dedup scan: same id already ranked?
      var d = 0
      while (d < size) {
        if (ids(d) == i) {
          if (s <= scores(d)) return // equal-score duplicate (or worse)
          // better score for the same id: remove the stale slot, re-rank
          var m = d
          while (m < size - 1) {
            scores(m) = scores(m + 1); ids(m) = ids(m + 1); m += 1
          }
          size -= 1
          d = size // exit scan
        } else d += 1
      }
      if (size == k && !beats(s, i, k - 1)) return
      var p = size
      var j = 0
      var found = false
      while (j < size && !found) {
        if (beats(s, i, j)) { p = j; found = true }
        j += 1
      }
      if (p >= k) return
      val last = math.min(size, k - 1)
      var m = last
      while (m > p) {
        scores(m) = scores(m - 1); ids(m) = ids(m - 1); m -= 1
      }
      scores(p) = s
      ids(p) = i
      if (size < k) size += 1
    }
  }
}

object TopKIdsAgg {
  /** Bounded rank buffer: parallel arrays sorted by (score desc, id asc),
    * insertion-sorted — O(k) per accepted candidate, k is small by
    * construction (a top-k report, not a corpus).
    */
  final class Buffer(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** True when (s, i) outranks slot j under (score desc, id asc). */
    private def beats(s: Double, i: Long, j: Int): Boolean =
      s > scores(j) || (s == scores(j) && i < ids(j))

    def insert(s: Double, i: Long): Unit = {
      if (size == k && !beats(s, i, k - 1)) return
      // find insertion point (first slot this candidate beats)
      var p = size
      var j = 0
      var found = false
      while (j < size && !found) {
        if (beats(s, i, j)) { p = j; found = true }
        j += 1
      }
      if (p >= k) return
      val last = math.min(size, k - 1)
      var m = last
      while (m > p) {
        scores(m) = scores(m - 1); ids(m) = ids(m - 1); m -= 1
      }
      scores(p) = s
      ids(p) = i
      if (size < k) size += 1
    }
  }
}
