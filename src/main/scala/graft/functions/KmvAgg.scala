package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** K-minimum-values distinct sketch as a native Catalyst
  * [[TypedImperativeAggregate]] — the integration mechanism production
  * sketch libraries (DataSketches, Algebird) plug into Spark with, here
  * demonstrated end-to-end: an arbitrary-object aggregation buffer (a
  * bounded sorted set), byte-serialized between the partial and final
  * aggregation stages, merged associatively, evaluated once per group.
  *
  * Where [[graft.analytics.WindowExtras.kmvDistinct]] builds the same
  * estimator from composed operators (DISTINCT → window rank → k-th), this
  * form runs as ONE aggregate: map-side partials keep at most k longs per
  * group, the shuffle moves ≤ k·8 bytes per (group, partition) instead of
  * the distinct hash set, and the merge is a union-trim. At 100 TB that is
  * the difference between shuffling every distinct user hash and shuffling
  * a fixed 256-byte sketch per group per mapper — the whole reason sketch
  * aggregates exist.
  *
  * Input is an h32 hash column ([[Md5Hash.h32]] — md5-deterministic in
  * both engines), so the estimate — exact size when unsaturated, else
  * `(k−1)·2³² / kth_smallest` — is reproduced bit-for-bit by the DuckDB
  * oracle. Order-independence is structural: "k smallest of a set" does
  * not depend on partitioning or merge order, which is what makes a
  * sketch AGGREGATE hash-comparable where a float sum is not.
  *
  * SQL: `SELECT graft_kmv(h) FROM …` (registered via
  * [[graft.GraftExtensions]]); DataFrame: `expr("graft_kmv(h)")`.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 1, s"graft_kmv needs k > 1, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only a value below the current k-th smallest can enter the sketch
      if (buffer.size < k || h < buffer.last) {
        buffer.add(h)
        if (buffer.size > k) buffer.remove(buffer.last)
      }
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buffer.addAll(other)
    while (buffer.size > k) buffer.remove(buffer.last)
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    if (buffer.size < k) buffer.size.toDouble
    // kth == 0 is unreachable for k distinct values in [0, 2^32) (the k-th
    // smallest of k >= 2 distinct non-negatives is >= 1), but the division
    // must not be able to produce Infinity on adversarial input — saturate
    // to the full-domain estimate instead; the oracle mirrors the guard
    else (k - 1).toDouble * 4294967296.0 /
      math.max(buffer.last.longValue(), 1L)

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 8)
    bb.putInt(buffer.size)
    buffer.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects a BIGINT h32 hash, got ${child.dataType.sql}")
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}
