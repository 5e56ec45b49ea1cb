package graft.sources.v2

import java.util.OptionalLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector: the deterministic row generator
  * (`spark.read.format("graft-gen").option("rows", n)`) every 100 TB
  * load test needs, with the full pushdown surface a real connector
  * carries —
  *
  *  - **filter pushdown** ([[SupportsPushDownFilters]]): range/equality
  *    predicates on `id` tighten the generator's `[lo, hi)` bounds and are
  *    consumed EXACTLY, so Catalyst drops the post-scan Filter node
  *    entirely (`pushFilters` returns only the residue);
  *  - **partition pruning**: input partitions are planned AFTER the bounds
  *    tighten, so a restricted scan plans proportionally fewer tasks — the
  *    DSv2 analogue of parquet row-group pruning;
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): the reader
  *    materializes only requested fields (a `select(k)` never computes the
  *    string column);
  *  - **statistics** ([[SupportsReportStatistics]]): post-pushdown row and
  *    byte counts feed the planner's broadcast/AQE decisions.
  *
  * The row function is pure integer arithmetic chosen to be reproducible
  * in any engine WITHOUT wraparound (DuckDB BIGINT errors on int64
  * overflow where non-ANSI Spark wraps): `k = id % KMod`,
  * `v = (id * LehmerA) % LehmerM` (Lehmer LCG step; `id * 48271` stays
  * under 2^63 for any id < 2^47), `seg = 's' || id % SegMod`. That makes
  * the source its own oracle: DuckDB regenerates the identical table from
  * `range(n)`.
  */
class GenSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-gen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong)
      .getOrElse(GenSource.DefaultRows)
    new GenTable(
      rows = rows,
      slices = Option(properties.get("slices")).map(_.toInt)
        .getOrElse(GenSource.DefaultSlices),
      rowsPerBatch = Option(properties.get("rowsPerBatch")).map(_.toLong)
        .getOrElse(rows),
      keyGrouped = Option(properties.get("keyGrouped")).exists(_.toBoolean))
  }
}

object GenSource {
  val DefaultRows = 1000000L
  val DefaultSlices = 32

  /** Generator constants — ONE definition, interpolated into oracle SQL. */
  val KMod = 97L
  val SegMod = 8L
  val LehmerA = 48271L
  val LehmerM = 2147483647L

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("seg", StringType, nullable = false)))
}

private[graft] class GenTable(rows: Long, slices: Int, rowsPerBatch: Long,
    keyGrouped: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, slices, rowsPerBatch, keyGrouped)
}

private[graft] class GenScanBuilder(rows: Long, slices: Int, rowsPerBatch: Long,
    keyGrouped: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GenSource.schema
  // COMPLETE aggregate pushdown: the kept funcs, in Aggregation order
  private var aggFuncs: Seq[String] = Nil

  /** COUNT(*) / MIN(id) / MAX(id) over an id range are answerable from the
    * tightened `[lo, hi)` bounds alone — the scan then emits ONE
    * pre-aggregated row and generates nothing, the same contract parquet
    * footer-count pushdown honors. Only ungrouped, fully-answerable
    * aggregations are accepted (complete pushdown); anything else —
    * grouping, min/max over the derived columns — declines and runs as a
    * normal aggregate over the generated rows.
    */
  private def handled(agg: Aggregation): Option[Seq[String]] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    // a key-grouped scan's contract is its reported partitioning — a
    // completely-pushed 1-row aggregate would contradict it; decline and
    // let the (already co-partitioned) normal aggregate run
    if (keyGrouped) return None
    if (agg.groupByExpressions.nonEmpty) return None
    val funcs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      case m: Min => m.column match {
        case f: NamedReference if f.fieldNames.toSeq == Seq("id") => Some("min")
        case _ => None
      }
      case m: Max => m.column match {
        case f: NamedReference if f.fieldNames.toSeq == Seq("id") => Some("max")
        case _ => None
      }
      case _ => None
    }
    if (funcs.forall(_.isDefined)) Some(funcs.flatten) else None
  }

  /** LIMIT n truncates the generator range itself: deterministic here
    * because the source is id-ordered (a LIMIT over an unordered source is
    * allowed to return any n rows — this one returns the first n ids).
    * The truncated range yields EXACTLY min(limit, hi-lo) rows, so the
    * push is total and Spark may drop its own Limit.
    */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true
  }

  override def isPartiallyPushed(): Boolean = false

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    handled(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    handled(agg) match {
      case Some(funcs) => aggFuncs = funcs; true
      case None => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("id", _: java.lang.Long) => true
      case GreaterThan("id", _: java.lang.Long) => true
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case _ => false
    }
    // saturating successor: x+1 at Long.MaxValue must clamp, not wrap —
    // a wrapped bound silently widens an accepted (non-re-checked) filter
    def succ(x: Long): Long = if (x == Long.MaxValue) x else x + 1L
    accepted.foreach {
      case EqualTo("id", x: java.lang.Long) =>
        lo = math.max(lo, x); hi = math.min(hi, succ(x))
      case GreaterThan("id", x: java.lang.Long) =>
        if (x == Long.MaxValue) hi = lo else lo = math.max(lo, succ(x))
      case GreaterThanOrEqual("id", x: java.lang.Long) => lo = math.max(lo, x.longValue())
      case LessThan("id", x: java.lang.Long) => hi = math.min(hi, x.longValue())
      case LessThanOrEqual("id", x: java.lang.Long) => hi = math.min(hi, succ(x))
      case _ =>
    }
    pushed = accepted
    // accepted bounds are applied EXACTLY by the generator, so Spark need
    // not re-evaluate them: only the residue goes back for post-filtering
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GenScan(math.max(lo, 0L), math.max(hi, math.max(lo, 0L)), slices,
      rowsPerBatch, required, pushed, aggFuncs, keyGrouped)
}

private[graft] class GenScan(lo: Long, hi: Long, slices: Int,
    rowsPerBatch: Long, required: StructType, pushed: Array[Filter],
    aggFuncs: Seq[String] = Nil, keyGrouped: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  /** Storage-partitioned-join surface ([[SupportsReportPartitioning]]):
    * with `keyGrouped=true` the scan plans ONE partition per residue class
    * of `k` (each carrying its partition key via
    * [[org.apache.spark.sql.connector.read.HasPartitionKey]]) and reports
    * `KeyGroupedPartitioning(identity(k), KMod)`. Under
    * `spark.sql.sources.v2.bucketing.enabled`, joins and aggregates keyed
    * on `k` then plan with ZERO exchanges — the DSv2 analogue of bucketed
    * tables, and the mechanism Iceberg/Delta use for co-located joins at
    * 100 TB. GenSourceSpec pins both the plan and the row-for-row equality
    * with the unpartitioned scan.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, UnknownPartitioning}
    if (keyGrouped && required.fieldNames.contains("k"))
      new KeyGroupedPartitioning(Array(Expressions.identity("k")),
        GenSource.KMod.toInt)
    // the count is advisory for an unknown partitioning — do NOT call
    // planInputPartitions() just to measure it (planning re-consults
    // outputPartitioning, and a runtime id-set would re-chunk every time)
    else new UnknownPartitioning(0)
  }

  // runtime (DPP-style) filtering: a join against a filtered dim hands the
  // scan the dim's id set AFTER planning; the generator applies it EXACTLY
  // (emit precisely those ids) so the join side reads |dim| rows instead
  // of the range — the v2 analogue of dynamic partition pruning
  private var idSet: Option[Array[Long]] = None

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // advertise the runtime-filterable column ONLY while it survives column
    // pruning: the PartitionPruning rule resolves these refs against the
    // scan's (pruned) output and fails the query on a dangling name
    if (required.fieldNames.contains("id"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In("id", vs) =>
      // null / non-long entries can never equal a generated id — drop
      // them and keep pruning with the rest (abandoning the whole set
      // would silently regenerate the full range)
      val longs = vs.collect { case l: java.lang.Long => l.longValue() }
      val inRange = longs.filter(v => v >= lo && v < hi).sorted.distinct
      idSet = Some(idSet.map(_.intersect(inRange)).getOrElse(inRange))
    case EqualTo("id", v: java.lang.Long) =>
      val x = v.longValue()
      val inRange = if (x >= lo && x < hi) Array(x) else Array.empty[Long]
      idSet = Some(idSet.map(_.intersect(inRange)).getOrElse(inRange))
    case _ => // unhandled runtime filters are advisory — ignore
  }

  override def readSchema(): StructType =
    if (aggFuncs.isEmpty) required
    else StructType(aggFuncs.zipWithIndex.map { case (f, i) =>
      StructField(s"${f}_$i", LongType, nullable = f != "count")
    })

  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenMicroBatchStream(lo, hi, slices, rowsPerBatch, required)
  override def description(): String =
    s"GenScan [$lo, $hi) cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString(",")}" +
      (if (aggFuncs.nonEmpty) s" aggPushed=${aggFuncs.mkString(",")}" else "")

  // planned AFTER pushdown (and re-planned after runtime filtering): a
  // tightened range plans fewer partitions; a completely-pushed
  // aggregation plans ONE partition emitting one row; a runtime id set
  // plans only the matching ids
  override def planInputPartitions(): Array[InputPartition] = {
    // key-grouped mode: ALWAYS one partition per residue class (a stable
    // count and value set is what makes two scans' partitionings
    // compatible for the storage-partitioned join); runtime id-sets stay
    // advisory here, and aggregate pushdown was declined upstream
    if (keyGrouped)
      return (0L until GenSource.KMod)
        .map(k => GenKeyPartition(k, lo, hi): InputPartition).toArray
    if (aggFuncs.nonEmpty) return Array(GenPartition(lo, hi))
    idSet match {
      case Some(ids) =>
        if (ids.isEmpty) Array.empty
        else ids.grouped(math.max(1, ids.length / slices))
          .map(g => GenSetPartition(g): InputPartition).toArray
      case None =>
        val n = hi - lo
        if (n <= 0) return Array.empty
        val parts = math.min(slices.toLong, n).toInt
        (0 until parts).map { i =>
          val s = lo + i * n / parts
          val e = lo + (i + 1) * n / parts
          GenPartition(s, e): InputPartition
        }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (aggFuncs.nonEmpty) new GenAggReaderFactory(aggFuncs)
    else new GenReaderFactory(required)

  override def estimateStatistics(): Statistics = new Statistics {
    // a completely-pushed aggregation emits ONE row — report that, or the
    // planner treats the 1-row result as a huge relation and never
    // broadcasts it
    private val n =
      if (aggFuncs.nonEmpty) 1L else math.max(hi - lo, 0L)
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(n * (readSchema().fields.length.toLong * 8L + 8L))
    override def numRows(): OptionalLong = OptionalLong.of(n)
  }
}

private[graft] case class GenPartition(start: Long, end: Long)
    extends InputPartition

/** Explicit id list from a runtime (join-driven) filter. */
private[graft] case class GenSetPartition(ids: Array[Long])
    extends InputPartition

/** One residue class of `k` — all ids in [lo, hi) with id % KMod == k —
  * carrying its partition key for the storage-partitioned join.
  */
private[graft] case class GenKeyPartition(k: Long, lo: Long, hi: Long)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(k)
}

/** Streaming offsets are row positions — trivially serializable, totally
  * ordered, replayable: re-planning any [start, end) range after a restart
  * regenerates byte-identical rows, which is the exactly-once contract a
  * replayable source owes the checkpoint.
  */
private[graft] case class GenOffset(n: Long) extends Offset {
  override def json: String = n.toString
}

/** Micro-batch read path: each trigger admits at most `rowsPerBatch` ids
  * ([[SupportsTriggerAvailableNow]], so `Trigger.AvailableNow` drains the
  * table in ceil(n / rowsPerBatch) rate-limited batches and stops).
  * Column pruning flows in from the shared [[GenScanBuilder]].
  */
private[graft] class GenMicroBatchStream(lo: Long, hi: Long, slices: Int,
    rowsPerBatch: Long, required: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = GenOffset(lo)

  override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)

  override def prepareForTriggerAvailableNow(): Unit = ()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "rate-limited source: use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GenOffset].n
    GenOffset(math.min(s + rowsPerBatch, hi))
  }

  override def reportLatestOffset(): Offset = GenOffset(hi)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GenOffset].n
    val e = end.asInstanceOf[GenOffset].n
    val n = e - s
    if (n <= 0) return Array.empty
    val parts = math.min(slices.toLong, n).toInt
    (0 until parts).map { i =>
      GenPartition(s + i * n / parts, s + (i + 1) * n / parts): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Answers a completely-pushed aggregation from the range bounds alone:
  * one row, zero generated rows — count = hi−lo, min = lo, max = hi−1
  * (min/max null on an empty range, matching SQL).
  */
private[graft] class GenAggReaderFactory(aggFuncs: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val n = math.max(gp.end - gp.start, 0L)
        InternalRow.fromSeq(aggFuncs.map {
          case "count" => n
          case "min" => if (n > 0) gp.start else null
          case "max" => if (n > 0) gp.end - 1 else null
        }.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}

private[graft] class GenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case gp: GenPartition =>
        // Iterator.range is Int-typed; the generator domain is Long
        val longRange = new Iterator[Long] {
          private var c = gp.start
          override def hasNext: Boolean = c < gp.end
          override def next(): Long = { val r = c; c += 1; r }
        }
        new GenReader(longRange, required)
      case sp: GenSetPartition => new GenReader(sp.ids.iterator, required)
      case kp: GenKeyPartition =>
        // first id >= lo in the class, then stride by the modulus
        val first = {
          val r = ((kp.k - kp.lo) % GenSource.KMod + GenSource.KMod) %
            GenSource.KMod
          kp.lo + r
        }
        val strided = new Iterator[Long] {
          private var c = first
          override def hasNext: Boolean = c < kp.hi
          override def next(): Long = { val r = c; c += GenSource.KMod; r }
        }
        new GenReader(strided, required)
    }
}

private[graft] class GenReader(ids: Iterator[Long], required: StructType)
    extends PartitionReader[InternalRow] {
  import GenSource._

  // pre-resolve the column generators once per partition, not per row
  private val gens: Array[Long => Any] = required.fields.map { f =>
    f.name match {
      case "id" => (id: Long) => id
      case "k" => (id: Long) => id % KMod
      case "v" => (id: Long) => (id * LehmerA) % LehmerM
      case "seg" => (id: Long) => UTF8String.fromString(s"s${id % SegMod}")
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
  }
  private var cur = 0L

  override def next(): Boolean = {
    val has = ids.hasNext
    if (has) cur = ids.next()
    has
  }
  override def get(): InternalRow =
    InternalRow.fromSeq(gens.map(g => g(cur)).toIndexedSeq)
  override def close(): Unit = ()
}
