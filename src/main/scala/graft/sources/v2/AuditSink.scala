package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The DSv2 WRITE path: a transactional audit sink
  * (`df.write.format("graft-audit").option("path", …).option("keyCol", …)`)
  * that demonstrates the V2 commit protocol end-to-end —
  *
  *  - each task's [[DataWriter]] folds its partition into a (rows,
  *    checksum) tally held ONLY in memory: nothing observable exists until
  *    commit, so failed or speculative task attempts leave no trace;
  *  - task `commit()` returns the tally as a [[WriterCommitMessage]];
  *    Spark delivers exactly one committed message per partition to the
  *    driver — the deduplication of attempt retries is the protocol's job,
  *    the sink just has to keep task work side-effect-free;
  *  - driver `commit()` folds the messages and publishes ONE manifest
  *    (`manifest.json`) via write-temp-then-atomic-rename, so a reader
  *    sees either the complete manifest or nothing — job-level atomicity.
  *
  * The checksum is order-independent integer arithmetic
  * (`sum(((key % LehmerM) * LehmerA) % LehmerM)` over non-null keys — the
  * mod-first form keeps the product under 2^47 so it cannot wrap int64 in
  * any engine, ANSI or not — nulls contribute
  * zero), so any engine can recompute it: the oracle re-derives the
  * manifest from the same rows in DuckDB, which makes the hash compare a
  * check of the COMMIT PROTOCOL (every row tallied exactly once across
  * retries and partitions), not of row content.
  *
  * At 100 TB this is the landing-validation pattern: a cheap scan-side
  * fold riding an existing write, committed atomically beside the data,
  * that downstream jobs check before trusting a delivery.
  */
class AuditSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-audit"

  // the sink accepts whatever schema the caller writes
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AuditTable(schema)
}

private[v2] class AuditTable(writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "graft_audit_sink"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = Option(info.options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-audit requires option 'path'"))
    val keyCol = Option(info.options.get("keyCol")).getOrElse(
      throw new IllegalArgumentException("graft-audit requires option 'keyCol'"))
    val ordinal = info.schema().fieldIndex(keyCol)
    require(info.schema().fields(ordinal).dataType == LongType,
      s"keyCol $keyCol must be BIGINT")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(path, ordinal)
      }
    }
  }
}

private[v2] case class AuditTally(rows: Long, checksum: Long)
    extends WriterCommitMessage

private[v2] class AuditBatchWrite(path: String, ordinal: Int)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(ordinal)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    var checksum = 0L
    messages.foreach { case AuditTally(r, c) => rows += r; checksum += c }
    val json =
      s"""{"rows":$rows,"checksum":$checksum,"tasks":${messages.length}}"""
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    // unique temp name: two jobs committing to the same path must not
    // share a staging file, or one driver can publish the other's tally
    val tmp = dir.resolve(
      s"manifest.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    // all-or-nothing publication: a concurrent reader never sees a torn file
    Files.move(tmp, dir.resolve("manifest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  // nothing to clean: task state never touched storage
}

private[v2] class AuditWriterFactory(ordinal: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditWriter(ordinal)
}

private[v2] class AuditWriter(ordinal: Int) extends DataWriter[InternalRow] {
  import GenSource.{LehmerA, LehmerM}
  private var rows = 0L
  private var checksum = 0L

  override def write(record: InternalRow): Unit = {
    rows += 1
    if (!record.isNullAt(ordinal))
      // reduce the key mod M BEFORE the multiply: |key % M| < 2^31 times
      // A = 48271 stays under 2^47, so the product provably fits int64 in
      // every engine — the raw (key * A) form wraps for |key| >~ 1.9e14 in
      // non-ANSI Spark while an ANSI engine errors, silently breaking the
      // "any engine can recompute the checksum" contract
      checksum += ((record.getLong(ordinal) % LehmerM) * LehmerA) % LehmerM
  }

  override def commit(): WriterCommitMessage = AuditTally(rows, checksum)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
