package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK + source — the write half of the reference's
  * pluggable-source surface (io/datasource.rs:87-111 sketches
  * `supports_write`; rust-dataframe only ever implemented readers).
  * Exercises the full V2 batch-write commit protocol: executor-side
  * `DataWriter`s buffer UnsafeRow copies and hand them back as
  * `WriterCommitMessage`s, and only the driver-side `commit()` installs
  * them atomically — a failed/speculative task's rows never become
  * visible, which is exactly how an object-store or database sink gets
  * exactly-once batch semantics at cluster scale. Overwrite maps to
  * `SupportsTruncate`. The read path re-serves committed rows in `slices`
  * input partitions with column pruning.
  *
  * The backing store is a JVM-global map, so as a storage engine it is
  * single-process (tests, fixtures, loopback benchmarks); the
  * planner-facing protocol surface is identical to a distributed sink's.
  *
  * Usage:
  *   df.write.format("graft.sources.MemTableSource").option("name", "t")
  *     .mode("append" | "overwrite").save()
  *   spark.read.format("graft.sources.MemTableSource").option("name", "t").load()
  */
class MemTableSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemStore.schemaOf(MemTableSource.tableName(options.asScala.toMap))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MemTable(MemTableSource.tableName(properties.asScala.toMap), schema,
      properties.getOrDefault("slices", "4").toInt)
}

object MemTableSource {
  private[sources] def tableName(props: Map[String, String]): String =
    props.getOrElse("name",
      throw new IllegalArgumentException("MemTableSource requires option 'name'"))
}

/** Driver-resident committed state: table name → (schema, rows). */
private[graft] object MemStore {
  private val tables = new ConcurrentHashMap[String, (StructType, Array[UnsafeRow])]()

  def schemaOf(name: String): StructType = {
    val t = tables.get(name)
    if (t == null)
      throw new IllegalArgumentException(s"MemTableSource: no table '$name'")
    t._1
  }

  def rowsOf(name: String): Array[UnsafeRow] = {
    val t = tables.get(name)
    if (t == null) Array.empty else t._2
  }

  def install(name: String, schema: StructType, rows: Array[UnsafeRow],
              truncate: Boolean): Unit =
    tables.compute(name, (_, prev) =>
      if (truncate || prev == null) (schema, rows)
      else (schema, prev._2 ++ rows))

  def drop(name: String): Unit = tables.remove(name)
}

private[sources] class MemTable(name: String, writeSchema: StructType, slices: Int)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_mem($name)"
  override def schema(): StructType =
    if (writeSchema != null && writeSchema.nonEmpty) writeSchema
    else MemStore.schemaOf(name)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(name, MemStore.schemaOf(name), slices)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(name, info.schema())
}

// ---------------------------------------------------------------- write

private[sources] class MemWriteBuilder(name: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(name, schema, doTruncate)
  }
}

private[sources] case class MemCommit(rows: Array[UnsafeRow]) extends WriterCommitMessage

private[sources] class MemBatchWrite(name: String, schema: StructType,
                                     truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemStore.install(name, schema,
      messages.flatMap(_.asInstanceOf[MemCommit].rows), truncate)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new MemDataWriter(schema)
}

private[sources] class MemDataWriter(schema: StructType)
    extends DataWriter[InternalRow] {
  private val toUnsafe = UnsafeProjection.create(schema)
  private val buf = ArrayBuffer.empty[UnsafeRow]
  override def write(record: InternalRow): Unit = buf += toUnsafe(record).copy()
  override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

// ----------------------------------------------------------------- read

private[sources] class MemScanBuilder(name: String, full: StructType, slices: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new MemScan(name, full, required, slices)
}

private[sources] class MemScan(name: String, full: StructType,
                               required: StructType, slices: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val rows = MemStore.rowsOf(name)
    val n = math.max(1, math.min(slices, rows.length))
    if (rows.isEmpty) Array(MemSlice(Array.empty))
    else rows.grouped((rows.length + n - 1) / n)
      .map(g => MemSlice(g): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MemReaderFactory(full, required)
}

private[sources] case class MemSlice(rows: Array[UnsafeRow]) extends InputPartition

private[sources] class MemReaderFactory(full: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val prune = UnsafeProjection.create(required.fields.map { f =>
      val i = full.fieldIndex(f.name)
      BoundReference(i, full.fields(i).dataType, f.nullable)
    }.toSeq)
    val rows = partition.asInstanceOf[MemSlice].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = prune(rows(i))
      override def close(): Unit = ()
    }
  }
}
