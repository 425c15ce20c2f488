package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Minimal DataSource V2 connector — the "generic pluggable source"
  * surface of SURVEY.md §2.1: the reference sketches a `DataSource` trait
  * with capability flags and pushdown setters (io/datasource.rs:87-111) +
  * a registry (context.rs:7-24); Spark's native equivalent is a
  * `TableProvider`, registered by class name. This one synthesizes
  * `rows` deterministic rows split into `slices` input partitions —
  * the two properties a real connector must get right at 100 TB scale:
  * parallel partition planning (no single-reader funnel) and column
  * pruning (`SupportsPushDownRequiredColumns`), so `select(id)` never
  * materializes the string column.
  *
  * Usage: `spark.read.format("graft.sources.RangeSource")
  *   .option("rows", n).option("slices", k).load()`
  * Schema: id BIGINT, id_mod INT (= id % 97), tag STRING (= "r"+id).
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RangeTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object RangeSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("id_mod", IntegerType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

private[sources] class RangeTable(rows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($rows)"
  override def schema(): StructType = RangeSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(rows, slices)
}

private[sources] class RangeScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RangeSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new RangeScan(rows, slices, required)
}

private[sources] class RangeScan(rows: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val per = (rows + n - 1) / n
    (0L until n).map { i =>
      RangeSlice(i * per, math.min(rows, (i + 1) * per))
    }.filter(s => s.end > s.start).toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)
}

private[sources] case class RangeSlice(start: Long, end: Long) extends InputPartition

private[sources] class RangeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RangeReader(partition.asInstanceOf[RangeSlice], required)
}

private[sources] class RangeReader(slice: RangeSlice, required: StructType)
    extends PartitionReader[InternalRow] {
  private var cur = slice.start - 1
  override def next(): Boolean = { cur += 1; cur < slice.end }
  override def get(): InternalRow =
    InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
      case "id" => cur
      case "id_mod" => (cur % 97).toInt
      case "tag" => UTF8String.fromString(s"r$cur")
    }))
  override def close(): Unit = ()
}
