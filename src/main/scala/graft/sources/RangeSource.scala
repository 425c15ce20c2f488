package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
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
      properties.getOrDefault("slices", "4").toInt,
      properties.getOrDefault("columnar", "false").toBoolean,
      properties.getOrDefault("keyGrouped", "false").toBoolean)
}

object RangeSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("id_mod", IntegerType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Last runtime-filter narrowing applied to any RangeScan — runtime
    * filtering happens between AQE stages with no plan-visible trace,
    * so tests observe the effect here.
    */
  @volatile var lastRuntimeRange: Option[(Long, Long)] = None
}

private[sources] class RangeTable(rows: Long, slices: Int, columnar: Boolean,
                                  keyGrouped: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($rows)"
  override def schema(): StructType = RangeSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    if (keyGrouped) new KeyGroupedRangeScanBuilder(rows)
    else new RangeScanBuilder(rows, slices, columnar)
}

/** Key-grouped layout (`option("keyGrouped", true)`): one input
  * partition per `id_mod` value, each declaring its key via
  * HasPartitionKey, with the scan reporting KeyGroupedPartitioning on
  * the identity transform of id_mod. Under
  * `spark.sql.sources.v2.bucketing.enabled` this is the
  * storage-partitioned execution path: a groupBy(id_mod) plans NO
  * exchange, and two key-grouped sources join on id_mod shuffle-free —
  * the Spark-native form of the co-located layout a 100 TB table keeps
  * on disk (Iceberg/bucketed tables report exactly this way).
  */
private[sources] class KeyGroupedRangeScanBuilder(rows: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RangeSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new KeyGroupedRangeScan(rows, required)
}

private[sources] class KeyGroupedRangeScan(rows: Long, required: StructType)
    extends Scan with Batch with SupportsReportPartitioning {
  private val Mod = 97

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft_range_keygrouped($rows)"

  override def outputPartitioning(): partitioning.Partitioning =
    new partitioning.KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .identity("id_mod")),
      planInputPartitions().length)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until Mod).filter(_ < rows)
      .map(m => ModSlice(m, rows)).toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new ModReaderFactory(required)
}

/** All ids in [0, rows) with id % 97 == mod; the partition key IS the
  * id_mod value, which is what lets Spark line partitions up across
  * two scans without a shuffle.
  */
private[sources] case class ModSlice(mod: Int, rows: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(mod)
}

private[sources] class ModReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[ModSlice]
    new PartitionReader[InternalRow] {
      private var cur = s.mod.toLong - 97L
      override def next(): Boolean = { cur += 97L; cur < s.rows }
      override def get(): InternalRow =
        InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
          case "id" => cur
          case "id_mod" => (cur % 97).toInt
          case "tag" => UTF8String.fromString(s"r$cur")
        }))
      override def close(): Unit = ()
    }
  }
}

/** Pushdown surface matching the reference `DataSource` capability flags
  * (io/datasource.rs:95-101: `supports_filtering` / `supports_limit` /
  * column projection): id-range predicates narrow the generated interval
  * at PLANNING time (the source never materializes skipped rows — the
  * parquet-row-group-pruning analogue for a synthetic source), a pushed
  * limit caps it, and both compose with column pruning. Range-exact
  * filters are consumed (no residual re-evaluation); anything not a
  * simple id range stays post-scan.
  */
private[sources] class RangeScanBuilder(rows: Long, slices: Int, columnar: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._

  private var required: StructType = RangeSource.fullSchema
  private var lo: Long = 0L
  private var hi: Long = rows
  private var limit: Option[Int] = None
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def long(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  // Exactly-applied filters return no residual; the scan emits only the
  // narrowed interval so Spark need not re-check. IsNotNull is vacuous
  // (every column is non-nullable).
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (taken, residual) = filters.partition {
      case EqualTo("id", v) => long(v).exists { x => lo = math.max(lo, x); hi = math.min(hi, x + 1); true }
      case GreaterThan("id", v) => long(v).exists { x => lo = math.max(lo, x + 1); true }
      case GreaterThanOrEqual("id", v) => long(v).exists { x => lo = math.max(lo, x); true }
      case LessThan("id", v) => long(v).exists { x => hi = math.min(hi, x); true }
      case LessThanOrEqual("id", v) => long(v).exists { x => hi = math.min(hi, x + 1); true }
      case IsNotNull(_) => true
      case _ => false
    }
    accepted = taken
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  // Partial push (the default): the scan emits at most `n` rows but
  // Spark keeps its global limit, which stays correct if slices > 1.
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  // COMPLETE aggregate pushdown: over the (already filter-narrowed)
  // interval [lo,hi), count(*)/count(id)/min(id)/max(id) have closed
  // forms — the source answers them without materializing a single
  // row, the metadata-only aggregate path parquet footers provide and
  // the strongest of the reference's capability flags
  // (io/datasource.rs:95-101). Grouped or non-id aggregates are
  // declined and execute post-scan as usual.
  private var aggResult: Option[Seq[Any]] = None
  private var aggSchema: Option[StructType] = None

  private def idRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case f: org.apache.spark.sql.connector.expressions.NamedReference =>
        f.fieldNames.toSeq == Seq("id")
      case _ => false
    }

  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall {
      case _: aggregate.CountStar => true
      case c: aggregate.Count => idRef(c.column) // id is unique+non-null
      case m: aggregate.Min => idRef(m.column)
      case m: aggregate.Max => idRef(m.column)
      case _ => false
    }

  override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    val span = math.max(0L, hi - lo)
    val (values, fields) = agg.aggregateExpressions.zipWithIndex.map {
      case (_: aggregate.CountStar, i) =>
        (span: Any) -> StructField(s"count_star_$i", LongType, nullable = false)
      case (_: aggregate.Count, i) =>
        (span: Any) -> StructField(s"count_id_$i", LongType, nullable = false)
      case (_: aggregate.Min, i) =>
        ((if (span == 0) null else lo): Any) ->
          StructField(s"min_id_$i", LongType, nullable = true)
      case (_: aggregate.Max, i) =>
        ((if (span == 0) null else hi - 1): Any) ->
          StructField(s"max_id_$i", LongType, nullable = true)
      case (other, _) =>
        throw new IllegalStateException(s"unreachable: $other")
    }.toSeq.unzip
    aggResult = Some(values)
    aggSchema = Some(StructType(fields))
    true
  }

  override def build(): Scan = aggResult match {
    case Some(values) =>
      new RangeAggScan(lo, hi, aggSchema.get, values)
    case None =>
      new RangeScan(lo, limit.fold(hi)(n => math.min(hi, lo + n.toLong)), slices,
        required, columnar)
  }
}

/** Single-row scan carrying a completely-pushed-down aggregate answer:
  * no data partitions are planned beyond the one row, regardless of the
  * logical row count.
  */
private[sources] class RangeAggScan(lo: Long, hi: Long, schema: StructType,
                                    values: Seq[Any])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"graft_range[$lo,$hi) agg=$values"
  override def planInputPartitions(): Array[InputPartition] =
    Array(RangeSlice(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    new SingleRowFactory(values)
}

/** Emits exactly one row of precomputed values (the pushed-down
  * aggregate answer). A named top-level class: factories are shipped to
  * executors, so an anonymous inner class would drag the enclosing
  * (non-serializable) Scan with it.
  */
private[sources] class SingleRowFactory(values: Seq[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values)
      override def close(): Unit = ()
    }
}

/** Runtime (join-driven) filtering — the DSV2 analogue of dynamic
  * partition pruning: when this scan feeds the large side of a join,
  * Spark hands it the joinable `id` values BETWEEN AQE stages
  * (`BatchScanExec.filteredPartitions` → `filter(...)` → re-plan), and
  * the scan narrows its interval to [min, max+1] of that set before
  * planning partitions. Returning a superset of the exact matches is
  * allowed (the join still applies), so min/max narrowing is correct
  * and prunes whole partitions — at 100 TB this is what keeps a
  * dimension-filtered fact join from scanning the full fact.
  */
private[sources] class RangeScan(lo: Long, hi: Long, slices: Int,
                                 required: StructType, columnar: Boolean)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics {
  import org.apache.spark.sql.sources.{Filter, In}

  /** Exact statistics from the (filter-narrowed) interval: without
    * these, Spark assumes a V2 source is defaultSizeInBytes-huge and
    * will never pick a stats-driven broadcast — with them, a small
    * range joins as the build side with no broadcast() hint, the same
    * planner treatment a parquet table with footer stats gets.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val span = math.max(0L, hi - lo)
    // id(8) + id_mod(4) + tag(~8) bytes per row, scaled to the pruned schema.
    private val rowBytes = math.max(8, required.fields.length * 7)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(span * rowBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(span)
  }

  private var rlo: Long = lo
  private var rhi: Long = hi

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = {
    filters.foreach {
      case In("id", vs) =>
        val longs = vs.collect { case n: Number => n.longValue() }
        if (longs.isEmpty) rhi = rlo // join side produced no keys
        else {
          rlo = math.max(rlo, longs.min)
          rhi = math.min(rhi, longs.max + 1)
        }
      case _ => () // superset semantics: ignoring a filter is safe
    }
    RangeSource.lastRuntimeRange = Some((rlo, rhi))
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft_range[$lo,$hi)"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val span = math.max(0L, rhi - rlo)
    val per = (span + n - 1) / math.max(1L, n.toLong)
    if (span == 0L) Array.empty
    else (0L until n).map { i =>
      RangeSlice(rlo + i * per, math.min(rhi, rlo + (i + 1) * per))
    }.filter(s => s.end > s.start).toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    if (columnar) new RangeColumnarFactory(required)
    else new RangeReaderFactory(required)
}

private[sources] case class RangeSlice(start: Long, end: Long) extends InputPartition

private[sources] class RangeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RangeReader(partition.asInstanceOf[RangeSlice], required)
}

/** Vectorized read path: fills OnHeapColumnVector batches of up to 4096
  * rows, so the scan feeds Tungsten ColumnarBatches and the plan shows a
  * ColumnarToRow boundary only where a row-based operator actually needs
  * rows — the same mechanism the built-in parquet reader uses, and the
  * shape a high-throughput 100 TB connector must produce to avoid
  * per-row iterator overhead.
  */
private[sources] class RangeColumnarFactory(required: StructType)
    extends PartitionReaderFactory {
  private val BatchRows = 4096

  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    throw new UnsupportedOperationException("columnar-only factory")

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val slice = partition.asInstanceOf[RangeSlice]
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
      import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

      private var cur = slice.start
      private var batch: ColumnarBatch = _

      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        if (cur >= slice.end) false
        else {
          val n = math.min(BatchRows.toLong, slice.end - cur).toInt
          val vectors = OnHeapColumnVector.allocateColumns(n, required)
          var i = 0
          while (i < n) {
            val id = cur + i
            var c = 0
            while (c < required.length) {
              required.fields(c).name match {
                case "id" => vectors(c).putLong(i, id)
                case "id_mod" => vectors(c).putInt(i, (id % 97).toInt)
                case "tag" =>
                  val b = s"r$id".getBytes("UTF-8")
                  vectors(c).putByteArray(i, b, 0, b.length)
              }
              c += 1
            }
            i += 1
          }
          batch = new ColumnarBatch(vectors.map(v => v: ColumnVector), n)
          cur += n
          true
        }
      }

      override def get(): ColumnarBatch = batch
      override def close(): Unit = if (batch != null) { batch.close(); batch = null }
    }
  }
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
