package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Buffer for [[TopFreqSketch]]: at most k counters plus the cumulative
  * decrement total (the Misra-Gries error bound Δ).
  */
final class TopFreqBuffer(
    val counts: mutable.HashMap[String, Long],
    var errBound: Long)

/** `graft_topfreq(item, k)` — native Misra-Gries heavy-hitter summary as
  * a Catalyst [[TypedImperativeAggregate]]: the first imperative
  * (object-buffer) aggregate in the kernel set, completing the extension
  * tiers (scalar codegen kernels, a Generator UDTF, a whole-operator
  * plan — and now a partial/merge/final aggregate that rides Spark's
  * standard two-phase hash aggregation, exactly like the built-in
  * sketches ref `functions/aggregate.rs` never got past declaring).
  *
  * Semantics (Misra-Gries 1982): at most k counters; a hit increments,
  * a miss with spare room inserts at 1, a miss with a full summary
  * decrements EVERY counter by 1 (dropping zeros) and adds 1 to the
  * error bound Δ. Guarantee: for every item,
  * `cnt ≤ true_count ≤ cnt + err_bound`, and any item with
  * `true_count > Δ` is PRESENT in the summary — the classic
  * frequent-elements contract. Partials merge by pointwise counter sum
  * (Δ sums too); an over-full merged summary is restored to k counters
  * by subtracting the (k+1)-th largest count from every counter and
  * dropping non-positives, adding that subtraction to Δ (the mergeable-
  * summaries construction of Agarwal et al., PODS '12 — the bound still
  * holds after any merge tree, which is what makes the kernel safe
  * under Spark's arbitrary partial/merge schedule at 100 TB).
  *
  * EXACT REGIME: when a group's distinct-item count never exceeds k, no
  * decrement ever fires anywhere in the merge tree — every count is
  * exact, `err_bound = 0`, and the result is independent of row order
  * and partitioning (the DuckDB-oracle-checkable and
  * partition-invariance-pinned mode, exercised by `q287_heavy_hitters`
  * with k = 64 over a 31-word vocabulary). With k below the distinct
  * count the output is a sketch: counts are underestimates within Δ,
  * and WHICH sub-threshold items survive depends on encounter order —
  * the property suite pins the ε-bound, not byte equality.
  *
  * Output: `struct<items array<struct<item string, cnt long>>,
  * err_bound long>`, items ordered by (cnt desc, item asc) — a total
  * deterministic order given the multiset of counters.
  */
case class TopFreqSketch(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopFreqBuffer]
  with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def left: Expression = child
  override def right: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"graft_topfreq requires a STRING item column, got ${child.dataType}")
    } else if (!kExpr.foldable || kExpr.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure(
        "graft_topfreq requires a foldable INT capacity k")
    } else if (kExpr.eval() == null ||
        kExpr.eval().asInstanceOf[Number].intValue() < 1) {
      TypeCheckResult.TypeCheckFailure("graft_topfreq requires k >= 1")
    } else TypeCheckResult.TypeCheckSuccess
  }

  private val itemType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(itemType, containsNull = false),
      nullable = false),
    StructField("err_bound", LongType, nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "graft_topfreq"

  override def createAggregationBuffer(): TopFreqBuffer =
    new TopFreqBuffer(mutable.HashMap.empty, 0L)

  override def update(buf: TopFreqBuffer, input: InternalRow): TopFreqBuffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    val c = buf.counts
    c.get(item) match {
      case Some(n) => c.update(item, n + 1L)
      case None if c.size < k => c.update(item, 1L)
      case None =>
        // Miss on a full summary: decrement all, drop zeros. Snapshot
        // the keys — mutating a HashMap mid-iteration is undefined.
        buf.errBound += 1L
        val ks = c.keysIterator.toArray
        var i = 0
        while (i < ks.length) {
          val key = ks(i)
          val n = c(key)
          if (n == 1L) c.remove(key) else c.update(key, n - 1L)
          i += 1
        }
    }
    buf
  }

  override def merge(a: TopFreqBuffer, b: TopFreqBuffer): TopFreqBuffer = {
    b.counts.foreach { case (item, n) =>
      a.counts.update(item, a.counts.getOrElse(item, 0L) + n)
    }
    a.errBound += b.errBound
    if (a.counts.size > k) {
      // Keep the k largest counters by subtracting the (k+1)-th
      // largest count from every counter — entries at or below it hit
      // zero and drop, so no tie-break ambiguity exists.
      val sorted = a.counts.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - 1 - k)
      a.errBound += cut
      val ks = a.counts.keysIterator.toArray
      var i = 0
      while (i < ks.length) {
        val key = ks(i)
        val n = a.counts(key) - cut
        if (n <= 0L) a.counts.remove(key) else a.counts.update(key, n)
        i += 1
      }
    }
    a
  }

  override def eval(buf: TopFreqBuffer): Any = {
    val entries = buf.counts.toArray
      .sortBy { case (item, n) => (-n, item) }
      .map { case (item, n) =>
        InternalRow(UTF8String.fromString(item), n): Any
      }
    InternalRow(new GenericArrayData(entries), buf.errBound)
  }

  override def serialize(buf: TopFreqBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.errBound)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (item, n) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopFreqBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val err = in.readLong()
    val size = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    new TopFreqBuffer(m, err)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopFreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopFreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopFreqSketch =
    copy(child = newLeft, kExpr = newRight)
}
