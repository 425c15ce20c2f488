package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native table-valued generator `graft_shingles(words, n)` — the UDTF
  * surface of the extension brief (SURVEY §2.12): a custom Catalyst
  * [[Generator]] emitting one `(pos, shingle)` row per n-word window of
  * the input token array, planned through the standard `Generate` node
  * (so column pruning, required-column analysis, and generator aliasing
  * all apply exactly as for `posexplode`).
  *
  * Versus the `posexplode(transform(sequence(...), i -> concat_ws(...)))`
  * composition the dedup tier uses, the generator emits rows directly —
  * no intermediate n-gram ARRAY is materialized per document (for a
  * 500-word doc that array is ~498 strings of ~3 words each, built and
  * thrown away per row). Semantics mirror the composition exactly,
  * including `concat_ws` null handling (null elements are skipped, with
  * no doubled separator). A null/too-short array yields zero rows, like
  * exploding an empty array.
  *
  * `n` must be a foldable positive INT literal (a model/config constant,
  * like `posexplode`'s implicit step). Runs on the interpreted
  * `Generate` path (Spark's whole-stage-codegen fast path is reserved
  * for the built-in collection generators) — the same execution tier as
  * any user UDTF, without UDTF registration overhead.
  */
case class ShingleGenerator(words: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(words, n)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    words.dataType match {
      case ArrayType(StringType, _)
          if n.dataType == IntegerType && n.foldable =>
        val nv = n.eval(null)
        if (nv == null || nv.asInstanceOf[Int] < 1)
          TypeCheckResult.TypeCheckFailure(
            "graft_shingles n must be a positive INT literal")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles requires (array<string>, int literal), got $other")
    }

  private lazy val nVal: Int = n.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = words.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val len = arr.numElements()
    if (len < nVal) return Iterator.empty
    (0 to len - nVal).iterator.map { i =>
      val sb = new java.lang.StringBuilder
      var j = 0
      var first = true
      while (j < nVal) {
        if (!arr.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      InternalRow(i, UTF8String.fromString(sb.toString))
    }
  }

  override def prettyName: String = "graft_shingles"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleGenerator =
    copy(words = newChildren(0), n = newChildren(1))
}
