package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen longest-common-subsequence LENGTH over two
  * `ARRAY<BIGINT>` token-hash sequences — the primitive behind ROUGE-L
  * and token-level diff stats (insertions = |B|−LCS, deletions =
  * |A|−LCS).
  *
  * Spark has no built-in for this: `levenshtein` is CHARACTER-grain
  * (and LCS ≠ an edit-distance rearrangement once substitutions are
  * allowed), and no HOF composition can express the classic DP's
  * left-to-right + top-to-bottom double recurrence (`transform` cannot
  * read the in-progress row). So this is the (b)-tier custom-kernel
  * path of the builder brief: the standard O(|A|·|B|) rolling-row DP
  * as one primitive loop — a single `int[|B|+1]` of scratch, no
  * boxing, no 2-D table.
  *
  * Token arrays are hashes (the shared-md5 recipe), not strings, so
  * the inner comparison is one long compare; callers hash once per
  * document, never per pair. Elements must be non-null; a null array
  * yields null (SQL convention). Empty arrays yield 0.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_lcs requires (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lcs"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    val row = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      var prev = 0
      val av = x.getLong(i)
      var j = 1
      while (j <= m) {
        val cur = row(j)
        row(j) =
          if (av == y.getLong(j - 1)) prev + 1
          else math.max(row(j), row(j - 1))
        prev = cur
        j += 1
      }
      i += 1
    }
    row(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val row = ctx.freshName("row")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val av = ctx.freshName("av")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int[] $row = new int[$m + 1];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $prev = 0;
         |  long $av = $a.getLong($i);
         |  for (int $j = 1; $j <= $m; $j++) {
         |    int $cur = $row[$j];
         |    $row[$j] = ($av == $b.getLong($j - 1))
         |      ? $prev + 1
         |      : java.lang.Math.max($row[$j], $row[$j - 1]);
         |    $prev = $cur;
         |  }
         |}
         |${ev.value} = $row[$m];
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}
