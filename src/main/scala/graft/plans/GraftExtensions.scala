package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's native expressions
  * into the session function registry (the (c)-tier extension point of
  * the builder brief — here carrying the (b)-tier scalar kernels).
  * Activated via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (wired in [[graft.Session.builder]]), after which
  * `graft_dot(a, b)` resolves in SQL, `expr(...)`, and
  * `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(arrA, arrB) takes 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_sorted_intersect(arrA, arrB) takes 2 arguments")
        SortedIntersectCount(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName,
        "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_jaro_winkler(strA, strB) takes 2 arguments")
        JaroWinklerSim(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_simhash(hashArray) takes 1 argument")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lcs"),
      new ExpressionInfo(classOf[LcsLength].getName, "graft_lcs"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_lcs(hashArrayA, hashArrayB) takes 2 arguments")
        LcsLength(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleGenerator].getName,
        "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_shingles(wordsArray, n) takes 2 arguments")
        ShingleGenerator(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_topfreq"),
      new ExpressionInfo(classOf[TopFreqSketch].getName, "graft_topfreq"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_topfreq(item, k) takes 2 arguments")
        TopFreqSketch(children.head, children(1))
          .toAggregateExpression()
      }))
    // (c)-tier whole-operator extension: per-key top-k logical node,
    // its key-filter commutation rule, and the partial/final planner
    // strategy (see PerKeyTopK.scala).
    ext.injectOptimizerRule(_ => PushFilterThroughPerKeyTopK)
    ext.injectPlannerStrategy(_ => PerKeyTopKStrategy)
  }
}
