package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator per-key top-k as a first-class Catalyst citizen — the
  * (c)-tier extension path of the brief: a custom LogicalPlan, an
  * optimizer Rule, a SparkStrategy, and a physical SparkPlan pair,
  * registered through SparkSessionExtensions ([[GraftExtensions]]).
  *
  * Scale rationale (the reason this exists instead of
  * `row_number().over(...)` — see reference sort/limit surface,
  * dataframe.rs `sort`/`limit`): the window formulation shuffles and
  * SORTS every input row to keep k≪n of them. This operator plans as
  *
  *   PerKeyTopKExec(final) ← shuffle on keys ← PerKeyTopKExec(partial)
  *
  * where the partial node runs on each map partition holding a bounded
  * k-element binary heap per key, so at most k·|keys in partition| rows
  * cross the exchange — at 100 TB with k=5 that is a ~n/5k reduction in
  * shuffle bytes and removes the O(n log n) per-partition sort entirely
  * (heap insert is O(log k)). EnsureRequirements inserts the exchange
  * from the final node's ClusteredDistribution requirement, so AQE can
  * still re-plan partition counts.
  */
case class PerKeyTopKPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): PerKeyTopKPlan =
    copy(child = newChild)
}

/** Filters on the grouping keys commute with per-key top-k (dropping
  * whole groups before or after ranking selects the same rows), so push
  * them below the operator where they can keep sinking into the scan
  * (PushedFilters / partition pruning). Non-deterministic predicates and
  * predicates touching non-key columns do NOT commute (they would change
  * in-group ranking) and are left alone.
  */
object PushFilterThroughPerKeyTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, t: PerKeyTopKPlan)
        if cond.deterministic &&
          f.references.subsetOf(AttributeSet(t.keys.flatMap(_.references))) =>
      t.copy(child = Filter(cond, t.child))
  }
}

/** Plans the logical node as a partial/final exec pair (the same shape
  * HashAggregateExec uses for partial aggregation).
  */
object PerKeyTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PerKeyTopKPlan(keys, order, k, child) =>
      val partial = PerKeyTopKExec(keys, order, k, partial = true, planLater(child))
      PerKeyTopKExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key heap over the child's rows. Partial mode accepts any
  * input distribution (runs map-side); final mode demands clustering on
  * the keys, which EnsureRequirements satisfies with one hash exchange.
  * Keeping ≤k rows per key per partition bounds memory at
  * O(k · |distinct keys in partition| · rowSize) — no sort, no spill of
  * discarded rows.
  *
  * Memory envelope, honestly: that bound grows with key cardinality,
  * and unlike SortExec this operator does not spill. It wins when
  * k · |keys per partition| · rowSize ≪ partition input size (the
  * common "top 5 per supplier over billions of rows" shape, where the
  * partial stage discards ~n/(k·|keys|) of its input before the
  * exchange). When keys are nearly unique per row the heap map
  * approaches the input size — use the window/WindowGroupLimit
  * formulation there instead, which sorts and spills. A planner rule
  * could pick sides from column statistics; here the caller chooses.
  */
case class PerKeyTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): PerKeyTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, output)
      // BaseOrdering: a < b ⟺ a ranks before b under `order`.
      val ord = RowOrdering.create(order, output)
      // max-heap by that ordering ⟹ head = worst row currently kept.
      val heapOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(
          keyProj(row).copy(), mutable.PriorityQueue.empty(heapOrd))
        if (heap.size < k) heap += row.copy()
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
}

/** User-facing constructor: `NativeTopK(df, keys, orderBy, k)` with
  * orderBy = (column, ascending) pairs. The ordering should be total
  * within each key (add a unique tie-break column) for deterministic
  * output.
  */
object NativeTopK {
  def apply(df: DataFrame, keyCols: Seq[String],
            orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    GraftPlanBridge.ofRows(df.sparkSession,
      PerKeyTopKPlan(keyCols.map(attr), order, k, analyzed))
  }
}
