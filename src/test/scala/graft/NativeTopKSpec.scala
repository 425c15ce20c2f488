package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{NativeTopK, PerKeyTopKExec}

/** Pins the (c)-tier custom operator (plans/PerKeyTopK.scala): the
  * logical node plans as a partial/final exec pair with exactly one
  * shuffle between them, produces exactly the window-function answer,
  * and the injected optimizer rule pushes key-only filters below the
  * operator (and on into the parquet scan).
  */
class NativeTopKSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  private def input = Tables.lineitem(spark, sf).select(
    col("l_suppkey").as("key"),
    col("l_quantity").as("measure"),
    (col("l_orderkey") * 100 + col("l_linenumber")).as("tie"))

  test("native top-k equals the window row_number formulation") {
    val native = NativeTopK(input, Seq("key"), Seq(("measure", false), ("tie", true)), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("key")).orderBy(col("measure").desc, col("tie"))
    val expected = input.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(native === expected)
    assert(native.nonEmpty)
  }

  test("plans as partial/final heap pair with exactly one exchange between") {
    val df = NativeTopK(input, Seq("key"), Seq(("measure", false), ("tie", true)), 5)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    val topks = collect(plan) { case e: PerKeyTopKExec => e }
    assert(topks.map(_.partial).sorted === Seq(false, true),
      s"expected one partial and one final PerKeyTopKExec, got $topks")
    val shuffles = collect(plan) { case s: ShuffleExchangeLike => s }
    assert(shuffles.size === 1, s"expected exactly one shuffle, got ${shuffles.size}")
  }

  test("key-only filters are pushed below the operator into the scan") {
    val df = NativeTopK(input, Seq("key"), Seq(("measure", false), ("tie", true)), 5)
      .filter(col("key") < 50)
    // rule fired: no Filter remains above the logical top-k node.
    val optimized = df.queryExecution.optimizedPlan
    assert(!optimized.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter],
      s"filter not pushed through top-k:\n$optimized")
    // and the predicate reaches the parquet scan as a pushed filter.
    val scanStr = df.queryExecution.executedPlan.toString
    assert(scanStr.contains("PushedFilters: [IsNotNull(l_suppkey), LessThan(l_suppkey,50)]"),
      s"predicate did not reach the scan:\n$scanStr")
    // semantics unchanged by the pushdown.
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("key")).orderBy(col("measure").desc, col("tie"))
    val expected = input.filter(col("key") < 50)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).drop("rn")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("measure filters are NOT pushed (they would change ranking)") {
    val df = NativeTopK(input, Seq("key"), Seq(("measure", false), ("tie", true)), 5)
      .filter(col("measure") > 10)
    val w = Window.partitionBy(col("key")).orderBy(col("measure").desc, col("tie"))
    val expected = input.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5 && col("measure") > 10).drop("rn")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("k larger than any group returns every row") {
    val n = input.count()
    assert(NativeTopK(input, Seq("key"), Seq(("tie", true)), 1000000).count() === n)
  }

  test("high key cardinality: one heap per key stays correct") {
    // ~1 row per key — the operator's worst memory case; correctness
    // must hold even where the window formulation would be preferable.
    val wide = input.withColumn("key", col("tie")) // tie is unique-ish
    val viaTopk = NativeTopK(wide, Seq("key"), Seq(("measure", false), ("tie", true)), 1)
      .groupBy().agg(count(lit(1)), sum(col("measure"))).collect().head
    val direct = wide.dropDuplicates("key")
      .groupBy().agg(count(lit(1)), sum(col("measure"))).collect().head
    assert(viaTopk.getLong(0) === direct.getLong(0))
  }
}
