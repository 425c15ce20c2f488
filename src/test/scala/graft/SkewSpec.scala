package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two skew defenses a 100 TB join/agg relies on:
  *
  *  1. AQE skew-join splitting — with thresholds lowered to make the
  *     local corpus "skewed", OptimizeSkewedJoin must rewrite the
  *     sort-merge join to read the hot partition in slices
  *     (isSkewJoin=true), proving the conf-only path needs no query
  *     rewrite at real scale.
  *  2. Manual salting (q75's two-stage aggregation) — correctness is
  *     oracle-checked by the driver; here we pin the plan property that
  *     the first-stage aggregation keys include the salt, so the hot
  *     key's rows spread over all partitions before the tiny second
  *     stage.
  */
class SkewSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestSession._

  test("AQE splits a skewed sort-merge join when thresholds demand it") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // force SMJ: no broadcasting either side.
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // 90% of fact rows share one key — the canonical hot-key join.
      val fact = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000)
          .as("k"),
        col("id").as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, "k").groupBy(col("name"))
        .agg(count(lit(1)).as("n"))
      joined.collect()

      val smjs = collect(joined.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
      }
      assert(smjs.nonEmpty, "expected a sort-merge join")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the join skew-split:\n${joined.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted aggregation spreads the hot key across partitions") {
    val df = SparkEntry.queries("q75_salted_agg")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("salt"),
      s"first-stage aggregate does not key on the salt:\n$plan")
    df.collect()
  }
}
