package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins runtime bloom-filter pushdown (InjectRuntimeFilter), the third
  * leg of the 100 TB join toolkit next to AQE skew-split (SkewSpec) and
  * broadcast/bucketing (PlanShapeSpec): when a shuffle join has a
  * selective filter on one side, Catalyst builds a bloom filter from
  * that side and pushes a `might_contain` probe into the OTHER side's
  * scan, so the 100 TB fact table drops non-joining rows before the
  * shuffle instead of after it.
  *
  * The size thresholds that gate injection (application side >= 10 GB
  * by default) are lowered here because the local corpus is tiny — at
  * real scale the defaults fire on their own; the point pinned is that
  * the conf-only path works with no query rewrite.
  */
class BloomJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("selective dim filter injects a bloom probe into the fact side") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: a broadcast join already semi-filters.
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val fact = Tables.lineitem(spark, sf)
      val dim = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === first_priority(spark))
      val q = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("qty"))

      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom-filter probe in the optimized plan:\n$optimized")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** Any priority value present in the corpus (kept data-independent). */
  private def first_priority(spark: org.apache.spark.sql.SparkSession): String =
    Tables.orders(spark, sf).select("o_orderpriority")
      .orderBy("o_orderpriority").limit(1).collect()(0).getString(0)
}
