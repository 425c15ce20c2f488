package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: writing both join sides bucketed by the
  * join key lets Spark plan a SortMergeJoin with ZERO Exchange — at
  * 100 TB this is the difference between a join that reshuffles every
  * row and one that streams co-located buckets. Bucketed tables need
  * the session catalog (saveAsTable), so this lives in a spec rather
  * than a `queries` entry — query lambdas must not mutate shared
  * catalog state (the round-1 q38 temp-view lesson).
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed-by-key tables join without a shuffle and match plain join") {
    val n = 8
    Tables.orders(spark, sf)
      .write.mode("overwrite")
      .bucketBy(n, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables.customer(spark, sf)
      .write.mode("overwrite")
      .bucketBy(n, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    try {
      // disable broadcast so the co-location (not a broadcast) is what
      // removes the shuffle.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")

      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
