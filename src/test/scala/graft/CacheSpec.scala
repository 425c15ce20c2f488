package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Pins the intermediate-reuse primitives an iterative 100 TB pipeline
  * leans on (the dedup cluster-closure loop in ops/Dedup.scala uses
  * persist() every round):
  *
  *  - persist(): downstream plans must read the materialized
  *    InMemoryTableScan, not recompute the upstream aggregation — at
  *    scale the difference is re-shuffling the corpus per iteration.
  *  - localCheckpoint(): truncates lineage to the materialized RDD, the
  *    defense against the plan itself growing with every loop round
  *    (persist caches data but keeps the logical plan growing).
  */
class CacheSpec extends AnyFunSuite {
  import SparkTestSession._

  test("persisted intermediate serves downstream from InMemoryTableScan") {
    val base = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"))
    val cached = base.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      cached.count()
      val downstream = cached.groupBy(col("l_returnflag"))
        .agg(sum(col("n")).as("n"), min(col("lo")).as("lo"),
          max(col("hi")).as("hi"))
        .orderBy(col("l_returnflag"))
      val p = downstream.queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"),
        s"downstream should read the cache:\n$p")
      val uncached = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("lo"),
          max(col("l_quantity")).as("hi"))
        .orderBy(col("l_returnflag"))
      assert(downstream.collect().toSeq == uncached.collect().toSeq)
    } finally cached.unpersist()
  }

  test("localCheckpoint truncates lineage to the materialized RDD") {
    val df = Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(7)) === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val cp = df.localCheckpoint()
    val logical = cp.queryExecution.optimizedPlan.toString
    assert(logical.contains("LogicalRDD"),
      s"checkpoint should cut the plan to a scan:\n$logical")
    assert(cp.count() == df.count())
  }
}
