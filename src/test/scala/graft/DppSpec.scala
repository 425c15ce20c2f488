package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins dynamic partition pruning (DPP): when a hive-partitioned fact
  * table joins a dimension carrying a selective filter on the partition
  * column, the fact scan must receive a runtime `dynamicpruning`
  * partition filter — at 100 TB this skips whole partition directories
  * whose keys the dimension filter eliminated, instead of scanning and
  * discarding. Complements BloomJoinSpec (row-level runtime filter) and
  * the static pruning pinned by SourcesSpec for q84.
  */
class DppSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dim filter dynamically prunes the partitioned fact scan") {
    val dir = "target/tmp/dpp/orders_by_status"
    Tables.orders(spark, sf)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled",
      // the reuse-broadcast heuristic gates DPP on estimated benefit;
      // force the subquery path so the tiny local corpus still prunes.
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")

      val fact = spark.read.parquet(dir)
      // the dim filter must hit a NON-join column AND the dim must come
      // from storage: a key filter (or any expression of the key, even
      // via when()) propagates statically through constraints, and a
      // filtered LocalRelation constant-folds — both leave nothing for
      // DPP to do. An on-disk dim with an independent attribute is the
      // real shape: "dates dim filtered by fiscal quarter, fact
      // partitioned by date id".
      val dimDir = "target/tmp/dpp/status_dim"
      import spark.implicits._
      Seq(("F", "done"), ("O", "open"), ("P", "open"))
        .toDF("o_orderstatus", "cat")
        .write.mode("overwrite").parquet(dimDir)
      val dim = spark.read.parquet(dimDir).filter(col("cat") === "done")
      val q = fact.join(dim, Seq("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))

      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning"),
        s"fact scan should carry a dynamicpruning partition filter:\n$p")

      val expected = Tables.orders(spark, sf)
        .filter(col("o_orderstatus") === "F").count()
      assert(q.collect()(0).getLong(0) == expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
