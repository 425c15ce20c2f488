package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zero-row robustness: at 100 TB a filter, a partition, or a day's
  * delta is routinely EMPTY, and every operator must pass empties
  * through with schema intact instead of throwing — an empty-input
  * crash in one stage kills the whole pipeline run.
  */
class EmptyInputSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val empty = Tables.lineitem(spark, sf).filter(lit(false))
  private lazy val li = Tables.lineitem(spark, sf)

  test("grouped agg on empty input yields zero groups; global agg one row") {
    assert(empty.groupBy("l_returnflag").agg(sum("l_quantity")).count() == 0)
    val g = empty.agg(count(lit(1)).as("n"), sum("l_quantity").as("s")).collect()
    assert(g.length == 1 && g(0).getLong(0) == 0L && g(0).isNullAt(1))
  }

  test("sort/limit/distinct/window pass empties through with schema intact") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("l_orderkey")
    val out = empty
      .orderBy("l_orderkey").limit(10).distinct()
      .withColumn("rn", row_number().over(w))
    assert(out.count() == 0)
    assert(out.schema.fieldNames.contains("rn"))
  }

  test("joins with an empty side keep outer semantics") {
    val dim = li.select("l_orderkey").distinct().limit(5)
    assert(empty.join(dim, Seq("l_orderkey")).count() == 0)
    assert(empty.join(dim, Seq("l_orderkey"), "right").count() == 5)
    assert(dim.join(empty.select("l_orderkey"),
      Seq("l_orderkey"), "left_anti").count() == 5)
  }

  test("native per-key top-k returns empty on empty input") {
    val out = api.Frame(empty)
      .topK(Seq("l_returnflag"), Seq(("l_quantity", false)), 3)
    assert(out.count() == 0)
  }

  test("Frame.hist and uniques tolerate empty input") {
    assert(api.Frame(empty).uniques("l_returnflag").count() == 0)
    assert(api.Frame(empty).hist("l_quantity", 5).count() == 0)
  }

  test("set ops with one empty side") {
    val keys = li.select("l_orderkey").limit(3)
    val none = empty.select("l_orderkey")
    assert(keys.union(none).count() == 3)
    assert(keys.intersect(none).count() == 0)
    assert(keys.except(none).count() == 3)
  }
}
