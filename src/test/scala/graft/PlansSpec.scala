package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native DotProduct expression: registered through
  * GraftExtensions, bit-identical to the zip_with/aggregate fold it
  * replaces (both strict left-to-right), null-propagating, and usable
  * from SQL.
  */
class PlansSpec extends AnyFunSuite {
  import SparkTestSession._

  test("graft_dot is registered by GraftExtensions") {
    assert(spark.catalog.functionExists("graft_dot"))
  }

  test("graft_dot equals the zip_with/aggregate fold bit-exactly") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
    val b = e.select(col("vec_id").as("vid2"), col("a").as("b"))
    val pairs = e.crossJoin(b).filter(col("vec_id") < col("vid2"))
      .withColumn("d_native", call_function("graft_dot", col("a"), col("b")))
      .withColumn("d_hof",
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v))
    assert(pairs.filter(col("d_native") =!= col("d_hof")).count() === 0)
    assert(pairs.count() > 0)
  }

  test("graft_dot from SQL, null propagation, prefix semantics") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS dn,
        |       graft_dot(array(1.0D, 2.0D), array(10.0D)) AS dp""".stripMargin)
      .collect().head
    assert(r.getDouble(0) === 32.0)
    assert(r.isNullAt(1))
    assert(r.getDouble(2) === 10.0)
  }
}
