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

  test("graft_simhash equals the 64-fold HOF bit-majority formulation") {
    import org.apache.spark.sql.functions._
    assert(spark.catalog.functionExists("graft_simhash"))
    val wh = Tables.documents(spark, sf)
      .select(col("doc_id"),
        transform(array_distinct(ops.Text.words(col("text"))),
          w => xxhash64(w)).as("wh"))
    val bits = (0 until 64).map { i =>
      val tally = aggregate(col("wh"), lit(0L), (acc, h) =>
        acc + when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(tally > 0, lit(1L << i)).otherwise(lit(0L))
    }
    val cmp = wh.select(
      expr("graft_simhash(wh)").as("fast"),
      bits.reduce(_ + _).as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() == 0)
    // empty array → signature 0; null → null
    val r = spark.sql(
      """SELECT graft_simhash(CAST(array() AS ARRAY<BIGINT>)) AS e,
        |  graft_simhash(CAST(NULL AS ARRAY<BIGINT>)) AS n""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("graft_sorted_intersect equals size(array_intersect) on sorted distinct sets") {
    import org.apache.spark.sql.functions._
    assert(spark.catalog.functionExists("graft_sorted_intersect"))
    // every cross pair of real shingle sets: kernel count == builtin count
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_sort(transform(
          ops.Text.shingles3(ops.Text.words(col("text"))),
          x => xxhash64(x))).as("sh"))
      .limit(40)
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .select(
        expr("graft_sorted_intersect(a.sh, b.sh)").as("fast"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("ref"))
    assert(pairs.filter(col("fast") =!= col("ref")).count() == 0)
    // null propagation + empty sets
    val r = spark.sql(
      """SELECT graft_sorted_intersect(array(1L,2L,3L), array(2L,3L,9L)) AS c,
        |  graft_sorted_intersect(array(1L,2L), CAST(array() AS ARRAY<BIGINT>)) AS e,
        |  graft_sorted_intersect(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == 0 && r.isNullAt(2))
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

  test("graft_shingles generator equals the transform+posexplode composition") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("x", "y", "z")),
      (3L, Seq("solo", "pair")),          // shorter than n → 0 rows
      (4L, Seq.empty[String]),            // empty → 0 rows
      (5L, Seq("p", null, "q", "r")))     // null element: concat_ws skip
      .toDF("id", "ws")
    val gen = docs.select(col("id"), expr("graft_shingles(ws, 3)"))
      .orderBy(col("id"), col("pos"))
    val ref = docs
      .select(col("id"), posexplode(
        when(size(col("ws")) >= 3, transform(
          sequence(lit(1), size(col("ws")) - 2), i => concat_ws(" ",
            element_at(col("ws"), i), element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2))))
          .otherwise(array().cast("array<string>"))))
      .withColumnRenamed("col", "shingle")
      .orderBy(col("id"), col("pos"))
    assert(gen.columns.toSeq === Seq("id", "pos", "shingle"))
    assert(gen.collect().toSeq === ref.collect().toSeq)
    // null ARRAY behaves like exploding an empty array (0 rows)
    val nullArr = docs.withColumn("ws",
        when(col("id") === 1L, col("ws")))
      .select(col("id"), expr("graft_shingles(ws, 3)"))
    assert(nullArr.filter(col("id") =!= 1L).count() === 0)
    // n = 1 degenerates to posexplode of the words themselves
    val n1 = docs.filter(col("id") === 2L)
      .select(expr("graft_shingles(ws, 1)")).collect()
    assert(n1.map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((0, "x"), (1, "y"), (2, "z")))
  }

  test("graft_shingles rejects non-literal and non-positive n") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "ws")
    intercept[Exception] {
      df.select(expr("graft_shingles(ws, 0)")).collect()
    }
    intercept[Exception] {
      df.select(expr("graft_shingles(ws, cast(id as int))")).collect()
    }
  }
}
