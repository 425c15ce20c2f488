package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-equivalence checks for the native codegen kernels against
  * their builtin/HOF reference formulations, over seeded random inputs
  * (the query suites only exercise corpus-shaped data; these reach
  * negative hashes, empty sets, disjoint/identical sets, and mixed-sign
  * doubles). Each check round-trips through a real DataFrame so the
  * CODEGEN path is what executes, not the interpreted eval. Seeds are
  * fixed — failures reproduce.
  */
class KernelPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def rng = new scala.util.Random(420042L)

  test("graft_sorted_intersect == size(array_intersect) on random sorted sets") {
    import spark.implicits._
    val r = rng
    val pairs = Seq.fill(200) {
      def set() = List.fill(r.nextInt(40))(r.nextLong() >> r.nextInt(48))
        .distinct.sorted
      (set(), set())
    } ++ Seq(
      (Nil, Nil), (Nil, List(1L)), (List(1L, 2L, 3L), List(1L, 2L, 3L)),
      (List(Long.MinValue, -1L, Long.MaxValue), List(Long.MinValue, 0L, Long.MaxValue)))
    val rows = pairs.toDF("a", "b")
      .select(expr("graft_sorted_intersect(a, b)").as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    rows.foreach(row => assert(row.getInt(0) == row.getInt(1)))
  }

  test("graft_simhash == 64-fold HOF majority on random hash arrays") {
    import spark.implicits._
    val r = rng
    val arrays = Seq.fill(120)(List.fill(r.nextInt(50))(r.nextLong())) :+
      List.empty[Long] :+ List(Long.MinValue, Long.MaxValue, -1L, 0L)
    val bits = (0 until 64).map { i =>
      val tally = aggregate(col("wh"), lit(0L), (acc, h) =>
        acc + when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(tally > 0, lit(1L << i)).otherwise(lit(0L))
    }
    val rows = arrays.toDF("wh")
      .select(expr("graft_simhash(wh)").as("fast"), bits.reduce(_ + _).as("ref"))
      .collect()
    rows.foreach(row => assert(row.getLong(0) == row.getLong(1)))
  }

  test("graft_dot == zip_with/aggregate fold on random vectors, bit-exact") {
    import spark.implicits._
    val r = rng
    val pairs = Seq.fill(120) {
      val n = r.nextInt(80)
      (List.fill(n)(r.nextGaussian() * 1e3), List.fill(n)(r.nextGaussian() * 1e-3))
    } :+ ((List.empty[Double], List.empty[Double]))
    val rows = pairs.toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("fast"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
          .as("ref"))
      .collect()
    rows.foreach(row => assert(
      java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1))))
  }

  /** Force Catalyst's interpreted expression path (the doGenCode
    * fallback every custom Expression must keep correct — it is what
    * runs when codegen compilation fails or is disabled cluster-wide).
    */
  private def withInterpreted[T](f: => T): T = {
    val conf = spark.conf
    val saved = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.wholeStage")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    conf.set("spark.sql.codegen.wholeStage", "false")
    try f finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("interpreted fallback is bit-identical to codegen for all three kernels") {
    import spark.implicits._
    val r = rng
    val rows = Seq.fill(64) {
      val n = r.nextInt(40)
      (List.fill(n)(r.nextGaussian()), List.fill(n)(r.nextGaussian()),
        List.fill(n)(r.nextLong()).distinct.sorted,
        List.fill(r.nextInt(40))(r.nextLong()).distinct.sorted)
    } :+ ((List.empty[Double], List.empty[Double], List.empty[Long], List.empty[Long]))
    val df = rows.toDF("a", "b", "sa", "sb")
    def run() = df.select(
        expr("graft_dot(a, b)"),
        expr("graft_sorted_intersect(sa, sb)"),
        expr("graft_simhash(sa)"))
      .collect()
      .map(row => (java.lang.Double.doubleToLongBits(row.getDouble(0)),
        row.getInt(1), row.getLong(2)))
      .toSeq
    val codegen = run()
    val interpreted = withInterpreted {
      // the conf must actually bite: whole-stage spans disappear.
      assert(!df.select(expr("graft_dot(a, b)"))
        .queryExecution.executedPlan.toString.contains("WholeStageCodegen"))
      run()
    }
    assert(codegen === interpreted)
  }

  test("graft_lcs == test-side DP on random sequences; edge cases") {
    import spark.implicits._
    // independent reference: full 2-D table, no rolling-row trick.
    def lcsRef(a: Seq[Long], b: Seq[Long]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val r = rng
    // small alphabet (0..4) so long common subsequences actually occur
    val pairs = Seq.fill(150) {
      (List.fill(r.nextInt(30))(r.nextInt(5).toLong),
        List.fill(r.nextInt(30))(r.nextInt(5).toLong))
    } ++ Seq(
      (Nil, Nil), (Nil, List(1L)), (List(1L, 2L, 3L), List(1L, 2L, 3L)),
      (List(1L, 2L, 3L), List(3L, 2L, 1L)),          // reversal → LCS 1
      (List(Long.MinValue, Long.MaxValue), List(Long.MaxValue, Long.MinValue)))
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"), expr("graft_lcs(a, b)").as("got"))
      .collect()
    rows.foreach { row =>
      val a = row.getSeq[Long](0)
      val b = row.getSeq[Long](1)
      assert(row.getInt(2) == lcsRef(a, b), s"lcs($a, $b)")
    }
    // null array → null (SQL convention)
    val n = Seq((Some(List(1L)), Option.empty[List[Long]])).toDF("a", "b")
      .select(expr("graft_lcs(a, b)")).collect()
    assert(n.head.isNullAt(0))
  }

  test("graft_lcs interpreted == codegen") {
    import spark.implicits._
    val r = rng
    val df = (Seq.fill(64)((List.fill(r.nextInt(25))(r.nextInt(4).toLong),
      List.fill(r.nextInt(25))(r.nextInt(4).toLong)))
      :+ ((List.empty[Long], List.empty[Long]))).toDF("a", "b")
    def run() = df.select(expr("graft_lcs(a, b)"))
      .collect().map(_.getInt(0)).toSeq
    val codegen = run()
    val interpreted = withInterpreted { run() }
    assert(codegen === interpreted)
  }

  test("graft_jaro_winkler matches DuckDB-pinned scores") {
    import spark.implicits._
    // expected values measured from DuckDB's jaro_winkler_similarity
    // (the oracle engine); 1e-12 tolerance absorbs final-polynomial
    // association order — catalog queries snap at 6 decimals anyway.
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("CRATE", "TRACE", 0.7333333333333334),  // transposition, no boost
      ("abcdefgh", "abcdwxyz", 0.6666666666666666), // jaro ≤ 0.7: no boost
      ("low", "lower", 0.9066666666666667),
      ("abcd", "badc", 0.8333333333333334),  // two transpositions
      ("abc", "abc", 1.0), ("", "abc", 0.0), ("", "", 0.0), ("a", "b", 0.0))
    val rows = cases.toDF("a", "b", "want")
      .select(expr("graft_jaro_winkler(a, b)").as("got"), col("want"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("graft_jaro_winkler interpreted == codegen, null-safe") {
    import spark.implicits._
    val r = rng
    // 4-letter alphabet makes matches/transpositions dense
    def word() = List.fill(r.nextInt(12))(('a' + r.nextInt(4)).toChar).mkString
    val df = Seq.fill(200)((word(), word())).toDF("a", "b")
    def run() = df.select(expr("graft_jaro_winkler(a, b)")).collect()
      .map(row => java.lang.Double.doubleToLongBits(row.getDouble(0))).toSeq
    val codegen = run()
    val interpreted = withInterpreted { run() }
    assert(codegen === interpreted)
    val nulls = Seq((Option("x"), Option.empty[String]),
      (Option.empty[String], Option.empty[String])).toDF("a", "b")
    assert(nulls.select(expr("graft_jaro_winkler(a, b)")).collect()
      .forall(_.isNullAt(0)))
  }
}
