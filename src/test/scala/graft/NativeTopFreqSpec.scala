package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the native Misra-Gries heavy-hitter aggregate
  * (`plans/TopFreq.scala`, SQL name `graft_topfreq`), covering both
  * regimes:
  *
  *   - EXACT (k ≥ distinct items in the group): counts equal a plain
  *     groupBy count, err_bound = 0, result independent of the input
  *     partitioning — the regime `q287_heavy_hitters`' DuckDB oracle
  *     checks on the corpus.
  *   - SKETCH (k < distinct): the Misra-Gries contract — for every
  *     emitted item `cnt ≤ true ≤ cnt + err_bound`, and every item with
  *     `true > err_bound` is present in the summary — must hold under
  *     Spark's real partial/merge schedule, which is what distinguishes
  *     a mergeable summary from a stream-only one.
  *
  * Data rides a real DataFrame each time so update → serialize →
  * merge → eval is the code path under test, not a hand-driven buffer.
  */
class NativeTopFreqSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rng = new scala.util.Random(287287L)

  private def summarize(items: Seq[String], k: Int, parts: Int)
      : (Map[String, Long], Long) = {
    import spark.implicits._
    val row = items.toDF("w").repartition(parts)
      .agg(expr(s"graft_topfreq(w, $k)").as("s"))
      .select(col("s.items").as("items"), col("s.err_bound").as("err"))
      .head()
    val counts = row.getSeq[Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (counts, row.getLong(1))
  }

  test("exact regime: counts match groupBy count, err_bound = 0, " +
      "partitioning-independent") {
    val r = rng
    val vocab = (1 to 40).map(i => s"w$i")
    val items = Seq.fill(5000)(vocab(r.nextInt(vocab.size)))
    val truth = items.groupBy(identity).map { case (w, xs) =>
      w -> xs.size.toLong
    }
    for (parts <- Seq(1, 7, 32)) {
      val (counts, err) = summarize(items, k = 64, parts = parts)
      assert(err == 0L, s"parts=$parts")
      assert(counts == truth, s"parts=$parts")
    }
  }

  test("exact regime: output order is (cnt desc, item asc) — " +
      "q287's rank contract") {
    import spark.implicits._
    val items = Seq("b", "b", "a", "a", "c", "b")
    val rows = items.toDF("w")
      .agg(expr("graft_topfreq(w, 8)").as("s"))
      .select(explode(col("s.items")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }

  test("sketch regime: Misra-Gries bound holds under real " +
      "partial/merge schedules") {
    val r = rng
    // Zipf-ish stream over 200 distinct items, summarized at k = 8:
    // decrements fire in every map task and in the final merge.
    val vocab = (1 to 200).map(i => s"t$i")
    val items = Seq.fill(8000) {
      val z = math.min(vocab.size - 1,
        (math.pow(r.nextDouble(), 3) * vocab.size).toInt)
      vocab(z)
    }
    val truth = items.groupBy(identity).map { case (w, xs) =>
      w -> xs.size.toLong
    }
    for (parts <- Seq(1, 5, 32)) {
      val (counts, err) = summarize(items, k = 8, parts = parts)
      assert(counts.size <= 8, s"parts=$parts")
      assert(err > 0L, s"parts=$parts (k < distinct must decrement)")
      counts.foreach { case (w, c) =>
        val t = truth(w)
        assert(c <= t && t <= c + err,
          s"parts=$parts item=$w cnt=$c true=$t err=$err")
      }
      truth.foreach { case (w, t) =>
        if (t > err) assert(counts.contains(w),
          s"parts=$parts frequent item $w (true=$t > err=$err) missing")
      }
    }
  }

  test("null items are ignored; k must be a positive literal") {
    import spark.implicits._
    val (counts, err) = {
      val row = Seq(Some("a"), None, Some("a"), None).toDF("w")
        .agg(expr("graft_topfreq(w, 4)").as("s"))
        .select(col("s.items").as("items"), col("s.err_bound").as("err"))
        .head()
      (row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap,
        row.getLong(1))
    }
    assert(counts == Map("a" -> 2L) && err == 0L)
    val bad = intercept[Exception] {
      Seq("a").toDF("w").agg(expr("graft_topfreq(w, 0)")).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("k >= 1"))
  }

  test("grouped aggregation: per-group summaries stay independent") {
    import spark.implicits._
    val df = Seq(
      ("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "y"), ("g2", "z")).toDF("g", "w")
    val got = df.groupBy("g").agg(expr("graft_topfreq(w, 4)").as("s"))
      .select(col("g"), explode(col("s.items")).as("e"))
      .select(col("g"), col("e.item"), col("e.cnt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("g1", "x", 2L), ("g1", "y", 1L),
      ("g2", "y", 1L), ("g2", "z", 1L)))
  }
}
