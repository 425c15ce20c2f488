package graft

import java.nio.file.Paths
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input guards (ADVICE r11): divide-by-zero strata where
  * Spark's Divide yields NULL but an IEEE engine (the DuckDB oracle)
  * yields NaN/inf — invisible on TPC-H-shaped corpora, fatal the day a
  * real corpus ships a single-doc source or an all-tied value column,
  * because one NaN poisons every global normalizer it flows into.
  * These fixtures force each degenerate branch and pin the NULL.
  */
class DegenerateInputSpec extends AnyFunSuite {
  import SparkTestSession._

  // one scratch sfDir with: documents carrying a single-doc stratum,
  // events carrying (a) one constant value → Kruskal-Wallis tie_c = 0
  // and (b) one event_type → Cramér df_star = 0.
  private lazy val dir: String = {
    import spark.implicits._
    val d = Paths.get("target/tmp/degenerate").toAbsolutePath.toString
    Seq(
      (1L, "aa bb", "en", "solo_source", 5L),
      (2L, "cc dd", "en", "big_source", 5L),
      (3L, "ee ff gg", "en", "big_source", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "click", 7.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-02 00:00:00"), 11L, "click", 7.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-03 00:00:00"), 12L, "click", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q303: a single-doc stratum gets NULL sd and is excluded from shares") {
    val rows = SparkEntry.queries("q303_neyman_allocation")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val solo = rows("solo_source")
    assert(solo.isNullAt(solo.fieldIndex("sd_chars")),
      "n_docs = 1 must yield NULL sd, not NaN")
    assert(solo.isNullAt(solo.fieldIndex("alloc_share")))
    // the surviving stratum absorbs the whole budget — the NULL did
    // NOT poison the global normalizer.
    val big = rows("big_source")
    assert(big.getAs[Double]("alloc_share") == 1.0)
    assert(big.getAs[Long]("alloc_n") == 10000L)
  }

  test("q290: an all-tied value column yields NULL h_adj (tie_c = 0)") {
    val rows = SparkEntry.queries("q290_kruskal_wallis")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    // every row shares one value → tie correction degenerates to 0;
    // the adjusted statistic must be NULL, never Infinity/NaN.
    assert(r.isNullAt(r.fieldIndex("h_adj")))
    assert(r.getAs[Double]("h_stat") == 0.0)
  }

  test("q292: a single event_type yields NULL v_cramer (df_star = 0)") {
    val rows = SparkEntry.queries("q292_cramers_v")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("df_star") == 0L)
    assert(r.isNullAt(r.fieldIndex("v_cramer")))
  }
}
