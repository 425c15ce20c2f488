package graft

import graft.api.Frame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the reference-shaped Frame facade end-to-end: every method
  * a reference user calls today, over the driver corpus, checked against
  * the equivalent raw-Spark result.
  */
class FrameApiSpec extends AnyFunSuite {
  import SparkTestSession._

  private def orders = Frame(Tables.orders(spark, sf))
  private def lineitem = Frame(Tables.lineitem(spark, sf))

  test("describe profiles numeric columns in one pass, matching raw aggregates") {
    val out = lineitem.describe("l_quantity", "l_discount").df.collect()
    assert(out.map(_.getString(0)).toSeq == Seq("l_discount", "l_quantity"))
    val raw = Tables.lineitem(spark, sf)
      .agg(count(col("l_quantity")), round(avg(col("l_quantity")), 6),
        min(col("l_quantity")), max(col("l_quantity"))).collect()(0)
    val q = out(1)
    assert(q.getLong(1) == raw.getLong(0) && q.getDouble(2) == raw.getDouble(1)
      && q.getDouble(4) == raw.getDouble(2) && q.getDouble(5) == raw.getDouble(3))
    // default: every numeric column, still one job
    assert(lineitem.describe().df.count() >= 5)
  }

  test("unionByName null-fills missing columns; na helpers repair them") {
    val a = orders.select("o_orderkey", "o_totalprice")
    val b = orders.select("o_orderkey", "o_orderpriority")
    val u = a.unionByName(b)
    assert(u.df.schema.fieldNames.toSet ==
      Set("o_orderkey", "o_totalprice", "o_orderpriority"))
    assert(u.count() == 2 * orders.count())
    val filled = u.fillNa(Map("o_totalprice" -> -1.0))
    assert(filled.df.filter(col("o_totalprice").isNull).count() == 0)
    assert(u.dropNa(Seq("o_orderpriority")).count() == orders.count())
    val replaced = Frame(orders.df.select(col("o_orderstatus")))
      .replaceNa("o_orderstatus", Map("F" -> "FINAL"))
    assert(replaced.df.filter(col("o_orderstatus") === "F").count() == 0)
  }

  test("approxQuantile brackets the exact percentile; freqItems finds the hot key") {
    val qs = lineitem.approxQuantile("l_extendedprice", Seq(0.5), 0.01)
    val exact = Tables.lineitem(spark, sf)
      .agg(expr("percentile(l_extendedprice, 0.5)")).collect()(0).getDouble(0)
    // GK guarantee: rank error <= relativeError * n, so the returned
    // value sits within the [0.49, 0.51] rank window of the sorted data
    val lo = Tables.lineitem(spark, sf)
      .agg(expr("percentile(l_extendedprice, 0.48)")).collect()(0).getDouble(0)
    val hi = Tables.lineitem(spark, sf)
      .agg(expr("percentile(l_extendedprice, 0.52)")).collect()(0).getDouble(0)
    assert(qs.head >= lo && qs.head <= hi, s"${qs.head} not in [$lo, $hi] around $exact")
    val hot = lineitem.freqItems(Seq("l_returnflag"), 0.2).df.collect()(0)
      .getSeq[String](0).toSet
    assert(Set("A", "N", "R").subsetOf(hot),
      s"all three flags exceed 20% support, got $hot")
  }

  test("crosstab matches groupBy counts") {
    val ct = lineitem.crosstab("l_returnflag", "l_linestatus").df
    val viaGroup = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F").count()
    val row = ct.filter(col("l_returnflag_l_linestatus") === "A").collect()(0)
    assert(row.getLong(ct.schema.fieldIndex("F")) == viaGroup)
  }

  test("projection chain: select/drop/withColumn/rename/cast/limit") {
    val f = orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("price_k", col("o_totalprice") / 1000)
      .withColumnRenamed("o_custkey", "cust")
      .cast("o_orderkey", LongType)
      .drop("o_totalprice")
      .limit(10)
    assert(f.df.columns.toSeq === Seq("o_orderkey", "cust", "price_k"))
    assert(f.count() === 10)
  }

  test("withId yields unique non-negative ids") {
    val ids = orders.withId().df.select("id").collect().map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    assert(ids.forall(_ >= 0))
  }

  test("filter + sort match raw Spark") {
    val viaApi = orders.filter(col("o_totalprice") > 300000)
      .sort(("o_totalprice", true), ("o_orderkey", false))
      .df.select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val raw = Tables.orders(spark, sf).filter(col("o_totalprice") > 300000)
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(viaApi === raw)
  }

  test("multi-key join with JoinCriteria pairs") {
    val a = lineitem.select("l_orderkey", "l_linenumber", "l_quantity")
    val b = lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumnRenamed("l_orderkey", "rk").withColumnRenamed("l_linenumber", "rl")
    val j = a.join(b, Seq("l_orderkey" -> "rk", "l_linenumber" -> "rl"))
    val li = Tables.lineitem(spark, sf)
    val raw = li.select(col("l_orderkey").as("ak"), col("l_linenumber").as("al"))
      .join(li.select(col("l_orderkey").as("rk"), col("l_linenumber").as("rl")),
        col("ak") === col("rk") && col("al") === col("rl"))
    assert(j.count() === raw.count())
  }

  test("aggregate(groups, col->fn pairs) derives reference-style names") {
    val g = orders.aggregate(Seq("o_orderstatus"),
      Seq("o_totalprice" -> "sum", "o_orderkey" -> "count"))
    assert(g.df.columns.toSeq ===
      Seq("o_orderstatus", "sum_o_totalprice", "count_o_orderkey"))
    assert(g.count() > 0)
  }

  test("uniques and hist") {
    assert(orders.uniques("o_orderstatus").count() === 3)
    val h = orders.hist("o_totalprice", 10)
    assert(h.df.columns.toSeq === Seq("bucket", "n"))
    assert(h.df.agg(sum("n")).collect().head.getLong(0) === orders.count())
  }

  test("hist handles constant columns and excludes nulls") {
    import spark.implicits._
    val const = Frame(Seq(42.0, 42.0, 42.0).toDF("x")).hist("x", 10).df.collect()
    assert(const.length === 1 && const.head.getInt(0) === 0 &&
      const.head.getLong(1) === 3L)
    val withNulls = Frame(Seq(Some(1.0), None, Some(2.0), None).toDF("x"))
      .hist("x", 4).df
    assert(withNulls.agg(sum("n")).collect().head.getLong(0) === 2L)
  }

  test("set ops compose") {
    val hi = orders.filter(col("o_totalprice") > 300000).select("o_orderkey")
    val lo = orders.filter(col("o_totalprice") <= 300000).select("o_orderkey")
    assert(hi.union(lo).count() === orders.count())
    assert(hi.intersect(lo).count() === 0)
    assert(hi.except(lo).count() === hi.count())
  }

  test("topK routes through the native per-key operator") {
    import org.apache.spark.sql.expressions.Window
    val f = lineitem.select("l_suppkey", "l_quantity", "l_orderkey")
      .topK(Seq("l_suppkey"), Seq(("l_quantity", false), ("l_orderkey", true)), 3)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_quantity").desc, col("l_orderkey"))
    val expected = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_quantity"), col("l_orderkey"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
    assert(f.df.count() === expected.count())
    assert(f.df.except(expected).count() === 0)
    val plan = f.df.queryExecution.executedPlan.toString
    assert(plan.contains("PerKeyTopK"), s"native operator missing from plan:\n$plan")
  }

  test("observed metrics are computed as a side effect of the action") {
    val (f, obs) = orders.observed("order_stats",
      "n" -> count(lit(1)),
      "null_clerks" -> count_if(col("o_orderpriority").isNull),
      "max_price" -> max(col("o_totalprice")))
    val n = f.df.count() // the action that also evaluates the metrics
    val m = obs.get
    assert(m("n") === n)
    assert(m("null_clerks") === 0L)
    assert(m("max_price") === Tables.orders(spark, sf)
      .agg(max(col("o_totalprice"))).collect().head.getDouble(0))
  }

  test("seeded sampling is deterministic and proportional") {
    val docs = Frame(Tables.documents(spark, sf))
    val a = docs.sample(0.3, seed = 7).df.select("doc_id").collect().toSeq
    val b = docs.sample(0.3, seed = 7).df.select("doc_id").collect().toSeq
    assert(a === b) // same seed + partitioning ⇒ identical rows
    val n = docs.count().toDouble
    assert(a.size > n * 0.1 && a.size < n * 0.5, s"sample size ${a.size} of $n")
    // stratified: drop every 'de' row, keep roughly all 'en'.
    val strat = docs.sampleStratified("lang",
      Map[Any, Double]("en" -> 1.0, "de" -> 0.0), seed = 7).df
    assert(strat.filter(col("lang") === "de").count() === 0)
    assert(strat.filter(col("lang") === "en").count() ===
      Tables.documents(spark, sf).filter(col("lang") === "en").count())
    // SQL front door: TABLESAMPLE parses and bounds the scan.
    val ts = spark.sql(
      s"SELECT count(*) AS n FROM parquet.`$sf/documents.parquet` TABLESAMPLE (50 PERCENT)")
      .collect().head.getLong(0)
    assert(ts > 0 && ts <= n)
  }

  test("csv/json/parquet sinks round-trip through the matching sources") {
    val base = "target/tmp/frame_api"
    val src = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    src.toCsv(s"$base/csv", header = true, delimiter = ";")
    src.toJson(s"$base/json")
    src.toParquet(s"$base/parquet")
    assert(Frame.fromCsv(spark, s"$base/csv", delimiter = ";").count() === src.count())
    assert(Frame.fromJson(spark, s"$base/json").count() === src.count())
    assert(Frame.fromParquet(spark, s"$base/parquet").count() === src.count())
  }

  // ——— LLM-pipeline facade parity (round 12, VERDICT r11 #5): each
  // facade method must produce byte-identical rows to the oracle-pinned
  // catalog query it delegates to — the facade is a rename, never a
  // second implementation that can drift.

  private def docs = Frame(Tables.documents(spark, sf))

  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.sorted.sameElements(b.columns.sorted),
      s"schema drift: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val cols = a.columns.sorted.map(col).toSeq
    assert(a.select(cols: _*).except(b.select(cols: _*)).isEmpty
      && b.select(cols: _*).except(a.select(cols: _*)).isEmpty,
      "row drift between facade and catalog query")
  }

  test("dedupExact facade matches q60") {
    val q = SparkEntry.queries("q60_dedup_exact")(spark, sf)
    sameRows(docs.dedupExact().df.select(
      "doc_id", "lang", "n_chars", "content_hash", "n_copies"), q)
    // the facade keeps EVERY input column (q60 is the op + projection)
    assert(docs.dedupExact().df.columns.contains("text"))
  }

  test("dedupMinhashLsh facade matches q61") {
    sameRows(docs.dedupMinhashLsh(80).df,
      SparkEntry.queries("q61_dedup_minhash")(spark, sf))
    // threshold is honored: raising it can only shrink the pair set
    assert(docs.dedupMinhashLsh(95).count() <= docs.dedupMinhashLsh(80).count())
  }

  test("topFreq facade matches q287") {
    val words = docs.df
      .select(col("lang"), explode(graft.ops.Text.words(col("text")))
        .as("word"))
      .filter(col("word") =!= "")
    sameRows(Frame(words).topFreq("word", 64, Seq("lang")).df,
      SparkEntry.queries("q287_heavy_hitters")(spark, sf))
  }

  test("temperatureMix facade matches q233; general alpha renormalizes") {
    sameRows(docs.temperatureMix(0.5).df,
      SparkEntry.queries("q233_temperature_mix")(spark, sf))
    // α = 1 is the identity mix: sampled share == raw share (±snap)
    val id = docs.temperatureMix(1.0).df.collect()
    id.foreach { r =>
      assert(math.abs(r.getAs[Double]("sampled_share")
        - r.getAs[Double]("raw_share")) < 1e-5)
    }
    // shares always renormalize to 1 for any α
    val s03 = docs.temperatureMix(0.3).df
      .agg(sum(col("sampled_share"))).collect()(0).getDouble(0)
    assert(math.abs(s03 - 1.0) < 1e-4)
  }

  test("curation facades match their catalog queries") {
    sameRows(docs.hashSplit().df.orderBy("split"),
      SparkEntry.queries("q100_hash_split")(spark, sf))
    sameRows(docs.weightedMix().df.orderBy("source"),
      SparkEntry.queries("q104_weighted_mix")(spark, sf))
  }

  test("redact/tfidfTopK/chunkDocs facades run over the corpus") {
    assert(docs.redact().count() > 0)
    assert(docs.tfidfTopK().count() > 0)
    assert(docs.chunkDocs().count() > 0)
  }

  test("globalRank/ntileExact facades match the global window forms") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("n_chars"), col("doc_id"))
    val slim = docs.df.select(col("doc_id"), col("n_chars"))
    sameRows(
      Frame(slim).globalRank(col("n_chars"), col("doc_id")).df
        .select(col("doc_id"), col("rk")),
      slim.withColumn("rk", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("rk")))
    sameRows(
      Frame(slim).ntileExact(10, col("n_chars"), col("doc_id")).df
        .select(col("doc_id"), col("tile")),
      slim.withColumn("tile", ntile(10).over(w).cast("long"))
        .select(col("doc_id"), col("tile")))
  }

  test("weightedSample/quantileNormalize facades match their queries") {
    sameRows(docs.weightedSample(20).df,
      SparkEntry.queries("q343_weighted_sample")(spark, sf))
    sameRows(docs.quantileNormalize().df,
      SparkEntry.queries("q344_quantile_norm")(spark, sf))
    // a smaller k is a strict prefix of the k=20 sample
    val k5 = docs.weightedSample(5).df.collect().map(_.getLong(0))
    val k20 = docs.weightedSample(20).df.collect().map(_.getLong(0))
    assert(k20.take(5).sameElements(k5))
  }

  // ——— round 13 (VERDICT r12 #5): the stats sub-surface ———

  private def eventsHalved = Frame(Tables.events(spark, sf)
    .select(col("event_type"), col("value"),
      (to_date(col("ts")) <= lit("2024-01-15").cast("date")).as("is_a")))

  test("stats.ksDrift and stats.psiDrift facades match q224/q225") {
    sameRows(eventsHalved.stats.ksDrift("event_type", "value", "is_a").df,
      SparkEntry.queries("q224_ks_drift")(spark, sf))
    sameRows(eventsHalved.stats
        .psiDrift("event_type", "value", "is_a", 50.0, 9).df,
      SparkEntry.queries("q225_psi_drift")(spark, sf))
  }

  test("stats.survival facade matches q381 modulo the corpus column name") {
    val users = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_day"),
        max(to_date(col("ts"))).as("last_day"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("first_purchase"))
      .select(
        when(col("first_purchase").isNotNull,
          datediff(col("first_purchase"), col("first_day")))
          .otherwise(datediff(col("last_day"), col("first_day")))
          .cast("long").as("t"),
        col("first_purchase").isNotNull.as("purchased"))
    sameRows(Frame(users).stats.survival("t", "purchased", 7L).df
        .withColumnRenamed("rmst_days", "rmst_purchase_free_days"),
      SparkEntry.queries("q381_rmst")(spark, sf))
  }

  test("stats.capability facade matches q382 modulo the corpus column name") {
    sameRows(lineitem.stats.capability("l_quantity", 1L, 50L).df
        .withColumnRenamed("mean_x", "mean_qty"),
      SparkEntry.queries("q382_process_capability")(spark, sf))
  }
}
