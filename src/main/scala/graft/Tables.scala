package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver corpus (TESTDATA.md): one parquet file per table
  * under `sfDir`. Reads are plain `spark.read.parquet` so Catalyst gets
  * full pushdown (PushedFilters / ReadSchema) into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** events.ts has shipped as two different parquet types across driver
    * corpus generations, so the loader adapts by the SCHEMA it finds,
    * normalizing both to session-zoned TimestampType at µs precision —
    * the type every downstream query and oracle was verified against:
    *
    *   - TIMESTAMP(NANOS): Spark rejects it by default
    *     ([PARQUET_TYPE_ILLEGAL]); [[Session.builder]] sets
    *     `spark.sql.legacy.parquet.nanosAsLong=true`, the column arrives
    *     as LONG nanos, and exact integer division truncates to µs (ns
    *     epoch exceeds 2^53, so `/` via double would lose microseconds).
    *   - timestamp[us] (isAdjustedToUTC=false): Spark reads
    *     TIMESTAMP_NTZ; the cast to TimestampType reinterprets the same
    *     µs value in the session timezone, which is pinned to UTC — a
    *     bit-identical epoch, matching DuckDB's naive read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  private val nationEdgeCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  private val edgeCleanupHooked = java.util.concurrent.ConcurrentHashMap
    .newKeySet[org.apache.spark.SparkContext]()

  /** Drop every cached edge list, unpersisting each frame. Called
    * automatically when a SparkContext ends (so entries for stopped
    * sessions don't pin the session objects forever — ADVICE r13), and
    * available as an explicit hook for tests or for the one unsupported
    * case: regenerating the parquet under a corpus dir within a live
    * session (corpus dirs are otherwise treated as immutable per
    * session — the cache would silently serve the stale edge list).
    */
  def clearNationEdges(): Unit = {
    val it = nationEdgeCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      try e.getValue.unpersist(blocking = false)
      catch { case _: Throwable => () } // context may already be down
      it.remove()
    }
  }

  private def hookEdgeCleanup(s: SparkSession): Unit = {
    val sc = s.sparkContext
    if (edgeCleanupHooked.add(sc)) {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd)
            : Unit = {
          edgeCleanupHooked.remove(sc)
          clearNationEdges()
        }
      })
    }
  }

  /** Directed nation→nation trade pair counts — the graph tier's shared
    * corpus stage (VERDICT r12 #3). An edge src→dst with weight `cnt`
    * for every lineitem whose ordering customer sits in nation src and
    * supplying supplier in nation dst; self-loops (src == dst) are kept
    * so every consumer can filter or fold them as its algorithm needs.
    *
    * This is the ONLY corpus-sized stage of the whole graph tier
    * (lineitem⋈orders⋈customer⋈supplier → ≤|nations|² rows); before
    * round 13 nine graph queries each re-ran it independently
    * (~1.2-1.6 s apiece at sf0.1 — pure duplication at 100 TB). It is
    * now derived once per (session, sfDir) and `persist()`ed: the first
    * graph query in a suite pays the joins, every later one starts from
    * the cached bounded edge list. The cache key carries the session so
    * per-session configs (e.g. PartitionInvarianceSpec's split-file
    * session) still derive and persist their own copy under their own
    * partitioning. The frame is dimension-sized, so the persist costs
    * a few KB regardless of corpus scale.
    */
  def nationEdges(s: SparkSession, d: String): DataFrame =
    nationEdgeCache.computeIfAbsent((s, d), { _: (SparkSession, String) =>
      hookEdgeCleanup(s)
      import org.apache.spark.sql.functions.{col, count, lit}
      lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("src")),
          col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("dst")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("cnt"))
        // single-partition cache: the aggregation itself runs fully
        // parallel (map-side partials + a 32-way reduce), and only the
        // ≤|nations|² result squeezes into one block. Without this the
        // cached frame keeps its 32 shuffle partitions and — since AQE
        // leaves cached-plan output partitioning alone — every tiny
        // downstream graph stage pays 32-task scheduling and loses the
        // runtime broadcast conversions the pre-cache plans enjoyed
        // (measured: q166/q175 ~+0.5-1.0 s each at sf0.1).
        .repartition(1)
        .persist()
    })
}

/** A query module contributes named queries plus (optionally) DuckDB oracle
  * SQL per query. Keys must be unique across modules; `SparkEntry`
  * concatenates all modules.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
