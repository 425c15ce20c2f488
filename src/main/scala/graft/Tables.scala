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
}

/** A query module contributes named queries plus (optionally) DuckDB oracle
  * SQL per query. Keys must be unique across modules; `SparkEntry`
  * concatenates all modules.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
