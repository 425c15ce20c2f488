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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by default
    * ([PARQUET_TYPE_ILLEGAL]). Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` at build time (see
    * [[Session.builder]]) — the loader no longer mutates shared conf. The
    * long nanos are converted with exact integer division (ns epoch
    * exceeds 2^53, so `/` via double would lose microseconds); DuckDB
    * reads the same column as µs TIMESTAMP, so both engines compare at
    * identical precision.
    */
  def events(s: SparkSession, d: String): DataFrame =
    apply(s, d, "events").withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
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
