package graft

import org.apache.spark.sql.SparkSession

/** One place for session construction so every entrypoint (Bench, Verify,
  * tests) runs with identical semantics-affecting conf:
  *
  *   - `spark.sql.legacy.parquet.nanosAsLong` — events.ts is parquet
  *     TIMESTAMP(NANOS); Spark rejects it by default, the legacy flag maps
  *     it to LONG which [[Tables.events]] converts exactly. Set here at
  *     build time, never mutated inside a query (shared-session hygiene).
  *   - UTC session timezone — the DuckDB oracle compares timestamps in
  *     UTC.
  *   - shuffle partitions = cores — local[N] has no reason for 200
  *     partitions; on a real cluster this is sized to executors × cores.
  *   - AQE on (default in Spark 4, pinned explicitly): runtime coalescing
  *     of small shuffle partitions + skew-join splitting are the 100 TB
  *     safety nets for the join/agg queries.
  */
object Session {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
}
