package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}
import graft.{ops => o}
import graft.{sources => src}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by the modules under graft.queries (relational
  * core, joins, aggregates, windows, scalar/array functions) and graft.ops
  * (LLM-pipeline operators); each module pairs every query with DuckDB
  * oracle SQL where the semantics are ANSI-expressible.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    q.Relational,
    q.Joins,
    q.Aggregates,
    q.Windows,
    q.ScalarMath,
    q.Strings,
    q.Arrays,
    q.Temporal,
    q.Profile,
    q.Graph,
    q.Tpch,
    o.Dedup,
    o.Similarity,
    o.TextAnalysis,
    o.Multimodal,
    o.Curation,
    o.CorpusSignals,
    o.TopKPerKey,
    src.IOQueries,
    src.Jdbc)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
