package graft.sources

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC source/sink surface (SURVEY.md §2.1) mirroring the reference's
  * Postgres subsystem — its largest (~1,200 LoC): table read
  * (io/sql/postgres/reader.rs:57-82), arbitrary-query read
  * (reader.rs:84-116), the limit/offset-paged `PostgresReadIterator`
  * (reader.rs:118-200), and schema-driven writes (writer.rs:15-159).
  *
  * On Spark all of it collapses into the built-in JDBC DataSource; what
  * this module owns is the option plumbing — in particular partitioned
  * reads, the scale-critical piece: `PartitionSpec` reproduces Spark's
  * stride semantics (JDBCRelation.columnPartition) so reads fan out over
  * executors exactly like the reference's row-paged iterator, but
  * push-down-driven instead of OFFSET-driven (OFFSET n forces the
  * database to re-scan n rows per page — the reference pays O(n²) total;
  * range predicates on an indexed column do not).
  *
  * Executed live against embedded Derby (on Spark's own classpath):
  * q93 writes a table through the JDBC sink, reads it back through a
  * stride-partitioned JDBC scan built from `partitionPredicates`, and
  * oracle-verifies the round-trip against the parquet original.
  * JdbcSpec additionally pins the generated predicates/options and that
  * both partitioned-read paths (predicate array vs. Spark's
  * lower/upper/num options) agree row-for-row.
  */
object Jdbc extends QueryModule {

  /** Partitioned-read spec: the same four knobs as the Spark JDBC source
    * (and the reference's iterator batch config, io/sql/postgres/mod.rs:14-22).
    */
  final case class PartitionSpec(
      column: String, lowerBound: Long, upperBound: Long, numPartitions: Int)

  /** WHERE clauses that tile `[lowerBound, upperBound)` into
    * `numPartitions` contiguous ranges — first clause absorbs NULLs and
    * everything below the lower bound, last absorbs everything above, so
    * the union is always the full table regardless of bound accuracy.
    */
  def partitionPredicates(p: PartitionSpec): Seq[String] = {
    require(p.numPartitions >= 1, "numPartitions must be >= 1")
    require(p.upperBound > p.lowerBound, "upperBound must exceed lowerBound")
    val n = math.min(p.numPartitions.toLong, p.upperBound - p.lowerBound).toInt
    if (n == 1) return Seq("1=1")
    val stride = (p.upperBound - p.lowerBound) / n
    (0 until n).map { i =>
      val lo = p.lowerBound + i * stride
      val hi = p.lowerBound + (i + 1) * stride
      if (i == 0) s"${p.column} < $hi OR ${p.column} IS NULL"
      else if (i == n - 1) s"${p.column} >= $lo"
      else s"${p.column} >= $lo AND ${p.column} < $hi"
    }
  }

  /** Reader options for a table or pushed-down query read. Mirrors the
    * reference's two read paths (read_table / read_query) plus
    * partitioned fan-out.
    */
  def readerOptions(
      url: String,
      tableOrQuery: Either[String, String],
      user: String,
      password: String,
      partitioning: Option[PartitionSpec] = None,
      fetchSize: Int = 10000): Map[String, String] = {
    val base = Map(
      "url" -> url,
      "user" -> user,
      "password" -> password,
      "fetchsize" -> fetchSize.toString)
    val src = tableOrQuery match {
      case Left(table) => Map("dbtable" -> table)
      case Right(query) => Map("query" -> query)
    }
    val part = partitioning match {
      case Some(p) =>
        require(tableOrQuery.isLeft,
          "partitioned reads require dbtable (Spark JDBC restriction)")
        Map(
          "partitionColumn" -> p.column,
          "lowerBound" -> p.lowerBound.toString,
          "upperBound" -> p.upperBound.toString,
          "numPartitions" -> p.numPartitions.toString)
      case None => Map.empty[String, String]
    }
    base ++ src ++ part
  }

  private def configure(r: DataFrameReader, opts: Map[String, String]): DataFrameReader =
    opts.foldLeft(r.format("jdbc")) { case (acc, (k, v)) => acc.option(k, v) }

  /** Live read — DataFrame is lazy; execution needs a reachable URL. */
  def read(spark: SparkSession, opts: Map[String, String]): DataFrame =
    configure(spark.read, opts).load()

  /** Live write, `overwrite=true` ≈ the reference's DROP+CREATE path
    * (writer.rs:15-39).
    */
  def write(df: DataFrame, url: String, table: String,
            user: String, password: String, overwrite: Boolean): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .save()

  private val EmbeddedDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** In-memory embedded-Derby URL, one database per sf dir so the
    * sf0.001 test runs and sf0.01 verify runs never share state.
    * Derby's log goes under target/tmp (the sandbox forbids cwd spam).
    */
  def derbyUrl(d: String): String = {
    System.setProperty("derby.system.home", "target/tmp/derby")
    s"jdbc:derby:memory:graft_${d.replaceAll("[^A-Za-z0-9.]", "_")};create=true"
  }

  /** Stride-partitioned read executing `partitionPredicates` — each
    * predicate becomes one Spark input partition fetching one key range
    * over its own connection, the executor-parallel read shape that
    * replaces the reference's OFFSET-paged single-connection iterator.
    */
  def readPartitioned(s: SparkSession, url: String, table: String,
                      spec: PartitionSpec): DataFrame = {
    val props = new java.util.Properties()
    props.setProperty("driver", EmbeddedDriver)
    s.read.jdbc(url, table, partitionPredicates(spec).toArray, props)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Live JDBC round-trip (the reference's Postgres read/write paths,
    // reader.rs:57-116 + writer.rs:15-159, executed on embedded Derby):
    // DataFrame -> JDBC sink (overwrite = DROP+CREATE) -> partitioned
    // JDBC scan via the stride predicates -> oracle vs the parquet
    // original, so any type-mapping or quoting corruption in either
    // direction breaks the hash. Bounds are deliberately inexact
    // (1..10k regardless of sf): the predicate set must still cover
    // the whole table via its open-ended first/last clauses.
    // NB the quoted partition column: Spark's JDBC writer quotes column
    // names on CREATE TABLE (preserving lowercase), so an unquoted
    // predicate column would case-fold to C_CUSTKEY and miss.
    "q93_jdbc_roundtrip" -> ((s, d) => {
      val url = derbyUrl(d)
      write(Tables.customer(s, d), url, "graft_customer", "app", "app",
        overwrite = true)
      readPartitioned(s, url, "graft_customer",
        PartitionSpec("\"c_custkey\"", 1L, 10001L, 8))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q93_jdbc_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
