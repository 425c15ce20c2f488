package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}

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
  * No database exists in this sandbox, so `read`/`write` are exercised
  * structurally (JdbcSpec pins the generated predicates and options);
  * against a live URL they are complete.
  */
object Jdbc {

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
}
