package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core — scans, projections, column ops, filters, sorts,
  * limits, set operations (SURVEY.md §2.2, §2.3, §2.5, §2.8, and the
  * flagship aggregation slice of §7.2 step 1).
  *
  * Reference capabilities covered: select/drop (`dataframe.rs:258-337`),
  * with_column (`dataframe.rs:97-113`), with_column_renamed
  * (`dataframe.rs:116-124`), with_id (`dataframe.rs:234-249`), cast
  * (`evaluation.rs:349-368`), limit (`dataframe.rs:166-175`), filter
  * (`dataframe.rs:178-189`, typed — not the reference's f64-cast shortcut),
  * sort (`dataframe.rs:194-214`, with explicit nulls ordering), intersect
  * (`dataframe.rs:251-253`), plus union/except for completeness.
  *
  * All queries order by a unique key so Spark and the DuckDB oracle emit
  * identical row order; double aggregates are rounded to absorb
  * summation-order ulp noise.
  */
object Relational extends QueryModule {

  private def ts(s: String) = to_timestamp(lit(s))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: TPC-H Q1-style pricing summary. Scan → filter (pushed to
    // parquet) → partial+final hash agg → sort. At 100 TB this is one
    // shuffle of ~|groups| rows; group cardinality is tiny (R/A/N × O/F).
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_select" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q03_drop" -> ((s, d) =>
      Tables.orders(s, d)
        .drop("o_totalprice", "o_orderdate")
        .orderBy(col("o_orderkey"))),

    // with_column: append a computed column AND overwrite an existing one
    // by name (reference overwrite semantics, dataframe.rs:100-104).
    "q04_with_column" -> ((s, d) =>
      Tables.lineitem(s, d)
        .withColumn("disc_price", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .withColumn("l_tax", col("l_tax") * lit(100)) // overwrite by name
        .select(col("l_orderkey"), col("l_linenumber"), col("disc_price"), col("l_tax"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q05_rename" -> ((s, d) =>
      Tables.region(s, d)
        .withColumnRenamed("r_regionkey", "region_id")
        .withColumnRenamed("r_name", "region_name")
        .orderBy(col("region_id"))),

    // with_id: monotonically_increasing_id is partition-dependent, so the
    // verifiable contract is uniqueness + non-negativity, not exact values
    // (SURVEY.md §7.3 risk register).
    "q06_with_id" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"))
        .withColumn("row_id", monotonically_increasing_id())
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("row_id")).as("n_distinct"),
          (min(col("row_id")) >= 0).as("ids_nonneg"))),

    // narrow-sort-then-derive (the q50 §2.3 shape): the range exchange
    // carries the 4 source columns, not the widened casts (key_str
    // alone re-encodes every bigint as a string before the shuffle).
    "q07_cast" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .select(
          col("l_orderkey").cast("string").as("key_str"),
          col("l_linenumber").cast("long").as("line_long"),
          floor(col("l_quantity")).cast("int").as("qty_int"),
          col("l_shipdate").cast("date").as("ship_date"),
          col("l_linenumber").cast("double").as("line_dbl"),
          col("l_orderkey"), col("l_linenumber"))),

    // limit over a total order → deterministic top slice
    // (TakeOrderedAndProject physical plan, no full sort at scale).
    "q08_limit" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)),

    "q09_filter_numeric" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05 && col("l_extendedprice") < 40000.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // string equality + AND/OR/NOT + IN + BETWEEN on timestamps — typed
    // predicates (the reference casts everything to f64,
    // expression.rs:842-845; we keep native types so parquet gets
    // PushedFilters).
    "q10_filter_bool" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(
          (col("l_returnflag") === "R" || col("l_linestatus") === "F")
            && !(col("l_quantity") <= 10)
            && col("l_returnflag").isin("R", "A")
            && col("l_shipdate").between(ts("1996-01-01"), ts("1999-12-31")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // multi-key sort, mixed asc/desc, explicit nulls placement (the
    // reference forces nulls_first=false; we expose both, pinned here).
    "q11_sort_nulls" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
          col("l_quantity"))
        .orderBy(
          col("disc_or_null").desc_nulls_last,
          col("l_quantity").asc,
          col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(500)),

    "q12_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // Set ops. Reference declares intersect (stub dataframe.rs:251-253);
    // union/except added for the full family. Spark union is bag
    // semantics (UNION ALL); SQL UNION is distinct — both pinned.
    "q13_union_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > 300000.0)
      val fin = o.filter(col("o_orderstatus") === "F" && col("o_totalprice") > 250000.0)
      hi.union(fin)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"), col("o_totalprice"))
    }),

    "q14_union_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > 300000.0)
      val fin = o.filter(col("o_orderstatus") === "F" && col("o_totalprice") > 250000.0)
      hi.union(fin).distinct()
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    "q15_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
      o.filter(col("o_orderstatus") === "F")
        .intersect(Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
          .select(col("o_orderkey"), col("o_orderstatus")))
        .orderBy(col("o_orderkey"))
    }),

    "q16_except" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
      o.filter(col("o_orderstatus") === "F")
        .except(Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
          .select(col("o_orderkey"), col("o_orderstatus")))
        .orderBy(col("o_orderkey"))
    }),

    // uniques (table.rs:293-341) → distinct
    "q17_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))),

    // hist (table.rs:244-290): fixed-width histogram via a broadcast
    // 1-row min/max subquery + integer bucketing — two scans, no
    // collect, scales to any row count.
    "q18_hist" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val bounds = o.agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      o.crossJoin(broadcast(bounds))
        // hi == lo (constant column / single row) would ANSI-throw on
        // the zero bucket width — everything lands in bucket 0 instead
        .withColumn("bucket",
          when(col("hi") > col("lo"),
            least(floor((col("o_totalprice") - col("lo")) / ((col("hi") - col("lo")) / 10)), lit(9)))
            .otherwise(lit(0L)).cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("bucket_min"),
          round(max(col("o_totalprice")), 2).as("bucket_max"))
        .orderBy(col("bucket"))
    }),

    // row slicing by offset (ref table.rs:200 slice(offset, length),
    // dataframe limit :166): Spark 3.4's offset() — only meaningful
    // under a total order, which also makes it deterministic.
    "q88_slice_offset" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
        .offset(100).limit(50)
        .orderBy(col("c_custkey"))),

    // take-by-index (ref table.rs:218 take(indices)): a row gather is
    // order-dependent by definition, so positions come from row_number
    // over the total order and the index set arrives as a join (no
    // driver-side collect of indices). The single-partition window is
    // inherent to global positions — real pipelines gather by KEY
    // (a plain join) instead, which this desugars to.
    "q89_take_indices" -> ((s, d) => {
      val w = Window.orderBy(col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
        .withColumn("pos", row_number().over(w).cast("long") - 1)
        .filter(pmod(col("pos"), lit(101L)) === 0)
        .orderBy(col("pos"))
    }),

    // per-column null counts (ref table.rs:47 null_count): one pass,
    // count_if per column — the profiling primitive behind schema
    // inference and data-quality dashboards.
    "q90_null_count" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("maybe_price",
          when(col("o_totalprice") > 150000, col("o_totalprice")))
        .withColumn("maybe_clerk",
          nullif(col("o_orderpriority"), lit("1-URGENT")))
        .agg(
          count(lit(1)).as("n_rows"),
          count_if(col("maybe_price").isNull).as("nulls_price"),
          count_if(col("maybe_clerk").isNull).as("nulls_clerk"),
          count(col("maybe_price")).as("non_null_price"))),

    // SQL entry point (reference §3.3: the SQL copy pipeline is its
    // third front door): spark.sql over parquet.`path` — no temp view
    // leaked into the shared session — with an uncorrelated scalar
    // subquery and a correlated EXISTS, both of which Catalyst rewrites
    // to joins (scalar → broadcast of the 1-row aggregate, EXISTS →
    // left-semi). The threshold uses max/2, not avg: max is exact
    // across engines where a parallel avg can differ in the last ulp
    // and flip threshold-adjacent rows.
    "q19_sql_subqueries" -> ((s, d) =>
      s.sql(
        s"""SELECT o.o_orderkey, o.o_totalprice
           |FROM parquet.`$d/orders.parquet` o
           |WHERE o.o_totalprice >
           |    (SELECT max(o_totalprice) FROM parquet.`$d/orders.parquet`) / 2
           |  AND EXISTS (SELECT 1 FROM parquet.`$d/lineitem.parquet` l
           |    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
           |ORDER BY o.o_orderkey""".stripMargin)),

    // Recursive CTE — the iterative-closure SQL surface (Spark 4.x
    // WITH RECURSIVE; the reference has no recursion anywhere, and
    // q154/q91 hand-roll their iterations in Scala). The hierarchy is
    // the implicit binary heap over the NATION dimension (parent(i) =
    // (i−1) DIV 2, root 0) and the readout rolls customers up by
    // tree depth. Scale design: RECURSE OVER THE DIMENSION, JOIN THE
    // CORPUS ONCE — a recursion over the corpus table re-scans it
    // every level (measured: the custkey-tree draft cost depth×
    // full-scans, 7.5 s where this is 0.7 s); the dimension recursion
    // is |nation|-sized per frontier, and the single corpus join
    // broadcasts the ≤|nation| closure. The `> 0` guard matters:
    // Spark DIV truncates toward zero, so parent(0) would be 0 — the
    // root re-entering as its own child, an infinite recursion
    // (DuckDB's flooring `//` gives −1 and terminates; the guard
    // makes both engines identical). Determinism: exact counts; the
    // acctbal fold is 2-rounded (the q30 aggregate recipe).
    "q296_recursive_hierarchy" -> ((s, d) =>
      s.sql(
        s"""WITH RECURSIVE ntree(nationkey, depth) AS (
           |  SELECT n_nationkey, 0
           |  FROM parquet.`$d/nation.parquet` WHERE n_nationkey = 0
           |  UNION ALL
           |  SELECT n.n_nationkey, t.depth + 1
           |  FROM parquet.`$d/nation.parquet` n
           |  JOIN ntree t ON (n.n_nationkey - 1) DIV 2 = t.nationkey
           |  WHERE n.n_nationkey > 0)
           |SELECT CAST(t.depth AS BIGINT) AS depth,
           |  count(*) AS n_customers,
           |  count(DISTINCT c.c_nationkey) AS n_nations,
           |  min(c.c_custkey) AS min_key,
           |  round(sum(c.c_acctbal), 2) AS sum_acctbal
           |FROM parquet.`$d/customer.parquet` c
           |JOIN ntree t ON c.c_nationkey = t.nationkey
           |GROUP BY t.depth ORDER BY t.depth""".stripMargin))
  )

  def oracle: Map[String, String] = Map(
    "q296_recursive_hierarchy" ->
      """WITH RECURSIVE ntree(nationkey, depth) AS (
        |  SELECT n_nationkey, 0 FROM nation WHERE n_nationkey = 0
        |  UNION ALL
        |  SELECT n.n_nationkey, t.depth + 1
        |  FROM nation n JOIN ntree t
        |    ON (n.n_nationkey - 1) // 2 = t.nationkey
        |  WHERE n.n_nationkey > 0)
        |SELECT CAST(t.depth AS BIGINT) AS depth,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(count(DISTINCT c.c_nationkey) AS BIGINT) AS n_nations,
        |  CAST(min(c.c_custkey) AS BIGINT) AS min_key,
        |  round(sum(c.c_acctbal), 2) AS sum_acctbal
        |FROM customer c JOIN ntree t ON c.c_nationkey = t.nationkey
        |GROUP BY t.depth ORDER BY t.depth""".stripMargin,

    "q88_slice_offset" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |ORDER BY c_custkey LIMIT 50 OFFSET 100""".stripMargin,

    "q89_take_indices" ->
      """SELECT c_custkey, c_name, pos FROM (
        |  SELECT c_custkey, c_name,
        |    row_number() OVER (ORDER BY c_custkey) - 1 AS pos
        |  FROM customer)
        |WHERE pos % 101 = 0 ORDER BY pos""".stripMargin,

    "q90_null_count" ->
      """SELECT count(*) AS n_rows,
        |  count(*) FILTER (o_totalprice <= 150000 OR o_totalprice IS NULL)
        |    AS nulls_price,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS nulls_clerk,
        |  count(*) FILTER (o_totalprice > 150000) AS non_null_price
        |FROM orders""".stripMargin,

    "q19_sql_subqueries" ->
      """SELECT o.o_orderkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice > (SELECT max(o_totalprice) FROM orders) / 2
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |ORDER BY o.o_orderkey""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_select" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_drop" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q04_with_column" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS disc_price,
        |  l_tax * 100 AS l_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q05_rename" ->
      """SELECT r_regionkey AS region_id, r_name AS region_name
        |FROM region ORDER BY region_id""".stripMargin,

    "q06_with_id" ->
      """SELECT count(*) AS n_rows, count(*) AS n_distinct, true AS ids_nonneg
        |FROM lineitem""".stripMargin,

    "q07_cast" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS key_str,
        |  CAST(l_linenumber AS BIGINT) AS line_long,
        |  CAST(floor(l_quantity) AS INTEGER) AS qty_int,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  CAST(l_linenumber AS DOUBLE) AS line_dbl,
        |  l_orderkey, l_linenumber
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q08_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q09_filter_numeric" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount >= 0.05 AND l_extendedprice < 40000.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q10_filter_bool" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
        |FROM lineitem
        |WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
        |  AND NOT (l_quantity <= 10)
        |  AND l_returnflag IN ('R', 'A')
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1999-12-31'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q11_sort_nulls" ->
      """SELECT l_orderkey, l_linenumber,
        |  nullif(l_discount, 0.0) AS disc_or_null, l_quantity
        |FROM lineitem
        |ORDER BY disc_or_null DESC NULLS LAST, l_quantity ASC,
        |  l_orderkey ASC, l_linenumber ASC
        |LIMIT 500""".stripMargin,

    "q12_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q13_union_all" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM (
        |  SELECT * FROM orders WHERE o_totalprice > 300000.0
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 250000.0)
        |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "q14_union_distinct" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM (
        |  SELECT * FROM orders WHERE o_totalprice > 300000.0
        |  UNION
        |  SELECT * FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 250000.0)
        |ORDER BY o_orderkey""".stripMargin,

    "q15_intersect" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 100000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q16_except" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 100000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q17_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q18_hist" ->
      """WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
        |SELECT CAST(CASE WHEN hi > lo
        |    THEN least(floor((o_totalprice - lo) / ((hi - lo) / 10)), 9)
        |    ELSE 0 END AS INTEGER) AS bucket,
        |  count(*) AS n,
        |  round(min(o_totalprice), 2) AS bucket_min,
        |  round(max(o_totalprice), 2) AS bucket_max
        |FROM orders, b
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
