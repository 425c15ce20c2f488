package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Array / collection / map functions (SURVEY.md §2.10) — the reference's
  * second-largest function file (functions/array.rs:15-399: contains,
  * distinct, except, intersect, max, min, position, remove, repeat, sort,
  * union — 1-based position per array.rs:524-531) plus its declared
  * surface (collect_list/collect_set array.rs:38, arrays_zip/overlap
  * array.rs:400-407, map_* array.rs:408-412). Everything is a Spark
  * builtin; per-row kernels stay inside whole-stage codegen.
  *
  * Cross-engine determinism: any operation whose result order is
  * unspecified in either engine (distinct, intersect, union, collect_*)
  * is wrapped in an explicit sort on both sides; every array-typed output
  * is serialized to a '|'-joined string because the driver's pandas
  * comparator cannot hash ndarray cells (and DuckDB's array_to_string of
  * an empty list is NULL where Spark's array_join is '' — the oracle
  * coalesces).
  */
object Arrays extends QueryModule {

  /** Serialize an array column (any element type) to a deterministic
    * '|'-joined string for the cross-engine comparator. */
  private def ser(c: Column): Column = array_join(c.cast("array<string>"), "|")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // generator surface (reference stubs explode scalar.rs:237, struct
    // :427): posexplode fans each row out to one row per array element
    // with its 1-based position — the building block the MinHash and
    // frame-fan-out operators use. DuckDB reproduces it by unnesting a
    // position-tagged struct list.
    "q43_generators" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .toDF("p_partkey", "pos", "word")
        .select(col("p_partkey"), (col("pos") + 1).cast("long").as("pos"),
          col("word"))
        .orderBy(col("p_partkey"), col("pos"))),

    // explode_outer: generator that PRESERVES empty-array rows as a
    // single null-element row — positional explode drops them, which
    // silently loses documents in a fan-out/aggregate round-trip. The
    // oracle reproduces it as unnest ∪ the empty-list rows.
    "q43b_generators_outer" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("l", expr(
          "case when n_chars % 5 = 0 then array() " +
            "else sequence(1, n_chars % 3 + 1) end"))
        .select(col("doc_id"), explode_outer(col("l")).as("v"))
        .select(col("doc_id"), col("v").cast("long").as("v"))
        .orderBy(col("doc_id"), col("v").asc_nulls_first)),

    // inline: explodes an array of structs into columns — the typed
    // struct fan-out (key/value attribute rows per entity).
    "q43c_inline" -> ((s, d) =>
      Tables.nation(s, d)
        .select(col("n_nationkey"), inline(array(
          struct(lit("name").as("k"), col("n_name").as("v")),
          struct(lit("region").as("k"),
            col("n_regionkey").cast("string").as("v")))))
        .orderBy(col("n_nationkey"), col("k"))),

    // array EDIT kernels (Spark 3.4/3.5 additions the reference's stub
    // catalogue predates): append/prepend/insert-at/compact/flatten —
    // the mutation vocabulary for building feature lists incrementally.
    "q54f_array_edit" -> ((s, d) =>
      Tables.part(s, d)
        .withColumn("a", split(col("p_name"), " "))
        .withColumn("b", split(col("p_type"), " "))
        .select(
          col("p_partkey"),
          ser(array_append(col("a"), lit("zz"))).as("k_append"),
          ser(array_prepend(col("a"), lit("aa"))).as("k_prepend"),
          ser(array_insert(col("a"), lit(2), lit("mid"))).as("k_insert"),
          ser(array_compact(transform(col("a"),
            x => nullif(x, lit("widget"))))).as("k_compact"),
          ser(flatten(array(col("a"), col("b")))).as("k_flatten"),
          ser(slice(col("a"), 2, 2)).as("k_slice"))
        .orderBy(col("p_partkey"))),

    // per-row array kernels over words of p_name/p_type.
    "q54_array_core" -> ((s, d) =>
      Tables.part(s, d)
        .withColumn("a", split(col("p_name"), " "))
        .withColumn("b", split(col("p_type"), " "))
        .select(
          col("p_partkey"),
          array_contains(col("a"), "widget").as("k_contains"),
          ser(array_sort(array_distinct(concat(col("a"), col("b"))))).as("k_distinct"),
          ser(array_sort(array_except(col("a"), col("b")))).as("k_except"),
          ser(array_sort(array_intersect(col("a"), col("b")))).as("k_intersect"),
          array_max(col("a")).as("k_max"),
          array_min(col("a")).as("k_min"),
          array_position(col("a"), "bolt").cast("long").as("k_position"),
          ser(array_remove(col("a"), "cold")).as("k_remove"),
          ser(array_repeat(col("p_brand"), 3)).as("k_repeat"),
          ser(array_sort(col("a"))).as("k_sort"),
          ser(array_sort(array_union(col("a"), col("b")))).as("k_union"),
          arrays_overlap(col("a"), col("b")).as("k_overlap"),
          ser(zip_with(col("a"), reverse(col("a")), (x, y) => concat_ws(":", x, y)))
            .as("k_zip"),
          ser(flatten(array(col("a"), col("b")))).as("k_flatten"),
          array_join(col("a"), "-").as("k_join"),
          ser(slice(col("a"), 2, 2)).as("k_slice"),
          element_at(col("a"), 1).as("k_first"),
          ser(sequence(lit(1L), pmod(col("p_partkey"), lit(5L)) + 2)).as("k_seq"),
          size(col("a")).cast("long").as("k_size"),
          ser(reverse(col("a"))).as("k_reverse"))
        .orderBy(col("p_partkey"))),

    // group-level collection aggregates; collect order is shuffle-
    // dependent, so results are sorted before serialization.
    "q54b_array_agg" -> ((s, d) =>
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(
          ser(array_sort(collect_list(col("p_type")))).as("k_collect"),
          ser(array_sort(collect_set(col("p_size").cast("long")))).as("k_set"),
          ser(array_sort(array_distinct(flatten(collect_list(split(col("p_name"), " "))))))
            .as("k_vocab"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))),

    // higher-order array functions (Spark-only depth beyond the
    // reference's kernel list): exists/forall/filter (with and without
    // index), transform with index, aggregate with a finish lambda,
    // descending sort_array. Index base differs — Spark lambdas get
    // 0-based i, DuckDB 1-based — pinned by the oracle's i-1.
    "q54e_array_hof" -> ((s, d) =>
      Tables.part(s, d)
        .withColumn("a", split(col("p_name"), " "))
        .select(
          col("p_partkey"),
          exists(col("a"), w => w.startsWith("b")).as("h_exists"),
          forall(col("a"), w => length(w) > 2).as("h_forall"),
          ser(filter(col("a"), w => length(w) >= 5)).as("h_filter"),
          ser(filter(col("a"), (w, i) => pmod(i, lit(2)) === 0)).as("h_filter_idx"),
          ser(transform(col("a"), w => upper(w))).as("h_upper"),
          ser(transform(col("a"), (w, i) =>
            concat_ws("_", i.cast("string"), w))).as("h_transform_idx"),
          aggregate(col("a"), lit(0L), (acc, w) => acc + length(w),
            acc => acc * 2).as("h_reduce_finish"),
          ser(sort_array(col("a"), asc = false)).as("h_sort_desc"))
        .orderBy(col("p_partkey"))),

    // higher-order map functions: transform_keys/values, map_filter,
    // map_zip_with over maps with known keys; results are emitted as
    // sorted entry strings (maps aren't comparable cross-engine), and
    // the oracle reconstructs the same entries directly from the base
    // columns.
    "q54d_map_hof" -> ((s, d) =>
      Tables.part(s, d)
        .withColumn("m", map_from_arrays(
          array(lit("a"), lit("b")),
          array(col("p_size").cast("long"), col("p_partkey"))))
        .withColumn("m2", map_from_arrays(
          array(lit("b"), lit("c")),
          array(col("p_size").cast("long"), lit(5L))))
        .select(
          col("p_partkey"),
          ser(array_sort(transform(
            map_entries(transform_values(col("m"), (_, v) => v * 2)),
            e => concat_ws("=", e.getField("key"), e.getField("value")))))
            .as("h_tvals"),
          ser(array_sort(transform(
            map_entries(transform_keys(col("m"), (k, _) => upper(k))),
            e => concat_ws("=", e.getField("key"), e.getField("value")))))
            .as("h_tkeys"),
          ser(array_sort(transform(
            map_entries(map_filter(col("m"), (_, v) => v > 10)),
            e => concat_ws("=", e.getField("key"), e.getField("value")))))
            .as("h_mfilter"),
          ser(array_sort(transform(
            map_entries(map_zip_with(col("m"), col("m2"),
              (_, v1, v2) => coalesce(v1, lit(0L)) + coalesce(v2, lit(0L)))),
            e => concat_ws("=", e.getField("key"), e.getField("value")))))
            .as("h_mzip"))
        .orderBy(col("p_partkey"))),

    // map construction / access / decomposition; maps are emitted as
    // sorted "k=v" entry strings — map column equality is not portable
    // across engines, serialized entry lists are.
    "q54c_map" -> ((s, d) =>
      Tables.part(s, d)
        .withColumn("m", map_from_arrays(
          array(lit("size"), lit("key")),
          array(col("p_size").cast("long"), col("p_partkey"))))
        .withColumn("m2", map_from_entries(
          array(struct(lit("brand").as("k"), col("p_brand").as("v")))))
        .select(
          col("p_partkey"),
          ser(array_sort(map_keys(col("m")))).as("k_keys"),
          ser(array_sort(map_values(col("m")))).as("k_values"),
          element_at(col("m"), "size").as("k_get"),
          ser(array_sort(transform(map_entries(col("m")),
            e => concat_ws("=", e.getField("key"), e.getField("value")))))
            .as("k_entries"),
          ser(array_sort(transform(map_entries(map_concat(col("m2"),
            map_from_arrays(array(lit("n")), array(col("p_size").cast("string"))))),
            e => concat_ws("=", e.getField("key"), e.getField("value")))))
            .as("k_concat"),
          size(col("m")).cast("long").as("k_msize"))
        .orderBy(col("p_partkey")))
  )

  def oracle: Map[String, String] = Map(
    "q43_generators" ->
      """WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS a FROM part)
        |SELECT p_partkey, CAST(u['p'] AS BIGINT) AS pos, u['w'] AS word
        |FROM (SELECT p_partkey,
        |    unnest(list_transform(range(1, len(a) + 1),
        |      i -> {'p': i, 'w': a[CAST(i AS INT)]})) AS u
        |  FROM t)
        |ORDER BY p_partkey, pos""".stripMargin,

    "q43b_generators_outer" ->
      """WITH base AS (SELECT doc_id,
        |    CASE WHEN n_chars % 5 = 0 THEN []
        |         ELSE range(1, n_chars % 3 + 2) END AS l
        |  FROM documents)
        |SELECT doc_id, CAST(v AS BIGINT) AS v
        |FROM (SELECT doc_id, unnest(l) AS v FROM base)
        |UNION ALL SELECT doc_id, NULL FROM base WHERE len(l) = 0
        |ORDER BY doc_id, v NULLS FIRST""".stripMargin,

    "q43c_inline" ->
      """SELECT n_nationkey, k, v FROM (
        |  SELECT n_nationkey, 'name' AS k, n_name AS v FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'region', CAST(n_regionkey AS VARCHAR) FROM nation)
        |ORDER BY n_nationkey, k""".stripMargin,

    "q54f_array_edit" ->
      """WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS a,
        |    string_split(p_type, ' ') AS b FROM part)
        |SELECT p_partkey,
        |  coalesce(array_to_string(list_append(a, 'zz'), '|'), '') AS k_append,
        |  coalesce(array_to_string(list_prepend('aa', a), '|'), '') AS k_prepend,
        |  coalesce(array_to_string(a[1:1] || ['mid'] || a[2:], '|'), '')
        |    AS k_insert,
        |  coalesce(array_to_string(list_filter(
        |    list_transform(a, x -> nullif(x, 'widget')),
        |    x -> x IS NOT NULL), '|'), '') AS k_compact,
        |  coalesce(array_to_string(flatten([a, b]), '|'), '') AS k_flatten,
        |  coalesce(array_to_string(a[2:3], '|'), '') AS k_slice
        |FROM t ORDER BY p_partkey""".stripMargin,

    "q54_array_core" ->
      """WITH t AS (SELECT p_partkey, p_brand,
        |    string_split(p_name, ' ') AS a, string_split(p_type, ' ') AS b
        |  FROM part)
        |SELECT p_partkey,
        |  list_contains(a, 'widget') AS k_contains,
        |  coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), '|'), '') AS k_distinct,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(a), x -> NOT list_contains(b, x))), '|'), '') AS k_except,
        |  coalesce(array_to_string(list_sort(list_intersect(a, b)), '|'), '') AS k_intersect,
        |  list_max(a) AS k_max,
        |  list_min(a) AS k_min,
        |  CAST(list_position(a, 'bolt') AS BIGINT) AS k_position,
        |  coalesce(array_to_string(list_filter(a, x -> x <> 'cold'), '|'), '') AS k_remove,
        |  coalesce(array_to_string([p_brand, p_brand, p_brand], '|'), '') AS k_repeat,
        |  coalesce(array_to_string(list_sort(a), '|'), '') AS k_sort,
        |  coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), '|'), '') AS k_union,
        |  len(list_intersect(a, b)) > 0 AS k_overlap,
        |  coalesce(array_to_string(list_transform(range(1, len(a) + 1),
        |    i -> a[i] || ':' || a[len(a) + 1 - i]), '|'), '') AS k_zip,
        |  coalesce(array_to_string(flatten([a, b]), '|'), '') AS k_flatten,
        |  array_to_string(a, '-') AS k_join,
        |  coalesce(array_to_string(a[2:3], '|'), '') AS k_slice,
        |  a[1] AS k_first,
        |  coalesce(array_to_string(range(1, p_partkey % 5 + 3), '|'), '') AS k_seq,
        |  CAST(len(a) AS BIGINT) AS k_size,
        |  coalesce(array_to_string(list_reverse(a), '|'), '') AS k_reverse
        |FROM t ORDER BY p_partkey""".stripMargin,

    "q54e_array_hof" ->
      """WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS a FROM part)
        |SELECT p_partkey,
        |  len(list_filter(a, w -> w LIKE 'b%')) > 0 AS h_exists,
        |  len(list_filter(a, w -> NOT (length(w) > 2))) = 0 AS h_forall,
        |  coalesce(array_to_string(list_filter(a, w -> length(w) >= 5), '|'), '')
        |    AS h_filter,
        |  coalesce(array_to_string(list_filter(a, (w, i) -> i % 2 = 1), '|'), '')
        |    AS h_filter_idx,
        |  coalesce(array_to_string(list_transform(a, w -> upper(w)), '|'), '')
        |    AS h_upper,
        |  coalesce(array_to_string(list_transform(a,
        |    (w, i) -> CAST(i - 1 AS VARCHAR) || '_' || w), '|'), '')
        |    AS h_transform_idx,
        |  CAST(list_sum(list_transform(a, w -> length(w))) AS BIGINT) * 2
        |    AS h_reduce_finish,
        |  coalesce(array_to_string(list_reverse_sort(a), '|'), '') AS h_sort_desc
        |FROM t ORDER BY p_partkey""".stripMargin,

    "q54d_map_hof" ->
      """WITH t AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS ps FROM part)
        |SELECT p_partkey,
        |  array_to_string(list_sort(
        |    ['a=' || CAST(ps * 2 AS VARCHAR),
        |     'b=' || CAST(p_partkey * 2 AS VARCHAR)]), '|') AS h_tvals,
        |  array_to_string(list_sort(
        |    ['A=' || CAST(ps AS VARCHAR),
        |     'B=' || CAST(p_partkey AS VARCHAR)]), '|') AS h_tkeys,
        |  coalesce(array_to_string(list_sort(list_filter(
        |    [CASE WHEN ps > 10 THEN 'a=' || CAST(ps AS VARCHAR) END,
        |     CASE WHEN p_partkey > 10 THEN 'b=' || CAST(p_partkey AS VARCHAR) END],
        |    x -> x IS NOT NULL)), '|'), '') AS h_mfilter,
        |  array_to_string(list_sort(
        |    ['a=' || CAST(ps AS VARCHAR),
        |     'b=' || CAST(p_partkey + ps AS VARCHAR),
        |     'c=5']), '|') AS h_mzip
        |FROM t ORDER BY p_partkey""".stripMargin,

    "q54b_array_agg" ->
      """SELECT p_brand,
        |  coalesce(array_to_string(list_sort(list(p_type)), '|'), '') AS k_collect,
        |  coalesce(array_to_string(list_sort(list_distinct(list(CAST(p_size AS BIGINT)))), '|'), '') AS k_set,
        |  coalesce(array_to_string(list_sort(list_distinct(flatten(list(string_split(p_name, ' '))))), '|'), '') AS k_vocab,
        |  count(*) AS n
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q54c_map" ->
      """WITH t AS (SELECT p_partkey,
        |    map(['size', 'key'], [CAST(p_size AS BIGINT), p_partkey]) AS m,
        |    map(['brand', 'n'], [p_brand, CAST(p_size AS VARCHAR)]) AS mc
        |  FROM part)
        |SELECT p_partkey,
        |  coalesce(array_to_string(list_sort(map_keys(m)), '|'), '') AS k_keys,
        |  coalesce(array_to_string(list_sort(map_values(m)), '|'), '') AS k_values,
        |  m['size'][1] AS k_get,
        |  coalesce(array_to_string(list_sort(list_transform(map_entries(m),
        |    e -> e.key || '=' || e.value)), '|'), '') AS k_entries,
        |  coalesce(array_to_string(list_sort(list_transform(map_entries(mc),
        |    e -> e.key || '=' || e.value)), '|'), '') AS k_concat,
        |  CAST(cardinality(m) AS BIGINT) AS k_msize
        |FROM t ORDER BY p_partkey""".stripMargin
  )
}
