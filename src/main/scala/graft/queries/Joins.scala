package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Joins (SURVEY.md §2.4). The reference implements a single in-memory
  * hash equi-join (functions/join.rs:139-215) with inner/left/right/full
  * (expression.rs:335-340) and correct null-key exclusion; string keys and
  * FULL OUTER are broken there (join.rs:187-205, :109-133). We implement
  * correct SQL semantics on Spark's join machinery and let Catalyst pick
  * broadcast-hash vs sort-merge; dimension tables are explicitly
  * `broadcast()` so a 100 TB fact scan never shuffles for them.
  * Semi/anti/cross/theta joins — absent in the reference — are exposed as
  * first-class (the "missing join kinds" row of §2.4).
  */
object Joins extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // inner equi-join chain, dims broadcast: fact shuffles 0 times for
    // the dim lookups; single agg shuffle on the tiny group key.
    "q20_join_inner" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      Tables.orders(s, d)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"), "inner")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "inner")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "inner")
        .groupBy(col("r_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"))
    }),

    // left outer: every customer, with/without orders. Scale shape:
    // pre-aggregate the fact by key FIRST (map-side partial agg shrinks
    // the shuffle to |distinct custkeys|), then left-join the per-key
    // rollup to customer — at 100 TB the orders side never broadcasts
    // and must not be shuffled row-by-row through the join.
    "q21_join_left" -> ((s, d) => {
      val perCust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("o_n"), sum(col("o_totalprice")).as("o_sum"))
      Tables.customer(s, d)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("o_n"), lit(0L)).as("n_orders"),
          round(coalesce(col("o_sum"), lit(0.0)), 2).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // right outer, same aggregate-then-join shape as q21.
    "q22_join_right" -> ((s, d) => {
      val perCust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("o_n"))
      perCust.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"), coalesce(col("o_n"), lit(0L)).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    // full outer with correct SQL semantics (the reference drops
    // unmatched non-null keys, join.rs:109-133 — we do not).
    "q23_join_full" -> ((s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey")).distinct()
      val auto = Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"), col("c_name"))
      big.join(auto, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(col("o_custkey"), col("c_custkey"), col("c_name"))
        .orderBy(col("o_custkey").asc_nulls_first, col("c_custkey").asc_nulls_first)
    }),

    // left semi = EXISTS; no right columns, no row multiplication.
    "q24_join_semi" -> ((s, d) => {
      val hi = Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
      Tables.customer(s, d)
        .join(hi, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // left anti = NOT EXISTS.
    "q25_join_anti" -> ((s, d) => {
      val o = Tables.orders(s, d)
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q26_join_cross" -> ((s, d) => {
      val st = Tables.orders(s, d).select(col("o_orderstatus")).distinct()
      Tables.region(s, d).crossJoin(broadcast(st))
        .select(col("r_name"), col("o_orderstatus"))
        .orderBy(col("r_name"), col("o_orderstatus"))
    }),

    // multi-column equi key (JoinCriteria Vec<(String,String)>,
    // expression.rs:328-332).
    "q27_join_multikey" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.select(col("l_orderkey").as("ak"), col("l_linenumber").as("al"), col("l_quantity"))
      val b = li.select(col("l_orderkey").as("bk"), col("l_linenumber").as("bl"), col("l_extendedprice"))
        .filter(col("l_extendedprice") > 30000.0)
      a.join(b, col("ak") === col("bk") && col("al") === col("bl"), "inner")
        .select(col("ak"), col("al"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("ak"), col("al"))
    }),

    // string join keys — silently broken in the reference
    // (join.rs:187-205); correct here. "n_chars > 1.5·avg" is evaluated in
    // exact BIGINT arithmetic (2·n·count > 3·sum) so float summation-order
    // ulp noise can never flip a boundary row between engines.
    "q28_join_stringkey" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val stats = docs.groupBy(col("lang").as("lang2"))
        .agg(count(lit(1)).as("lang_docs"), sum(col("n_chars")).as("lang_sum_chars"))
      docs.join(broadcast(stats), col("lang") === col("lang2"), "inner")
        .filter(col("n_chars") * col("lang_docs") * 2 > col("lang_sum_chars") * 3)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("lang_docs"))
        .orderBy(col("doc_id"))
    }),

    // as-of join: each event matched to the customer's most recent order
    // at-or-before the event time. Spark has no native ASOF; the naive
    // range-join is O(|events|·|orders per key|). Scale-safe composition:
    // union both sides tagged, one shuffle on the key, and a running
    // `last(..., ignoreNulls)` over (time, side) carries the latest order
    // attributes forward onto event rows — orders sort before events at
    // equal timestamps, giving inclusive (>=) ASOF semantics. The right
    // side is first deduped to one row per (key, time) so the match is
    // deterministic in both engines (DuckDB oracles with native ASOF JOIN).
    "q74_join_asof" -> ((s, d) => {
      val od = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
      val left = Tables.events(s, d).select(
        col("user_id").as("k"), col("ts").as("t"), col("event_id"),
        lit(null).cast("long").as("r_orderkey"),
        lit(null).cast("double").as("r_price"), lit(1).as("side"))
      val right = od.select(
        col("o_custkey").as("k"), col("o_orderdate").as("t"),
        lit(null).cast("long").as("event_id"),
        col("o_orderkey").as("r_orderkey"),
        col("o_totalprice").as("r_price"), lit(0).as("side"))
      val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      left.unionByName(right)
        .withColumn("a_orderkey", last(col("r_orderkey"), ignoreNulls = true).over(w))
        .withColumn("a_price", last(col("r_price"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
          col("a_orderkey"), col("a_price"))
        .orderBy(col("event_id"))
    }),

    // Point-in-time (feature-store) lookup: "what was this user's state
    // an hour before the event?" answered against the SCD2 dimension
    // q120 derives — WITHOUT an interval join. The lookup compiles to
    // the as-of shape: dimension updates (run starts) and probes union
    // into one stream keyed on user_id, sorted (t, kind, event_id) with
    // updates first at a shared instant (>= boundary semantics), and a
    // running last_value(state) hands every probe the newest update at
    // or before its lookup time. ZERO join operators; the heavy shuffle
    // keys on user_id only — the shape that trains feature pipelines at
    // 100 TB where a BETWEEN-range join would either nested-loop or
    // fan out per interval. Probes predating the user's first interval
    // correctly read NULL (the oracle's LEFT JOIN no-match).
    "q125_pit_lookup" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val updates = ev
        .withColumn("chg",
          lag(col("event_type"), 1).over(w).isNull
            || lag(col("event_type"), 1).over(w) =!= col("event_type"))
        .filter(col("chg"))
        .select(col("user_id"), col("ts").as("t"), lit(0).as("kind"),
          col("event_id"), col("event_type").as("state"))
      val probes = ev.select(col("user_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("t"), lit(1).as("kind"),
        col("event_id"), lit(null).cast("string").as("state"))
      val mw = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      updates.unionByName(probes)
        .withColumn("state_at", last(col("state"), ignoreNulls = true).over(mw))
        .filter(col("kind") === 1)
        .select(col("user_id"), col("event_id"), col("t").as("lookup_ts"),
          col("state_at"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // theta/range join (a non-equi conjunct on top of the equi key) —
    // "missing join kinds" in the reference, native in Spark.
    "q29_join_theta" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
      Tables.lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS"), "inner")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_late"), round(sum(col("l_extendedprice")), 2).as("late_value"))
        .orderBy(col("l_returnflag"))
    }),

    // banded interval self-join: "events within ±60 s of each other"
    // with NO equi key is a cross join at face value — O(n²) rows, the
    // one shape that cannot run at 100 TB. The banding trick makes it
    // an EQUI join: bucket time into 60 s bins, explode the probe side
    // to its bin and both neighbors (3×, constant), hash-join on the
    // bin, and apply the exact ±60 s residual after. A pair lands in
    // exactly one joined row (the build row's single bin), so no dedup
    // pass is needed. Shuffle is 4×|events| rows on a high-cardinality
    // integer key instead of |events|² pairs.
    "q29b_join_banded" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("value"),
          expr("unix_micros(ts) div 60000000").as("bin"))
      val probe = ev.select(col("event_id").as("b_id"), col("ts").as("b_ts"),
        col("value").as("b_value"),
        explode(array(col("bin") - 1, col("bin"), col("bin") + 1)).as("b_bin"))
      val near = ev.join(probe,
          col("bin") === col("b_bin") &&
            abs(unix_micros(col("ts")) - unix_micros(col("b_ts"))) <= 60000000L &&
            col("event_id") =!= col("b_id"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_near"),
          round(sum(col("b_value")), 4).as("v_near"))
      ev.select(col("event_id")).join(near, Seq("event_id"), "left")
        .select(col("event_id"),
          coalesce(col("n_near"), lit(0L)).as("n_near"),
          coalesce(col("v_near"), lit(0.0)).as("v_near"))
        .orderBy(col("event_id"))
    }),

    // MERGE-style upsert (snapshot maintenance): apply a change set
    // (updates to existing keys + brand-new keys) onto a base snapshot
    // in one pass — FULL OUTER join on the key, change side wins via
    // coalesce, an `op` column records what happened to each row. One
    // shuffle on the merge key; at 100 TB the change set is usually
    // small enough to broadcast, but the shuffle-join shape here is the
    // general case. (Neither engine has MERGE INTO over parquet; this
    // is the declarative equivalent.)
    "q106_merge_upsert" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_name").as("name"),
          col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"))
      val updates = base.filter(pmod(col("k"), lit(7L)) === 0)
        .select(col("k"), col("name"), (col("bal") + 100.0).as("bal"),
          lit("UPDATED").as("seg"))
      val inserts = base.filter(pmod(col("k"), lit(97L)) === 0)
        .select((col("k") + 1000000L).as("k"),
          concat(lit("new-"), col("k")).as("name"),
          lit(0.0).as("bal"), lit("NEW").as("seg"))
      val chg = updates.unionByName(inserts)
        .select(col("k").as("ck"), col("name").as("cname"),
          col("bal").as("cbal"), col("seg").as("cseg"))
      base.join(chg, col("k") === col("ck"), "full_outer")
        .select(
          coalesce(col("k"), col("ck")).as("k"),
          coalesce(col("cname"), col("name")).as("name"),
          coalesce(col("cbal"), col("bal")).as("bal"),
          coalesce(col("cseg"), col("seg")).as("seg"),
          when(col("k").isNull, "insert")
            .when(col("ck").isNull, "keep").otherwise("update").as("op"))
        .orderBy(col("k"))
    }),

    // TPC-H Q3 shape (shipping priority): segment-filtered customers,
    // in-flight orders, top revenue. The full analytics composite: two
    // selective scans, fact-fact equi-join, group-by,
    // TakeOrderedAndProject for the top-k — every filter pushed. No
    // broadcast hint on customer: it grows linearly with scale, so the
    // join strategy is left to size stats + AQE, which pick a
    // BroadcastHashJoin while the filtered side fits (PlanShapeSpec
    // pins that) and fall back to a shuffle join at 100 TB where a
    // forced broadcast would OOM the executors.
    "q107_shipping_priority" -> ((s, d) => {
      val cut = to_timestamp(lit("1996-06-01"))
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
          col("o_orderpriority"))
    }),

    // Salted skew join — the join-side counterpart of q75's salted
    // aggregation, for the case AQE's skew-join split can't fix: ONE
    // hot key whose matching rows exceed a single task's memory even
    // after partition splitting (every split still re-reads the same
    // dim row), or an engine/config where AQE is off. The fact side
    // tags each row with a deterministic salt in [0, R) (xxhash64 of
    // the row's own primary key — reproducible, unlike rand()); the
    // dim side explodes into R replicas, one per salt; the equi-join
    // key becomes (key, salt), so a key carrying 10^9 fact rows at
    // 100 TB spreads over R reducers instead of hot-spotting one.
    // Replication cost is R × |dim| — chosen when |dim| is too big to
    // broadcast outright but R copies still shuffle cheaply. The salt
    // never survives the join; the result is provably the plain join
    // (the oracle computes exactly that, no salt anywhere).
    "q130_salted_join" -> ((s, d) => {
      val R = 8
      val fact = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(R))
            .as("fsalt"))
      val dim = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"),
          explode(sequence(lit(0L), lit(R - 1L))).as("dsalt"))
      fact.join(dim,
          col("l_suppkey") === col("s_suppkey")
            && col("fsalt") === col("dsalt"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q5 shape (local supplier volume): the full star — region →
    // nation → {customer, supplier} → orders → lineitem with the
    // local-supplier constraint (customer and supplier share a
    // nation). Only the genuinely bounded dimensions carry a broadcast
    // hint (region ≤5 rows, nation ≤25 rows — fixed-cardinality in
    // TPC-H at every scale factor). customer and supplier grow
    // linearly, so their join strategy is left to size stats + AQE:
    // broadcast while they fit (PlanShapeSpec pins that at test scale),
    // shuffle at 100 TB where a forced broadcast is a driver OOM.
    "q108_local_volume" -> ((s, d) => {
      val asianNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(asianNations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01"))
          && col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
          col("l_discount"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Market-basket co-occurrence (the A-priori candidate-pair step):
    // part pairs bought together in ≥2 orders, with per-pair lift.
    // Scale shape: the self-join keys on l_orderkey, so the pair
    // explosion is bounded PER ORDER (k items → k·(k−1)/2 pairs, k≤7
    // in TPC-H-shaped data) — never corpus × corpus; the support
    // filter then shrinks the result by orders of magnitude BEFORE
    // enrichment, and it is the tiny filtered pair set that gets
    // broadcast against the corpus-sized item-frequency table (the
    // dimension stays put — broadcasting it would ship |parts| to
    // every executor). Lift is exact-long products cast to double,
    // then one correctly-rounded division: bit-identical cross-engine
    // with no rounding at all.
    "q151_cooccurrence" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val itemN = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
      val nOrders = li.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val pairs = li.select(col("l_orderkey"), col("l_partkey").as("part_a"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("part_b")),
          "l_orderkey")
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= 2)
      val enriched = broadcast(pairs)
        .join(itemN.select(col("l_partkey").as("part_a"),
          col("n_item").as("n_a")), "part_a")
      broadcast(enriched)
        .join(itemN.select(col("l_partkey").as("part_b"),
          col("n_item").as("n_b")), "part_b")
        .crossJoin(broadcast(nOrders))
        .withColumn("lift",
          (col("n_pair") * col("n_orders")).cast("double") /
            (col("n_a") * col("n_b")).cast("double"))
        .select(col("part_a"), col("part_b"), col("n_pair"),
          col("n_a"), col("n_b"), col("lift"))
        .orderBy(col("part_a"), col("part_b"))
    }),

    // TPC-H Q7 shape (volume shipping): bilateral trade between two
    // fixed nations by ship year. The nation pre-filter collapses
    // supplier and customer to 2/25 of their tables BEFORE they meet
    // the fact table — the classic dimension-first star reduction —
    // and the 2-row nation frame rides an explicit broadcast; the
    // supplier/customer legs are left to size stats + AQE exactly as
    // in q108 (broadcast while they fit, shuffle at 100 TB). The ship
    // date range prunes the lineitem scan (pushed filter), and the
    // asymmetric pair predicate (n1→n2 or n2→n1, never n1→n1) runs
    // post-join on the already-reduced rows. One year() extraction,
    // one map-side-combined group — Q7's correlated-subquery-free
    // declarative form.
    "q160_volume_shipping" -> ((s, d) => {
      val (na, nb) = ("NATION_3", "NATION_7")
      val nations = broadcast(Tables.nation(s, d)
        .filter(col("n_name").isin(na, nb))
        .select(col("n_nationkey"), col("n_name")))
      val sup = Tables.supplier(s, d)
        .join(nations, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, d)
        .join(nations, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01"))
          && col("l_shipdate") < to_timestamp(lit("1997-01-01")))
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          col("l_extendedprice"), col("l_discount"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === na && col("cust_nation") === nb)
          || (col("supp_nation") === nb && col("cust_nation") === na))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q10 shape (returned-item report): which customers returned
    // the most revenue in a quarter. The returnflag + order-date
    // predicates prune both fact-side scans BEFORE the joins; the
    // per-customer group then collapses to the top 20 via orderBy +
    // limit — a TakeOrderedAndProject bounded heap (every partition
    // forwards ≤20 rows to the driver), never a global sort. Nation is
    // the only hinted broadcast (fixed 25 rows); the customer leg is
    // stats+AQE as in q108/q160. Revenue accumulates in DECIMAL, not
    // round(sum(double), 2): one per-customer sum here landed exactly
    // on a .xx5 half-cent (307843.595 — measured), where Spark's
    // shortest-repr HALF_UP and DuckDB's binary round diverge; casting
    // the 2-decimal FACTORS to decimal makes the product (scale 4) and
    // the sum exact in any order, and the final 2-decimal snap is an
    // exact-decimal tie both engines round away from zero.
    "q163_returns_report" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01"))
          && col("o_orderdate") < to_timestamp(lit("1996-04-01")))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val c = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)")
            * (lit(1).cast("decimal(12,2)")
              - col("l_discount").cast("decimal(12,2)")))
          .cast("decimal(18,2)").cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
    }),

    // TPC-H Q14 shape (promotion effect): the share of one month's
    // gross revenue that came from promo parts. ONE conditional
    // aggregation (when() inside the sum — no second scan, no join
    // back); both legs snap to 2 decimals and the percentage is then a
    // single correctly-rounded double division — deterministic without
    // rounding the ratio itself. The month predicate prunes the
    // lineitem scan; part is the broadcast side while it fits.
    "q164_promo_effect" -> ((s, d) => {
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-03-01"))
          && col("l_shipdate") < to_timestamp(lit("1996-04-01")))
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))), 2)
            .as("promo_revenue"),
          round(sum(rev), 2).as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          (lit(100.0) * col("promo_revenue") / col("total_revenue"))
            .as("promo_pct"))
    }),

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    // three (brand, size-range, quantity-range) disjuncts OR-ed into
    // one scalar revenue. The point at scale is WHERE the predicate
    // runs: brand/size conjuncts bind to the part side and quantity to
    // the lineitem side BEFORE the join (Catalyst pushes each
    // disjunct's single-side implicates through the OR), and the join
    // itself stays a plain partkey equi-join — no cross-predicate
    // explosion. Single-row output, 2-decimal snap on the one sum.
    "q165_disjunct_revenue" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"))
      val p = Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
            && col("l_quantity").between(1, 11))
            || (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
              && col("l_quantity").between(10, 20))
            || (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
              && col("l_quantity").between(20, 30)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    })
  )

  def oracle: Map[String, String] = Map(
    // the salt is an implementation detail: the oracle is the PLAIN
    // join — green proves the salted rewrite is lossless.
    "q130_salted_join" ->
      """SELECT s_suppkey, s_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name
        |ORDER BY s_suppkey""".stripMargin,

    "q107_shipping_priority" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-06-01'
        |  AND l_shipdate > TIMESTAMP '1996-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q108_local_volume" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q106_merge_upsert" ->
      """WITH base AS (SELECT c_custkey AS k, c_name AS name,
        |    c_acctbal AS bal, c_mktsegment AS seg FROM customer),
        |chg AS (
        |  SELECT k AS ck, name AS cname, bal + 100.0 AS cbal,
        |    'UPDATED' AS cseg FROM base WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k + 1000000 AS ck, 'new-' || k AS cname, 0.0 AS cbal,
        |    'NEW' AS cseg FROM base WHERE k % 97 = 0)
        |SELECT coalesce(k, ck) AS k,
        |  coalesce(cname, name) AS name,
        |  coalesce(cbal, bal) AS bal,
        |  coalesce(cseg, seg) AS seg,
        |  CASE WHEN k IS NULL THEN 'insert'
        |    WHEN ck IS NULL THEN 'keep' ELSE 'update' END AS op
        |FROM base FULL OUTER JOIN chg ON k = ck
        |ORDER BY k""".stripMargin,

    "q20_join_inner" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q21_join_left" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q22_join_right" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q23_join_full" ->
      """WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000.0),
        |  auto AS (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        |SELECT o_custkey, c_custkey, c_name
        |FROM big FULL OUTER JOIN auto ON o_custkey = c_custkey
        |ORDER BY o_custkey ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,

    "q24_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q25_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q26_join_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,

    "q27_join_multikey" ->
      """SELECT a.l_orderkey AS ak, a.l_linenumber AS al, a.l_quantity, b.l_extendedprice
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
        |WHERE b.l_extendedprice > 30000.0
        |ORDER BY ak, al""".stripMargin,

    "q28_join_stringkey" ->
      """WITH stats AS (SELECT lang AS lang2, count(*) AS lang_docs,
        |    sum(n_chars) AS lang_sum_chars FROM documents GROUP BY lang)
        |SELECT doc_id, lang, n_chars, lang_docs
        |FROM documents JOIN stats ON lang = lang2
        |WHERE n_chars * lang_docs * 2 > lang_sum_chars * 3
        |ORDER BY doc_id""".stripMargin,

    "q74_join_asof" ->
      """WITH od AS (SELECT o_custkey, o_orderdate,
        |    max(o_orderkey) AS o_orderkey,
        |    arg_max(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT event_id, user_id, ts,
        |  od.o_orderkey AS a_orderkey, od.o_totalprice AS a_price
        |FROM events ASOF LEFT JOIN od
        |  ON user_id = od.o_custkey AND ts >= od.o_orderdate
        |ORDER BY event_id""".stripMargin,

    // the oracle spells the lookup as DuckDB's native ASOF LEFT JOIN
    // against the run-start stream — the greatest update t <= lookup
    // is exactly the running-last the Spark union computes.
    "q125_pit_lookup" ->
      """WITH r AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |      THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |u AS (SELECT user_id, ts AS t, event_type AS state
        |  FROM r WHERE chg = 1),
        |p AS (SELECT user_id, event_id, ts - INTERVAL 1 HOUR AS lookup_ts
        |  FROM events)
        |SELECT p.user_id, p.event_id, p.lookup_ts, u.state AS state_at
        |FROM p ASOF LEFT JOIN u
        |  ON p.user_id = u.user_id AND p.lookup_ts >= u.t
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q29_join_theta" ->
      """SELECT l_returnflag, count(*) AS n_late,
        |  round(sum(l_extendedprice), 2) AS late_value
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 100 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q29b_join_banded" ->
      """WITH n AS (
        |  SELECT a.event_id AS id, count(*) AS n_near,
        |    round(sum(b.value), 4) AS v_near
        |  FROM events a JOIN events b
        |    ON abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
        |   AND a.event_id <> b.event_id
        |  GROUP BY a.event_id)
        |SELECT e.event_id,
        |  CAST(coalesce(n.n_near, 0) AS BIGINT) AS n_near,
        |  coalesce(n.v_near, 0.0) AS v_near
        |FROM events e LEFT JOIN n ON e.event_id = n.id
        |ORDER BY e.event_id""".stripMargin,

    "q151_cooccurrence" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |cnt AS (SELECT l_partkey, count(*) AS n_item FROM li GROUP BY 1),
        |no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
        |p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    count(*) AS n_pair
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT part_a, part_b, CAST(n_pair AS BIGINT) AS n_pair,
        |  CAST(ca.n_item AS BIGINT) AS n_a,
        |  CAST(cb.n_item AS BIGINT) AS n_b,
        |  CAST(n_pair * n_orders AS DOUBLE)
        |    / CAST(ca.n_item * cb.n_item AS DOUBLE) AS lift
        |FROM p
        |JOIN cnt ca ON ca.l_partkey = p.part_a
        |JOIN cnt cb ON cb.l_partkey = p.part_b, no
        |ORDER BY part_a, part_b""".stripMargin,

    "q160_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  round(sum(volume), 2) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |    AND c_nationkey = n2.n_nationkey
        |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q163_returns_report" ->
      """SELECT c_custkey, c_name,
        |  CAST(round(sum(l_extendedprice::DECIMAL(12,2)
        |      * (1 - l_discount::DECIMAL(12,2))), 2)
        |    AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q164_promo_effect" ->
      """SELECT
        |  round(sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount)
        |    ELSE 0.0::DOUBLE END), 2) AS promo_revenue,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2)
        |    AS total_revenue,
        |  100.0::DOUBLE
        |    * round(sum(CASE WHEN p_type = 'PROMO'
        |        THEN l_extendedprice * (1 - l_discount)
        |        ELSE 0.0::DOUBLE END), 2)
        |    / round(sum(l_extendedprice * (1 - l_discount)), 2)
        |    AS promo_pct
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "q165_disjunct_revenue" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
        |    AS revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |      AND l_quantity BETWEEN 1 AND 11)
        |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |      AND l_quantity BETWEEN 10 AND 20)
        |    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |      AND l_quantity BETWEEN 20 AND 30))""".stripMargin
  )
}
