package graft.queries

import graft.{QueryModule, Tables}
import graft.ops.DistributedRank
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregations (SURVEY.md §2.6) — the reference's full declared enum
  * (expression.rs:696-710): Sum, Max, Min, Avg, Count, CountDistinct,
  * First, Last, Kurtosis, Skewness, StdDev, SumDistinct, Variance.
  * Group-by execution panics in the reference (evaluation.rs:126); here
  * it is Spark's native partial+final hash aggregate — map-side combine
  * means the shuffle carries |groups|·|partitions| rows, not |rows|.
  * Cube/rollup/grouping-sets (absent in the reference) are exposed too.
  *
  * First/Last are made deterministic via min_by/max_by over a unique
  * ordering key — unordered first() is partition-order-dependent and can
  * never be oracle-verified.
  */
object Aggregates extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_agg_basic" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("n_rows"),
          count(col("l_quantity")).as("n_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q31_agg_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey"), col("l_partkey")).as("nd_ps"),
          round(sum_distinct(col("l_quantity")), 2).as("sumd_qty"))
        .orderBy(col("l_returnflag"))),

    // first/last by explicit order — deterministic: ordkey is unique and
    // exact-integer on both engines (epoch seconds ≤ ~9e8, orderkey < 1e9
    // ⇒ key < 9.3e17 < Long.MaxValue; the oracle casts epoch() to BIGINT
    // before multiplying so DuckDB never rounds in DOUBLE).
    "q32_agg_first_last" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("ordkey",
          unix_timestamp(col("o_orderdate")) * lit(1000000000L) + col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(
          min_by(col("o_totalprice"), col("ordkey")).as("first_price"),
          max_by(col("o_totalprice"), col("ordkey")).as("last_price"),
          min(col("o_orderdate")).as("first_date"),
          max(col("o_orderdate")).as("last_date"))
        .orderBy(col("o_orderstatus"))),

    // sample stddev/variance + population variants (Spark stddev =
    // stddev_samp, matching DuckDB). corr is NOT the builtin
    // aggregate: Spark's Corr divides by √(xMk·yMk) inside the
    // aggregate's eval, which ANSI-throws DIVIDE_BY_ZERO the moment a
    // group has zero variance (degenerate-corpus probe, r14) and no
    // projection-level guard can reach it — so it is decomposed into
    // covar_pop/(σx·σy) on the SAME central co-moments, NULL-guarded,
    // with the identical decomposition mirrored in the oracle.
    "q33_agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev(col("l_quantity")), 6).as("sd_samp"),
          round(stddev_pop(col("l_quantity")), 6).as("sd_pop"),
          round(variance(col("l_quantity")), 6).as("var_samp"),
          round(var_pop(col("l_quantity")), 6).as("var_pop"),
          covar_pop(col("l_quantity"), col("l_extendedprice")).as("cv"),
          stddev_pop(col("l_quantity")).as("sq"),
          stddev_pop(col("l_extendedprice")).as("sp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"))
        .select(col("l_returnflag"), col("sd_samp"), col("sd_pop"),
          col("var_samp"), col("var_pop"),
          when(col("sq") * col("sp") > 0,
            round(col("cv") / (col("sq") * col("sp")), 6)).as("corr_qp"),
          col("cov_qp"))
        .orderBy(col("l_returnflag"))),

    // EXACT distinct counting via bitmaps — the mergeable form: stage 1
    // builds one 32k-bit bitmap per (group, key-bucket) with map-side
    // combine, stage 2 sums popcounts. Only fixed-size bitmaps cross
    // the shuffle (|groups|·|buckets| of them), never raw keys — the
    // way to count distinct ids per segment at 100 TB without the
    // count(DISTINCT) expand-and-reshuffle, and unlike HLL it is exact,
    // so the oracle is plain count(DISTINCT).
    "q31b_bitmap_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          expr("bitmap_bucket_number(l_orderkey)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_orderkey))")
          .as("bm"))
        .groupBy(col("l_returnflag"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
        .orderBy(col("l_returnflag"))),

    // remaining aggregate catalogue: boolean quantifiers, bitwise
    // reductions, exact interpolated median, and the full linear-
    // regression family (slope/intercept/r2/count/avgx/avgy/sxx/sxy) —
    // all single-pass partial-aggregable, so the shuffle carries one
    // moment tuple per group, not rows.
    "q33b_agg_extras" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          bool_and(col("l_quantity") > 1).as("k_booland"),
          bool_or(col("l_discount") === 0).as("k_boolor"),
          bit_and(col("l_linenumber")).as("k_bitand"),
          bit_or(col("l_linenumber")).as("k_bitor"),
          bit_xor(col("l_linenumber")).as("k_bitxor"),
          median(col("l_quantity")).as("k_median"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6)
            .as("k_slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6)
            .as("k_icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
            .as("k_r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("k_rcount"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 6)
            .as("k_avgx"),
          round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 6)
            .as("k_avgy"),
          round(regr_sxx(col("l_extendedprice"), col("l_quantity")), 2)
            .as("k_sxx"),
          round(regr_sxy(col("l_extendedprice"), col("l_quantity")), 2)
            .as("k_sxy"))
        .orderBy(col("l_returnflag"))),

    // listagg (Spark 4 / ANSI): ordered DISTINCT group concatenation —
    // deterministic only with WITHIN GROUP (ORDER BY), which both
    // engines support. mode() runs over parity (odd linenumbers are 4
    // of 7 values, structurally the majority at any SF) because mode
    // over a column with near-tied frequencies is engine-arbitrary on
    // ties — never oracle a tie-able mode.
    // The DISTINCT listagg and the mode()s ride separate aggregations
    // joined on the 3-row key: fused, the distinct rewrite would key
    // the first phase on (l_returnflag, l_linestatus) and build mode
    // buffers per distinct-key group. Harmless HERE (l_linestatus has
    // 3 values), but the PlanShapeSpec sweep bans the fused shape
    // catalog-wide because its cost is silently proportional to the
    // distinct key's cardinality (q39's partkey made it an OOM shape).
    "q33c_listagg_mode" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val la = li.groupBy(col("l_returnflag"))
        .agg(
          expr("listagg(DISTINCT l_linestatus, ',') WITHIN GROUP (ORDER BY l_linestatus)")
            .as("k_listagg"))
      val modes = li.groupBy(col("l_returnflag"))
        .agg(
          expr("mode(l_linenumber % 2)").as("k_mode"),
          expr("mode() WITHIN GROUP (ORDER BY l_linenumber % 2)")
            .as("k_mode_wg"))
      la.join(modes, Seq("l_returnflag"))
        .orderBy(col("l_returnflag"))
    }),

    // Spark skewness/kurtosis are population g1 / excess g2; the oracle
    // spells out the moment formulas (DuckDB's builtins use the sample-
    // adjusted estimators, so they are NOT name-compatible).
    "q34_agg_skew_kurt" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(skewness(col("l_quantity")), 6).as("skew_qty"),
          round(kurtosis(col("l_quantity")), 6).as("kurt_qty"))
        .orderBy(col("l_returnflag"))),

    // whole-frame aggregation, no grouping (the reference's per-column
    // kernels, functions/aggregate.rs).
    "q35_agg_global" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n"),
          countDistinct(col("l_orderkey")).as("nd_orders"))),

    "q36_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q37_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // native Dataset.groupingSets (Spark 4) — no temp view leaked into
    // the shared session.
    "q38_grouping_sets" -> ((s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // sketches: HyperLogLog distinct + approximate percentiles,
    // SELF-VERIFYING: the sketch estimates have no bit-exact DuckDB
    // twin, so the query folds each estimate into a tolerance boolean
    // against the exact value computed over the same table — the
    // oracle then emits (exact, TRUE, TRUE) and a green row proves the
    // sketches landed inside tolerance. rsd=0.01 (1σ) against a 5%
    // gate is a 5σ bound, and both sketches are deterministic
    // (hash-based), so the row is stable, not flaky. Exact quantiles
    // are additionally pinned in q39b via percentile().
    //
    // SHAPE CONSTRAINT (round-7 postmortem, 37% of the whole bench):
    // the exact-distinct must NOT share an .agg with the sketch/
    // percentile aggregates. Spark's distinct-aggregate rewrite keys
    // the first aggregation phase on (group key, distinct key) — so a
    // fused form builds a 2^14-register HLL++, a QuantileSummaries,
    // and an exact percentile map PER PARTKEY (~200k heavy object
    // buffers shuffled and merged; an OOM at cluster scale, 70 s at
    // sf0.1). Split into two 3-row aggregations joined on
    // l_returnflag, each phase keys only on a bounded group.
    // PlanShapeSpec sweeps the whole catalog for the fused shape.
    //
    // The exact leg uses the q31b bitmap form rather than
    // count_distinct: the distinct rewrite shuffles every distinct
    // (flag, partkey) PAIR, while the bitmap form shuffles one 4 KB
    // bitmap per (flag, 32768-key bucket) — a 32768× row compression
    // at 100 TB partkey cardinality. A fully-fused single-scan form
    // was evaluated and rejected: bitmap_construct_agg only accepts
    // positions 1..32768, so at scale the bucket number must be a
    // group-by key (it can't sit in the sketch .agg keyed on the
    // 3-value flag alone), and percentile/percentile_approx expose no
    // SQL-level mergeable partial, so the percentile leg needs its own
    // pass regardless. Two scans of a projected 3-column slice is the
    // honest floor here.
    "q39_approx_sketch" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val exact = li
        .groupBy(col("l_returnflag"),
          expr("bitmap_bucket_number(l_partkey)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))")
          .as("bm"))
        .groupBy(col("l_returnflag"))
        .agg(sum(expr("bitmap_count(bm)")).as("exact_parts"))
      // p50_exact via exactPercentiles (round 14, the q39b rationale) —
      // the approx sketches stay in the grouped agg, the exact median
      // joins in from the deduped-value rank frame, bit-identical to
      // percentile(l_extendedprice, 0.5).
      val sketch = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("acd_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_approx"))
        .join(graft.ops.DistributedRank.exactPercentiles(
            li.select(col("l_returnflag"), col("l_extendedprice")),
            col("l_extendedprice"), Seq(0.5), Seq("l_returnflag"))
          .select(col("l_returnflag"),
            element_at(col("ps"), 1).as("p50_exact")),
          Seq("l_returnflag"))
      exact.join(sketch, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("acd_parts") - col("exact_parts"))
            <= col("exact_parts") * 0.05).as("acd_within_5pct"),
          (abs(col("p50_approx") - col("p50_exact"))
            <= abs(col("p50_exact")) * 0.05).as("p50_within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    // skew-safe two-stage aggregation: event_type has ~6 hot values, so
    // a direct groupBy at cluster scale funnels each key through one
    // reducer. Salting by a deterministic row attribute fans each hot
    // key across 16 partial groups (map-side combine still applies),
    // then the tiny (key × salt) rollup collapses to the final answer.
    // Results equal the direct group-by (the oracle) — rounded to absorb
    // the two-level vs one-level double summation order.
    "q75_salted_agg" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(16L)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
        .groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"), round(sum(col("pv")), 4).as("total"))
        .orderBy(col("event_type"))),

    // Sketch-as-DATA rollup: what makes approx-distinct usable at
    // 100 TB is not the one-shot estimate (q39) but the MERGEABLE
    // partial — per-shard HLL sketches computed once, persisted as
    // plain binary columns, and unioned later to answer any
    // cross-shard distinct question from kilobytes of sketch instead
    // of a corpus rescan (the Datasketches rollup pattern: daily
    // shards → any date range, no second pass over the data). The
    // query proves the full lifecycle: shard sketches (groupBy
    // event_type), parquet round-trip (a sketch is storable bytes,
    // not an engine-resident object), hll_union_agg reading from
    // DISK, estimate checked against the exact distinct. The
    // engine-specific estimates fold into oracle-reproducible
    // tolerance booleans (the q39/q56 recipe); merged-vs-direct
    // EQUALITY is deliberately not asserted — sparse/dense union
    // estimation differs (SketchSpec documents this); the contract is
    // that both land inside the envelope.
    "q115_sketch_rollup" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val dir =
        s"target/tmp/agg/${d.replaceAll("[^A-Za-z0-9.]", "_")}/hll_shards"
      ev.groupBy(col("event_type"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
          count(lit(1)).as("n_rows"))
        .write.mode("overwrite").parquet(dir)
      val merged = s.read.parquet(dir).agg(
        count(lit(1)).as("n_shards"),
        sum(col("n_rows")).as("rows_total"),
        // every shard was built at lgK 12, so the strict union (no
        // allowDifferentLgConfigK) is the right default.
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_merged"))
      val direct = ev.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
          .as("est_direct"))
      val exact = ev.agg(count_distinct(col("user_id")).as("exact_users"))
      merged.crossJoin(broadcast(direct)).crossJoin(broadcast(exact))
        .select(col("n_shards"), col("rows_total"), col("exact_users"),
          (abs(col("est_merged") - col("exact_users"))
            <= col("exact_users") * 0.05).as("merged_within_5pct"),
          (abs(col("est_direct") - col("exact_users"))
            <= col("exact_users") * 0.05).as("direct_within_5pct"))
    }),

    // A/B experiment readout (Welch's t) — the decision table every
    // experimentation platform serves: users deterministically
    // hash-assigned to two variants (the q100/q105 affine hash — NOT
    // rand(), so assignment is reproducible and consistent across
    // reruns), per-user metric = 4-rounded value sum, then ONE
    // conditional aggregation computes both variants' n/mean/variance
    // in a single pass (avg/var FILTER-style via when(), no pivot, no
    // second scan) and Welch's t from the 6-snapped components —
    // correctly-rounded double chain, identical cross-engine. Scale
    // shape: per-user pre-agg shuffles on user_id (map-side combined);
    // the variant roll-up is a 1-row global aggregate.
    "q143_ab_test" -> ((s, d) => {
      val metrics = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(round(sum(col("value")), 4).as("m"))
        .withColumn("v",
          pmod(col("user_id") * 2654435761L + 7919L, lit(2)))
      def snap6(c: org.apache.spark.sql.Column) =
        floor(c * 1e6 + 0.5) / 1e6
      val r = metrics.agg(
        count(when(col("v") === 0, 1)).as("n_a"),
        count(when(col("v") === 1, 1)).as("n_b"),
        snap6(avg(when(col("v") === 0, col("m")))).as("mean_a"),
        snap6(avg(when(col("v") === 1, col("m")))).as("mean_b"),
        snap6(var_samp(when(col("v") === 0, col("m")))).as("var_a"),
        snap6(var_samp(when(col("v") === 1, col("m")))).as("var_b"))
      r.select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        ((col("mean_a") - col("mean_b"))
          / sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")))
          .as("t_stat"))
        .withColumn("significant", abs(col("t_stat")) > 1.96)
    }),

    // Rolling 7-day distinct users — the trailing-window approx-distinct
    // every activity dashboard serves, built the only way it scales:
    // count(DISTINCT) is not window-mergeable (each of 365 overlapping
    // windows would re-scan its 7 days of raw events at 100 TB), but
    // HLL sketches are — one kilobyte-sized sketch per DAY (the only
    // corpus-wide pass, map-side combined), then each day's sketch
    // fans out to the ≤7 window anchors it serves (a bounded |days|×7
    // explode of 4 KB rows) and hll_union_agg merges 7 sketches per
    // anchor. The estimate folds into the q115 5%-envelope boolean
    // against the exact trailing count, which the query computes the
    // same fan-out way over the distinct (user, day) frame — and the
    // oracle reproduces exactly.
    "q134_rolling_hll" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val days = ev.select(col("day")).distinct()
      val daily = ev.groupBy(col("day"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val rolled = daily
        .select(explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("d"), col("sk"))
        .groupBy(col("d"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = ev.distinct()
        .select(explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("d"), col("user_id"))
        .groupBy(col("d"))
        .agg(count_distinct(col("user_id")).as("exact_7d"))
      days.join(rolled, col("day") === rolled("d")).drop("d")
        .join(exact, col("day") === exact("d")).drop("d")
        .select(col("day"), col("exact_7d"),
          (abs(col("est") - col("exact_7d")) <= col("exact_7d") * 0.05)
            .as("est_within_5pct"))
        .orderBy(col("day"))
    }),

    // Incremental materialized-view maintenance — the exact-aggregate
    // complement of q115's mergeable sketches, and the pattern that
    // turns a nightly 100 TB re-aggregation into a delta-sized job:
    // closed history is aggregated ONCE into persisted per-key partials
    // (count + DECIMAL sum — decimal addition is associative and
    // order-free, so partials merge exactly; double sums would drift),
    // and a refresh re-aggregates state ∪ delta-partials. The refresh
    // plan scans the kilobyte-scale state file plus ONLY the delta
    // slice of the fact table — the `>= cutoff` predicate reaches the
    // parquet scan (PlanShapeSpec pins the pushed filter and the
    // absence of any history re-scan), so refresh cost is O(delta),
    // not O(history). The oracle recomputes the view from scratch over
    // the full table: incremental must equal full, to the exact cent.
    "q122_incremental_mv" -> ((s, d) => {
      val cutoff = lit("2001-01-01 00:00:00").cast("timestamp")
      val dir =
        s"target/tmp/agg/${d.replaceAll("[^A-Za-z0-9.]", "_")}/mv_state"
      val price = col("o_totalprice").cast("decimal(14,2)")
      def partials(df: DataFrame) = df
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(price).cast("decimal(24,2)").as("total"))
      partials(Tables.orders(s, d).filter(col("o_orderdate") < cutoff))
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .unionByName(partials(
          Tables.orders(s, d).filter(col("o_orderdate") >= cutoff)))
        .groupBy(col("o_custkey"))
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("total")).cast("decimal(14,2)").cast("string")
            .as("total"))
        .orderBy(col("o_custkey"))
    }),

    // Equi-depth histogram — the complement of q18's equi-width bins,
    // and the statistic a range-partitioner / CBO actually wants
    // (equal ROW counts per bucket, not equal value spans). The
    // scale-correct construction: NOT a global ntile (a single-
    // partition total sort at 100 TB) but one percentile(col,
    // array(1/16..15/16)) aggregate — a single value→count map per
    // scan — whose 15 bounds broadcast back; bucket assignment is a
    // per-row count-of-bounds-below (a 15-element HOF against the
    // broadcast array, zero extra shuffles), then a 16-group
    // re-profile. Bounds are 4-decimal-rounded before assignment so
    // bucket membership is bit-identical cross-engine.
    "q136_equidepth_hist" -> ((s, d) => {
      // Exact percentile bounds WITHOUT the Percentile aggregate
      // (round 14): `percentile(x, array(...))` builds a value→count
      // OpenHashMap in every partial buffer and merges them all into
      // ONE final buffer — task memory grows with the distinct-value
      // count, the 100 TB OOM the rest of this file avoids. The same
      // numbers come from the deduped (x, count) frame with a
      // DistributedRank cumulative count: Spark's interpolation
      // (PercentileBase.getPercentile, read from the 4.1.2 bytecode)
      // is pos = (n−1)·p, lo/hi = floor/ceil(pos), v@rank = smallest
      // x whose cumulative count ≥ rank+1, and
      // (hi−pos)·v_lo + (pos−lo)·v_hi with two SHORT-CIRCUITS — pos
      // integral, or v_lo == v_hi, both return v_lo directly (the
      // interpolated form can differ in the last ulp there, so the
      // guards are part of bit-equality, not style). Verified
      // hash-identical against the oracle at all three SFs.
      val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("x"))
      val bounds = graft.ops.DistributedRank.exactPercentiles(
          li, col("x"), (1 to 15).map(i => i / 16.0))
        .select(transform(col("ps"), b => round(b, 4)).as("bs"))
      li.crossJoin(broadcast(bounds))
        .select(col("x"),
          size(filter(col("bs"), b => col("x") > b)).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("x")).as("min_x"),
          max(col("x")).as("max_x"), round(sum(col("x")), 2).as("sum_x"))
        .orderBy(col("bucket"))
    }),

    // Winsorization (percentile outlier clipping) — the robust-stats
    // preprocessing step every feature pipeline runs before
    // normalization: per-group p05/p95 bounds computed once (3-row
    // frame), broadcast back, values clamped, clipped distribution
    // re-profiled. Two passes over a 2-column projection: the bounds
    // aggregation keys on the bounded group (the q39b one-call
    // percentile(col, array(...)) form — one value→count map per
    // group), and the clip pass is a per-row CASE against the
    // broadcast bounds — no second wide shuffle; the re-profile keys
    // on the same 3-value group. Bounds are 4-decimal-rounded before
    // the clip so the clamped doubles (and min/max, which land exactly
    // ON a bound when clipping fired) are bit-identical cross-engine.
    "q132_winsorize" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
      // bounds via exactPercentiles (round 14, the q39b rationale):
      // bit-identical to the grouped percentile aggregate without its
      // per-group value-map buffer.
      val bounds = graft.ops.DistributedRank.exactPercentiles(
          li, col("l_extendedprice"), Seq(0.05, 0.95), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("lo"),
          round(element_at(col("ps"), 2), 4).as("hi"))
      val x = col("l_extendedprice")
      li.join(broadcast(bounds), "l_returnflag")
        .withColumn("clipped",
          when(x < col("lo"), col("lo"))
            .when(x > col("hi"), col("hi")).otherwise(x))
        .groupBy(col("l_returnflag"))
        .agg(first(col("lo")).as("lo"), first(col("hi")).as("hi"),
          count(lit(1)).as("n"),
          sum(when(x < col("lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
          sum(when(x > col("hi"), 1L).otherwise(0L)).as("n_clipped_hi"),
          round(sum(col("clipped")), 2).as("sum_clipped"),
          round(avg(col("clipped")), 4).as("avg_clipped"),
          min(col("clipped")).as("min_clipped"),
          max(col("clipped")).as("max_clipped"))
        .orderBy(col("l_returnflag"))
    }),

    // Supplier market concentration per nation (Herfindahl-Hirschman
    // index) — the antitrust-flavored companion to q179's Gini:
    // HHI = Σ share² over each nation's suppliers, here computed
    // WITHOUT any order-sensitive float summation: revenues convert to
    // exact integer CENTS (the q179 recipe), each supplier's cents²
    // accumulates in DECIMAL(38,0) (exact — a long would overflow at
    // 100 TB where one supplier's cents² passes 2⁶³), and
    // HHI = Σc² / (Σc)² is one double division, 6-decimal-snapped:
    // Σc² exceeds 2⁵³, and Spark's BigDecimal→double conversion can
    // sit one ulp off DuckDB's HUGEINT→double there (measured at
    // sf0.01 — a 1e-9-relative WARN), so the ratio gets the q110 snap
    // both engines share. Scale shape: corpus collapses to the
    // per-supplier frame first (one keyed aggregation); the
    // per-nation roll-up runs on the \|suppliers\| frame.
    "q213_supplier_hhi" -> ((s, d) => {
      val perSupp = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"), col("s_suppkey"))
        .agg((sum(col("l_extendedprice").cast("decimal(12,2)")
            * (lit(1).cast("decimal(12,2)")
              - col("l_discount").cast("decimal(12,2)")))
          .cast("decimal(18,2)") * 100).cast("decimal(20,0)").as("cents"))
      perSupp.groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("cents")).as("sum_c"),
          sum((col("cents") * col("cents")).cast("decimal(38,0)"))
            .as("sum_c2"))
        .select(col("s_nationkey"), col("n_suppliers"),
          (floor(col("sum_c2").cast("double")
            / (col("sum_c").cast("double") * col("sum_c").cast("double"))
            * 1e6 + 0.5) / 1e6).as("hhi"))
        .orderBy(col("s_nationkey"))
    }),

    // Discount-depth response curve — the pricing-analytics readout:
    // for each of the 11 discrete discount levels, how much volume
    // moves and what share of revenue it carries (the input to "is
    // discounting buying volume or just giving margin away"). ONE
    // corpus-scale aggregation to the ≤11-row discount frame:
    // quantities are integral doubles (exact sums any order), revenue
    // accumulates in exact decimal, the revenue share re-aggregates
    // the tiny frame through a 1-row broadcast, and avg/share divide
    // exact operands once.
    "q212_discount_response" -> ((s, d) => {
      val g = Tables.lineitem(s, d)
        .groupBy(col("l_discount"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(12,2)")
              * (lit(1).cast("decimal(12,2)")
                - col("l_discount").cast("decimal(12,2)")))
            .cast("decimal(18,2)").as("rev_dec"))
      val tot = g.agg(sum(col("rev_dec")).as("total_dec"))
      g.crossJoin(broadcast(tot))
        .select(col("l_discount"), col("n_lines"),
          (col("sum_qty") / col("n_lines").cast("double")).as("avg_qty"),
          col("rev_dec").cast("double").as("revenue"),
          (col("rev_dec").cast("double") / col("total_dec").cast("double"))
            .as("rev_share"))
        .orderBy(col("l_discount"))
    }),

    "q39b_percentile_exact" -> ((s, d) =>
      // exact percentiles via DistributedRank.exactPercentiles
      // (round 14): the Percentile aggregate's per-group value→count
      // map buffer holds each flag's whole distinct-value set in one
      // task at 100 TB; the deduped-value rank form is bit-identical
      // (helper doc) and keeps every task corpus/partitions-sized.
      graft.ops.DistributedRank.exactPercentiles(
          Tables.lineitem(s, d)
            .select(col("l_returnflag"), col("l_extendedprice")),
          col("l_extendedprice"), Seq(0.5, 0.9), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p50"),
          round(element_at(col("ps"), 2), 4).as("p90"))
        .orderBy(col("l_returnflag"))),

    // pivot: long→wide with explicit value list (explicit values keep
    // the plan a single pass — value discovery would add a collect) —
    // the oracle is the FILTER-aggregate spelling pivot desugars to.
    "q86_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .orderBy(col("l_returnflag"))),

    // unpivot (melt): wide→long, the inverse reshape; value columns
    // share one type (cast to long) as unpivot requires.
    "q87_unpivot" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast("long").as("size_v"),
          pmod(col("p_partkey"), lit(10L)).as("mod_v"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size_v"), col("mod_v")), "metric", "value")
        .orderBy(col("p_partkey"), col("metric"))),

    // Chi-square test of independence (brand × return flag) — the
    // categorical complement to q143's Welch t-test: does return
    // behavior depend on brand? One corpus aggregation to the
    // contingency cells (≤|brands|·|flags| rows), then margins via
    // window sums over the CELL frame — these are LONG sums, exact in
    // any order, so windows need no ordering. Expected counts and
    // per-cell χ² contributions are long-product→double divisions
    // (row·col ≤ n² < 2⁵³ ⇒ the casts are exact, the ÷ correctly
    // rounded): bit-identical cross-engine, no rounding. The statistic
    // itself is the cells' SUM — that one is order-sensitive, so it is
    // NOT emitted here; sum the chi2_cell column (75 rows) to taste.
    "q157_chi_square" -> ((s, d) => {
      val cells = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_returnflag"))
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_returnflag"))
        .agg(count(lit(1)).as("observed"))
      val wb = Window.partitionBy(col("p_brand"))
      val wf = Window.partitionBy(col("l_returnflag"))
      val wAll = Window.partitionBy()
      cells
        .withColumn("row_n", sum(col("observed")).over(wb))
        .withColumn("col_n", sum(col("observed")).over(wf))
        .withColumn("total_n", sum(col("observed")).over(wAll))
        .withColumn("expected",
          (col("row_n") * col("col_n")).cast("double") /
            col("total_n").cast("double"))
        .withColumn("chi2_cell",
          (col("observed").cast("double") - col("expected")) *
            (col("observed").cast("double") - col("expected")) /
            col("expected"))
        .select(col("p_brand"), col("l_returnflag"), col("observed"),
          col("expected"), col("chi2_cell"))
        .orderBy(col("p_brand"), col("l_returnflag"))
    }),

    // Mann-Whitney U (rank-sum) per event type vs rest — the
    // nonparametric third leg of the test family (q143 Welch t
    // assumes normal-ish means, q157 χ² wants categories; rank-sum
    // asks "does this type's value distribution stochastically
    // dominate the rest" with no distribution assumption). One pooled
    // rank frame serves all five one-vs-rest comparisons. All
    // arithmetic stays in exact integer space: ties get AVERAGE rank,
    // carried as 2·rank (= 2·cum_before + cnt + 1, an exact long), and
    // the rank-sum accumulates in DECIMAL(38,0) (Σ ca·rank2 ~ 2N² —
    // longs overflow at ~2^31.5 rows; the q213 recipe). The emitted
    // U and AUC (common-language effect size, P(A>B)+½P(=)) are
    // single divisions of exact operands, 6-snapped because operands
    // can exceed 2^53 at corpus scale (the q213 decimal→double ulp
    // trap). Scale shape: map-side-combined (value, type) counts; the
    // global rank window runs over the BOUNDED distinct-value frame
    // (2-decimal money values), never corpus rows.
    "q231_mannwhitney" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      // every downstream quantity derives from ONE (value, type) count
      // frame via windows — a groupBy-totals + join-back would
      // instantiate the corpus subtree three times (measured 2 scans
      // even with exchange reuse; the q192/q195 rewrite principle).
      // The ordered RANGE window sums peers-inclusive, i.e. all rows
      // with value ≤ v — exactly the pooled cumulative count.
      val byVal = Tables.events(s, d)
        .groupBy(col("value"), col("event_type"))
        .agg(count(lit(1)).as("ca"))
      val wVal = Window.partitionBy(col("value"))
      val wOrd = Window.orderBy(col("value"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      byVal
        .withColumn("cv", sum(col("ca")).over(wVal))
        .withColumn("cum", sum(col("ca")).over(wOrd))
        .withColumn("rank2",
          lit(2L) * (col("cum") - col("cv")) + col("cv") + 1L)
        .groupBy(col("event_type"))
        .agg(sum(col("ca")).as("n_a"),
          sum(col("ca").cast("decimal(38,0)")
            * col("rank2").cast("decimal(38,0)")).as("r2a"))
        .withColumn("n_b", sum(col("n_a")).over(wAll) - col("n_a"))
        .withColumn("u2", (col("r2a")
          - col("n_a").cast("decimal(38,0)")
            * (col("n_a") + 1L).cast("decimal(38,0)")).cast("double"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          snap6(col("u2") / lit(2.0)).as("u_stat"),
          // a lone event type has an empty "rest" side: AUC undefined
          // → NULL, never an ANSI ÷0 (degenerate probe)
          when(col("n_b") > 0,
            snap6(col("u2") / (lit(2.0) * col("n_a").cast("double")
              * col("n_b").cast("double")))).as("auc"))
        .orderBy(col("event_type"))
    }),

    // Spearman rank correlation per market segment — does account
    // balance track realized spend? The rank-based companion to
    // Pearson (q167's rolling form): monotone-association, outlier-
    // robust, no linearity assumption. Exactness: spend sums in
    // DECIMAL (a double sum would make the RANK order-sensitive —
    // the whole statistic would wobble under partitioning); average
    // ranks carried as exact-long 2·rank (q231 recipe) via peers-
    // inclusive RANGE windows; rank deviations center EXACTLY
    // (Σ rank2 = n(n+1), so mean rank2 = n+1 is an integer) which
    // kills every n·ΣxΣy cross-term — ρ = Σdxdy / √(Σdx²·Σdy²) with
    // the sums in DECIMAL(38,0) via decimal(19) products (q204
    // recipe; dx ≤ 2n keeps products inside 38 digits to n ~ 1e9)
    // and the final ratio 6-snapped (decimal→double above 2^53 is
    // the q213 ulp trap). Scale shape: orders pre-aggregate to
    // per-customer before the join; rank windows run per segment
    // over the customer dimension — the canonical rank shape.
    "q236_spearman" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("spend"))
      // per-invocation checkpoint (the q300 rationale): both rank maps
      // and the join-back probe side consume base — lazily it would
      // re-plan the customer⋈spend subtree three times.
      val base = Tables.customer(s, d)
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_mktsegment").as("seg"), col("c_acctbal").as("x"),
          coalesce(col("spend"), lit(0).cast("decimal(22,2)")).as("y"))
        .localCheckpoint()
      // doubled midranks via DistributedRank over the DEDUPED value
      // frames, hash-joined back (round 14, the q283 recipe): the
      // previous per-row range-frame windows put each segment's whole
      // customer frame through one sort task (5 segments), and the
      // y side (per-customer spend) has no bounded value domain. For
      // value v with cnt rows and run = cumulative rows ≤ v, the
      // doubled midrank 2·(run − cnt) + cnt + 1 is the same exact
      // long the range-frame window produced per row; n rides the
      // map's group total.
      def rankMap(v: String, out: String) =
        graft.ops.DistributedRank.withRank(
            base.groupBy(col("seg"), col(v)).agg(count(lit(1)).as("cnt")),
            Seq(col(v)), Seq("seg"), sums = Seq("cnt" -> col("cnt")))
          .select(col("seg"), col(v),
            (lit(2L) * (col("run_cnt") - col("cnt")) + col("cnt") + 1L)
              .as(out),
            col("tot_cnt").as(s"n_$out"))
      def dec(c: Column): Column = c.cast("decimal(19,0)")
      val ranked = base
        .join(rankMap("x", "r2x"), Seq("seg", "x"))
        .join(rankMap("y", "r2y"), Seq("seg", "y"))
        .withColumn("n", col("n_r2x"))
        .withColumn("dx", col("r2x") - (col("n") + 1L))
        .withColumn("dy", col("r2y") - (col("n") + 1L))
      ranked.groupBy(col("seg"))
        .agg(max(col("n")).as("n_customers"),
          sum(dec(col("dx")) * dec(col("dy"))).as("sxy"),
          sum(dec(col("dx")) * dec(col("dx"))).as("sxx"),
          sum(dec(col("dy")) * dec(col("dy"))).as("syy"))
        .select(col("seg"), col("n_customers"),
          when(col("sxx") > 0 && col("syy") > 0,
            snap6(col("sxy").cast("double")
              / (sqrt(col("sxx").cast("double"))
                * sqrt(col("syy").cast("double")))))
            .otherwise(lit(0.0)).as("rho"))
        .orderBy(col("seg"))
    }),

    // Per-group linear trend + one-step forecast — the capacity-
    // planning readout (is this event type growing, and what does
    // tomorrow look like?): daily value sums (4-rounded — one
    // order-sensitive fold), then least squares per event type over
    // (epoch-day, day_sum). NOT regr_slope(): its internal folds are
    // order-sensitive doubles, and rounding the RESULT still flipped a
    // 6th decimal cross-engine (measured). Instead the five classic
    // component sums: n, Σx, Σx² are exact integers (epoch-days < 2⁵³
    // — any summation order); Σy, Σxy are the only floating folds and
    // snap to 4/2 decimals. slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and
    // the forecast are then fixed-parenthesization products/divisions
    // of snapped values — correctly rounded, bit-identical, NO output
    // rounding at all. Scale shape: the corpus pass is the (type, day)
    // aggregation (map-side combined); the regression runs on the
    // ≤|types|·|days| daily frame, itself map-side combined.
    "q162_trend_forecast" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(round(sum(col("value")), 4).as("day_sum"))
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01").cast("date"))
            .cast("double").as("x"),
          col("day_sum"))
      // a single-day group has zero x-variance: slope undefined →
      // NULL, never an ANSI ÷0 (degenerate probe); icept/forecast
      // propagate the NULL
      val slope = when(
        col("n_days") * col("sxx") - col("sx") * col("sx") > 0,
        (col("n_days") * col("sxy") - col("sx") * col("sy")) /
          (col("n_days") * col("sxx") - col("sx") * col("sx")))
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"),
          round(sum(col("day_sum")), 4).as("sy"),
          round(sum(col("x") * col("day_sum")), 2).as("sxy"),
          max(col("x")).as("max_x"))
        .withColumn("slope", slope)
        .withColumn("icept",
          (col("sy") - col("slope") * col("sx")) / col("n_days"))
        .select(col("event_type"), col("n_days"), col("slope"),
          col("icept"),
          (col("icept") + col("slope") * (col("max_x") + 1))
            .as("forecast_next"))
        .orderBy(col("event_type"))
    }),

    // Weighted median — the quantity-weighted median unit price per
    // brand: the weighted-quantile primitive plain percentile() can't
    // express (each row counts wt times). NOT a per-group sort to the
    // driver — and (r14) not a brand-partitioned window either:
    // |brands| = 25 at every scale, so each brand partition carries
    // corpus/25 rows through ONE sort task. The cumulative LONG
    // weight (quantities are integral — exact in any merge order)
    // rides DistributedRank's prefix sum over the (price, orderkey,
    // linenumber) total order within each brand; the median is the
    // first row where 2·cum ≥ total, selected by a plain min
    // aggregate. Integer cross-multiplication, no division anywhere.
    // Considered and rejected (r14): pre-folding to the
    // (brand, price) weight histogram before the rank — provably the
    // same median (DistributedRankSpec pins the granularity
    // equivalence) and the right shape for a QUANTIZED value domain
    // (2-decimal money: ranked rows collapse to |distinct cents|) —
    // but this corpus's prices are near-unique doubles (599 281
    // distinct (brand, price) over 600 000 rows at sf0.1, measured),
    // so the fold added a full aggregation exchange for a 0.1% row
    // reduction at every scale.
    "q177_weighted_median" -> ((s, d) => {
      val j = Tables.lineitem(s, d)
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_extendedprice").as("price"),
          col("l_quantity").cast("long").as("wt"),
          col("l_orderkey"), col("l_linenumber"))
      DistributedRank.withRank(j,
          Seq(col("price"), col("l_orderkey"), col("l_linenumber")),
          partCols = Seq("p_brand"),
          sums = Seq("wt" -> col("wt")))
        .filter(col("run_wt") * 2 >= col("tot_wt"))
        .groupBy(col("p_brand"))
        .agg(min(col("price")).as("weighted_median_price"),
          max(col("tot_wt")).as("total_weight"))
        .orderBy(col("p_brand"))
    }),

    // Kendall τ-b per event type between daily volume and daily value
    // sum — the concordance leg of the rank-correlation family (q236
    // Spearman measures monotone association via rank deviations; τ-b
    // asks the sharper pairwise question "when volume rose between two
    // days, did value rise too?", with the tie-aware denominator).
    // Exactness: x is an exact long count; y is the daily double sum
    // 4-rounded (the q162 recipe — the one order-sensitive fold, then
    // every comparison is on identical snapped values both engines);
    // concordant/discordant/tie counts are exact longs, and τ-b is one
    // double expression of exact operands, 6-snapped. Scale shape: the
    // corpus pass is the (type, day) aggregation (map-side combined);
    // the pair join runs on the bounded daily frame — |days| is the
    // CALENDAR span of the collection window, which does not grow with
    // corpus rows (30 days at every sf here), so days²·|types| pairs
    // stay a dimension-sized frame at any corpus scale.
    "q288_kendall_tau" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"), round(sum(col("value")), 4).as("y"))
      val b = daily.select(col("event_type").as("et_b"),
        col("day").as("db"), col("x").as("xb"), col("y").as("yb"))
      val pairs = daily.join(b,
        col("event_type") === col("et_b") && col("day") < col("db"))
      def cnt(p: Column): Column = sum(when(p, 1L).otherwise(0L))
      pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          cnt((col("x") < col("xb") && col("y") < col("yb")) ||
            (col("x") > col("xb") && col("y") > col("yb"))).as("concordant"),
          cnt((col("x") < col("xb") && col("y") > col("yb")) ||
            (col("x") > col("xb") && col("y") < col("yb"))).as("discordant"),
          cnt(col("x") === col("xb")).as("ties_x"),
          cnt(col("y") === col("yb")).as("ties_y"))
        .select(col("event_type"), col("n_pairs"), col("concordant"),
          col("discordant"), col("ties_x"), col("ties_y"),
          when(col("n_pairs") > col("ties_x") &&
              col("n_pairs") > col("ties_y"),
            snap6((col("concordant") - col("discordant")).cast("double")
              / sqrt((col("n_pairs") - col("ties_x")).cast("double")
                * (col("n_pairs") - col("ties_y")).cast("double"))))
            .otherwise(lit(null).cast("double")).as("tau_b"))
        .orderBy(col("event_type"))
    }),

    // Kruskal-Wallis H across event types — the k-group extension of
    // q231's two-group rank-sum (one-way ANOVA on ranks: "do the k
    // value distributions share a location?", no normality assumption).
    // Shares q231's pooled-rank shape: ONE (value, type) count frame,
    // average ranks as exact-long 2·rank via peers-inclusive RANGE
    // windows, per-type rank sums in DECIMAL(38,0). The deviation form
    // H = 12/(N(N+1))·Σ n_j(r̄_j−r̄)² keeps the per-type numerator
    // num_j = R2_j − n_j(N+1) an EXACT decimal (≤2N², inside 38 digits
    // to N~10¹⁸); each n_j(r̄_j−r̄)² term and the k-term sum then run
    // in double — exact to N~10⁸ pooled rows and ulp-stable under the
    // 6-snap well past that (the term sum is k=|types| values; beyond
    // N~10¹² the statistic itself exceeds double's exact-integer range
    // in ANY engine, DuckDB HUGEINT included). Tie correction folds
    // Σ(t³−t) per distinct value into the SAME per-type pass via
    // ca·(cv²−1) (summing to cv³−cv within each value group) — no
    // second corpus scan. Scale shape: identical to q231 — map-side
    // combined counts, rank windows over the bounded distinct-value
    // frame (2-decimal money values), never corpus rows.
    "q290_kruskal_wallis" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val byVal = Tables.events(s, d)
        .groupBy(col("value"), col("event_type"))
        .agg(count(lit(1)).as("ca"))
      val wVal = Window.partitionBy(col("value"))
      val wOrd = Window.orderBy(col("value"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      byVal
        .withColumn("cv", sum(col("ca")).over(wVal))
        .withColumn("cum", sum(col("ca")).over(wOrd))
        .withColumn("rank2",
          lit(2L) * (col("cum") - col("cv")) + col("cv") + 1L)
        .groupBy(col("event_type"))
        .agg(sum(col("ca")).as("n_a"),
          sum(dec(col("ca")) * dec(col("rank2"))).as("r2a"),
          sum(dec(col("ca")) * (dec(col("cv")) * dec(col("cv")) - 1L))
            .as("tie_a"))
        .withColumn("n", sum(col("n_a")).over(wAll))
        .withColumn("num", col("r2a") - dec(col("n_a")) * dec(col("n") + 1L))
        .withColumn("term", col("num").cast("double")
          * col("num").cast("double")
          / (lit(4.0) * col("n_a").cast("double")))
        .withColumn("h", lit(12.0) * sum(col("term")).over(wAll)
          / (col("n").cast("double") * (col("n") + 1L).cast("double")))
        // Degenerate-input guards (ADVICE r11): n = 1 makes the tie
        // denominator n³−n zero, and an all-tied corpus (every row one
        // value) makes tie_c itself exactly 0 — both are 0-divisors
        // where Spark's Divide yields NULL but DuckDB's IEEE doubles
        // yield NaN/inf. Explicit NULL in both engines (CASE mirror in
        // the oracle) keeps the cross-engine hash stable on degenerate
        // corpora instead of relying on TPC-H data never hitting them.
        .withColumn("tie_c", when(col("n") > 1L, lit(1.0)
          - sum(col("tie_a")).over(wAll).cast("double")
            / (dec(col("n")) * dec(col("n")) * dec(col("n")) - dec(col("n")))
              .cast("double")))
        .select(col("event_type"), col("n_a"),
          snap6(col("r2a").cast("double")
            / (lit(2.0) * col("n_a").cast("double"))).as("mean_rank"),
          snap6(col("h")).as("h_stat"),
          when(col("tie_c") =!= 0.0,
            snap6(col("h") / col("tie_c"))).as("h_adj"))
        .orderBy(col("event_type"))
    }),

    // Cramér's V for event type × day-of-week — the EFFECT-SIZE
    // readout q157's raw χ² cells stop short of (χ² grows with N, so
    // at corpus scale everything is "significant"; V = √(χ²/(N·df*))
    // is the N-free association strength a monitoring dashboard can
    // threshold). Day-of-week is the exact integer (day − 2024-01-01)
    // mod 7 — Spark's dayofweek() and DuckDB's dow() disagree on
    // Sunday's index; arithmetic on exact dates doesn't. All totals
    // ride windows over the BOUNDED |types|×|dows| cell frame (one
    // corpus pass, map-side combined); rt·ct products go through
    // DECIMAL (N² exceeds 2^63 past ~3e9 rows); the χ² fold is the
    // bounded ≤35-term double sum of exact-operand terms (the q290
    // class — ulp-stable under the 6-snap). r and c come from
    // collect_set sizes over the cell frame — never a distinct
    // re-aggregation of the corpus subtree.
    "q292_cramers_v" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val wAll = Window.partitionBy()
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"),
          pmod(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")),
            lit(7)).cast("long").as("dow"))
        .agg(count(lit(1)).as("o"))
      cells
        .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("event_type"))))
        .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("dow"))))
        .withColumn("n", sum(col("o")).over(wAll))
        .withColumn("e", (dec(col("rt")) * dec(col("ct"))).cast("double")
          / col("n").cast("double"))
        .withColumn("cell", (col("o").cast("double") - col("e"))
          * (col("o").cast("double") - col("e")) / col("e"))
        .withColumn("chi2", sum(col("cell")).over(wAll))
        .withColumn("df_star",
          least(size(collect_set(col("event_type")).over(wAll)) - 1,
            size(collect_set(col("dow")).over(wAll)) - 1).cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("o")).as("n_rows"),
          snap6(sum(col("cell"))).as("chi2_part"),
          snap6(max(col("chi2"))).as("chi2"),
          max(col("df_star")).as("df_star"),
          // df_star = 0 (single row OR single column in the table)
          // zeroes the V denominator — NULL in both engines rather
          // than Spark-NULL vs DuckDB-inf (ADVICE r11).
          when(max(col("df_star")) > 0L,
            snap6(sqrt(max(col("chi2"))
              / (max(col("n")).cast("double")
                * max(col("df_star")).cast("double"))))).as("v_cramer"))
        .orderBy(col("event_type"))
    }),

    // Isotonic (PAV) calibration of return rate vs discount level —
    // the monotone-regression primitive behind probability calibration
    // (q241 measures calibration error; this FIXES it): the best
    // monotone fit of P(return | discount). Implemented closed-form
    // via the minimax characterization fit_i = max_{j≤i} min_{k≥i}
    // mean(y over [j..k]) — NO sequential pool-adjacent-violators
    // loop, so the whole fit is three bounded relational steps
    // (pairs j≤k from cumulative sums, expand to j≤i≤k triples,
    // min-then-max) that run identically in Spark and the oracle.
    // Every interval mean is one double division of exact longs
    // (identical both engines, so min/max pick identical values);
    // 6-snap only at output. Scale shape: ONE corpus pass map-side
    // combines to the ≤|levels| frame (discount grid is a bounded
    // business domain); the j≤i≤k expansion is |levels|³ ≤ ~1.3e3
    // rows of pure dimension data — corpus-size-free.
    "q294_isotonic_response" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      val wOrd = Window.orderBy(col("pct"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val levels = Tables.lineitem(s, d)
        .groupBy(floor(col("l_discount") * 100 + 0.5).cast("long")
          .as("pct"))
        .agg(count(lit(1)).as("den"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("num"))
        .withColumn("cn", sum(col("num")).over(wOrd))
        .withColumn("cd", sum(col("den")).over(wOrd))
      val j = levels.select(col("pct").as("pj"),
        (col("cn") - col("num")).as("cn0"),
        (col("cd") - col("den")).as("cd0"))
      val k = levels.select(col("pct").as("pk"), col("cn"), col("cd"))
      val pairs = j.join(k, col("pj") <= col("pk"))
        .select(col("pj"), col("pk"),
          ((col("cn") - col("cn0")).cast("double")
            / (col("cd") - col("cd0")).cast("double")).as("m"))
      // keep a window column (cn) through the grouping keys: without
      // it Catalyst prunes the window from this branch entirely and
      // plans a SECOND corpus scan instead of reusing the j/k
      // exchange (measured 2 scans → 1; cn is functionally
      // determined by pct, so the extra key changes nothing).
      val i = levels.select(col("pct"), col("den"), col("num"),
        col("cn").as("cn_i"))
      val fit = i.join(pairs,
          col("pj") <= col("pct") && col("pct") <= col("pk"))
        .groupBy(col("pct"), col("den"), col("num"), col("cn_i"),
          col("pj"))
        .agg(min(col("m")).as("inner_min"))
        .groupBy(col("pct"), col("den"), col("num"))
        .agg(max(col("inner_min")).as("iso"))
      fit.select(col("pct"), col("den").as("n_rows"),
          snap6(col("num").cast("double") / col("den").cast("double"))
            .as("raw_rate"),
          snap6(col("iso")).as("iso_rate"))
        .orderBy(col("pct"))
    }),

    // Mantel-Haenszel pooled odds ratio — does discounting (≥5%)
    // associate with returns, CONTROLLING for brand? The stratified
    // 2×2 estimator that q143's t-test and q157/q292's χ² family
    // can't give: per-brand odds ratios collapse into one
    // confounder-adjusted number, MH = Σ(aₕdₕ/nₕ) / Σ(bₕcₕ/nₕ) —
    // the Simpson's-paradox-proof readout. Exactness: the four cell
    // counts are exact longs; aₕdₕ products go through DECIMAL
    // (cell² passes 2^63 at ~3e9 rows per stratum) and each ratio
    // is one double division of exact operands; the two pooled sums
    // fold ≤|brands| such doubles (the q290 bounded-fold class);
    // per-stratum ORs are single expressions, 6-snapped. Scale
    // shape: one part⋈lineitem pass map-side combines to the
    // |brands|×4 cell frame; the pooling is windows over it.
    "q301_mantel_haenszel" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val wAll = Window.partitionBy()
      def cnt(p: Column): Column = sum(when(p, 1L).otherwise(0L))
      val cells = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          (col("l_discount") >= 0.05).as("treated"),
          (col("l_returnflag") === "R").as("ret"))
        .groupBy(col("p_brand"))
        .agg(cnt(col("treated") && col("ret")).as("a"),
          cnt(col("treated") && !col("ret")).as("b"),
          cnt(!col("treated") && col("ret")).as("c"),
          cnt(!col("treated") && !col("ret")).as("dd"))
      cells
        .withColumn("n", col("a") + col("b") + col("c") + col("dd"))
        // an all-NULL stratum (every flag unknowable) has n = 0 —
        // its MH terms are NULL, never an ANSI ÷0 (null-payload probe)
        .withColumn("adn", when(col("n") > 0,
          (dec(col("a")) * dec(col("dd"))).cast("double")
            / col("n").cast("double")))
        .withColumn("bcn", when(col("n") > 0,
          (dec(col("b")) * dec(col("c"))).cast("double")
            / col("n").cast("double")))
        // all-concordant tables (Σbc = 0) leave MH undefined → NULL,
        // never an ANSI ÷0 (degenerate probe)
        .withColumn("mh_or",
          when(sum(col("bcn")).over(wAll) > 0,
            sum(col("adn")).over(wAll) / sum(col("bcn")).over(wAll)))
        .select(col("p_brand"), col("a"), col("b"), col("c"),
          col("dd").as("d"),
          when(dec(col("b")) * dec(col("c")) > 0,
            snap6((dec(col("a")) * dec(col("dd"))).cast("double")
              / (dec(col("b")) * dec(col("c"))).cast("double")))
            .otherwise(lit(null).cast("double")).as("or_stratum"),
          snap6(col("mh_or")).as("mh_or"))
        .orderBy(col("p_brand"))
    }),

    // Theil-T inequality decomposition of customer spend by nation —
    // the DECOMPOSABLE inequality index q179's Gini isn't: T splits
    // EXACTLY into within-nation + between-nation parts, answering
    // "is spend concentration a within-market or a cross-market
    // phenomenon". All in micro-nat integer algebra on exact CENTS
    // (the q213 recipe): per-customer terms x·[ln6(x·Nₙ) − ln6(Xₙ)],
    // nation terms Xₙ·[ln6(Xₙ·N) − ln6(X·Nₙ)], every accumulation a
    // DECIMAL(38,0) sum of count×µnat products — no float fold
    // anywhere, single divisions at the end, 6-snapped. (With
    // snapped logs the within+between identity holds to ~1e-6·ln —
    // the independent total is emitted so the residual is visible.)
    // Scale shape: per-customer spend is one map-side-combined
    // orders pass joined to the customer dimension; nation totals
    // ride windows; the decomposition runs on the ≤|nations| frame.
    "q305_theil_decomposition" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      def ln6(c: Column): Column =
        floor(log(c.cast("double")) * 1e6 + 0.5).cast("long")
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast("decimal(12,2)"))
          .cast("decimal(18,2)") * 100).cast("decimal(20,0)").as("cents"))
      val wN = Window.partitionBy(col("c_nationkey"))
      val wAll = Window.partitionBy()
      val base = spend.join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("nn", count(lit(1)).over(wN))
        .withColumn("xn", sum(col("cents")).over(wN))
        .withColumn("n_tot", count(lit(1)).over(wAll))
        .withColumn("x_tot", sum(col("cents")).over(wAll))
      val nat = base
        .withColumn("term", (dec(col("cents"))
          * (ln6(dec(col("cents")) * col("nn")) - ln6(col("xn"))))
          .cast("decimal(38,0)"))
        .withColumn("term_g", (dec(col("cents"))
          * (ln6(dec(col("cents")) * col("n_tot")) - ln6(col("x_tot"))))
          .cast("decimal(38,0)"))
        .groupBy(col("c_nationkey"))
        .agg(max(col("nn")).as("n_cust"), max(col("xn")).as("xn"),
          max(col("n_tot")).as("n_tot"), max(col("x_tot")).as("x_tot"),
          sum(col("term")).as("sterm"), sum(col("term_g")).as("sterm_g"))
        .withColumn("bterm", (dec(col("xn"))
          * (ln6(dec(col("xn")) * col("n_tot"))
            - ln6(dec(col("x_tot")) * col("n_cust"))))
          .cast("decimal(38,0)"))
      nat
        .withColumn("sw", sum(col("sterm")).over(wAll))
        .withColumn("sb", sum(col("bterm")).over(wAll))
        .withColumn("sg", sum(col("sterm_g")).over(wAll))
        .select(col("c_nationkey"), col("n_cust"),
          (col("xn").cast("double") / 100.0).as("revenue"),
          snap6(col("sterm").cast("double")
            / (col("xn").cast("double") * 1e6)).as("t_within_nation"),
          snap6(col("xn").cast("double") / col("x_tot").cast("double"))
            .as("weight"),
          snap6(col("sw").cast("double")
            / (col("x_tot").cast("double") * 1e6)).as("theil_within"),
          snap6(col("sb").cast("double")
            / (col("x_tot").cast("double") * 1e6)).as("theil_between"),
          snap6(col("sg").cast("double")
            / (col("x_tot").cast("double") * 1e6)).as("theil_total"))
        .orderBy(col("c_nationkey"))
    }),

    // Market-basket association rules over order contents — the
    // support/confidence/lift mining classic (which parts sell
    // TOGETHER?), the transactional sibling of q173's document-level
    // PMI: top-20 part pairs by lift among pairs with support ≥ 2
    // orders. Scale shape: the pair generator is the WITHIN-BASKET
    // self-join on orderkey — pairs per order are basket-size², a
    // business constant, so the pair frame grows LINEARLY with
    // orders (the canonical basket shape; never a part×part join);
    // per-part supports come from the same distinct (order, part)
    // frame and broadcast-join back. Exactness: supports are exact
    // longs; confidence and lift are single divisions of exact
    // DECIMAL products (supp·N passes 2^63 at ~3e9 orders),
    // 6-snapped. Rank determinism: the top-20 orders on the lift
    // doubles — each computed by the identical expression over
    // identical exact integers in both engines, so the doubles are
    // bit-equal — tie-broken by (part_a, part_b): a total order both
    // engines share.
    // Cochran-Armitage trend test — "does return RATE rise MONOTONELY
    // with discount depth?", the ordered-alternative sibling of q292's
    // unordered χ² (χ² asks "any association"; CA weights the levels
    // by their order, gaining power exactly when the response is a
    // trend — the q294 isotonic fit's hypothesis-test companion).
    // Scores = integer discount pct. Everything is exact DECIMAL until
    // ONE double division: with N, R, s1 = Σiⁿᵢ, s2 = Σi²nᵢ, sr = Σirᵢ
    // all exact, z² = (N·sr − R·s1)²·N / (R(N−R)(N·s2 − s1²)) — the
    // N-scaled form keeps every operand an exact integer (inside 38
    // digits to N ~ 10⁸ rows; beyond that the statistic exceeds
    // double's exact range in any engine). Degenerate guards (one
    // level, R = 0, R = N) emit NULL identically (the r12 rule).
    // Scale shape: ONE corpus pass map-side-combines to the ≤|levels|
    // per-linestatus frame; the test folds ≤11 exact terms.
    "q317_trend_test" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val lv = Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("i"))
        .agg(count(lit(1)).as("n_i"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("r_i"))
      lv.groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_levels"),
          sum(col("n_i")).as("n"), sum(col("r_i")).as("r"),
          sum(dec(col("i")) * dec(col("n_i"))).as("s1"),
          sum(dec(col("i")) * dec(col("i")) * dec(col("n_i"))).as("s2"),
          sum(dec(col("i")) * dec(col("r_i"))).as("sr"))
        .withColumn("t_scaled",
          dec(col("n")) * col("sr") - dec(col("r")) * col("s1"))
        .withColumn("var_num",
          dec(col("n")) * col("s2") - col("s1") * col("s1"))
        .withColumn("z2", when(
          col("r") > 0L && col("r") < col("n") && col("var_num") > 0,
          snap6(col("t_scaled").cast("double")
            * col("t_scaled").cast("double") * col("n").cast("double")
            / (col("r").cast("double") * (col("n") - col("r")).cast("double")
              * col("var_num").cast("double")))))
        .select(col("l_linestatus"), col("n_levels"), col("n"), col("r"),
          snap6(col("t_scaled").cast("double")
            / col("n").cast("double")).as("trend_stat"),
          col("z2"))
        .orderBy(col("l_linestatus"))
    }),

    // Sample L-moments per event type — the order-statistics robust
    // alternative to q33/q34's moment skew/kurtosis (L-skewness τ₃ is
    // bounded in (−1,1), exists for heavy tails where classical
    // skewness diverges, and its estimator is EXACT integer arithmetic
    // here): b_k = Σ C(r−1,k)·x_(r) / (n·C(n−1,k)) over the sorted
    // sample. The rank weights (r−1), (r−1)(r−2) and the 2-decimal
    // money values (exact cents) keep every Σ an exact DECIMAL —
    // exact to n ~ 10¹¹ per type ((r)²·x inside 38 digits); each b_k
    // is then ONE double division, and l2 = 2b1 − b0 etc. are exact
    // IEEE ops on identical doubles. Determinism: ranks order on
    // (value, event_id) — a total order; equal values make the weight
    // assignment among ties irrelevant to the SUM only for x, which
    // is the term being weighted, so any tie order yields the same Σ.
    // Scale shape (r14): ranks ride DistributedRank within each type —
    // the old type-partitioned window put corpus/|types| rows through
    // ONE sort task (|event_type| is a bounded domain, the partitions
    // grow with the corpus); then a map-side-combined fold to the
    // ≤|types| frame.
    "q318_l_moments" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      // rank on the exact cents (a monotone image of the 2-decimal
      // value, so the order is identical to ordering on value itself)
      val ranked = DistributedRank.withRank(
        Tables.events(s, d)
          .select(col("event_type"), col("event_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents")),
        Seq(col("cents"), col("event_id")),
        partCols = Seq("event_type"), rkCol = "r")
      ranked.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("cents"))).as("s0"),
          sum(dec(col("r") - 1L) * dec(col("cents"))).as("s1"),
          sum(dec(col("r") - 1L) * dec(col("r") - 2L) * dec(col("cents")))
            .as("s2"))
        .withColumn("b0", col("s0").cast("double")
          / (col("n").cast("double") * 100.0))
        .withColumn("b1", col("s1").cast("double")
          / ((dec(col("n")) * dec(col("n") - 1L)).cast("double") * 100.0))
        .withColumn("b2", col("s2").cast("double")
          / ((dec(col("n")) * dec(col("n") - 1L) * dec(col("n") - 2L))
            .cast("double") * 100.0))
        .withColumn("l2", lit(2.0) * col("b1") - col("b0"))
        .withColumn("l3",
          lit(6.0) * col("b2") - lit(6.0) * col("b1") + col("b0"))
        .select(col("event_type"), col("n"),
          snap6(col("b0")).as("l1"), snap6(col("l2")).as("l2"),
          when(col("b0") =!= 0.0, snap6(col("l2") / col("b0")))
            .as("l_cv"),
          when(col("l2") =!= 0.0, snap6(col("l3") / col("l2")))
            .as("l_skew"))
        .orderBy(col("event_type"))
    }),

    // Brown-Forsythe variance-equality test across event types — "do
    // the k value distributions share a SCALE?" (q290 Kruskal-Wallis
    // asks location; this asks spread, median-centered so heavy tails
    // don't fake a signal — the robust Levene variant). Exactness: the
    // per-row deviation |value − median| is a double of identical
    // operands both engines (median = percentile(value, 0.5) rounded
    // to 4, the q132 recipe), immediately frozen to a MICRO-UNIT LONG
    // (floor(z·1e6 + 0.5)) so every Σ is an exact DECIMAL; the
    // between-group fold with varying denominators (Σ sz_j²/n_j) uses
    // the q324 integer-division micro trick; the F ratio
    // SSB·(N−k) / (SSW·(k−1)) cancels the µ² scale entirely — exact
    // decimal products, ONE double division. Scale shape: the median
    // frame is ≤|types| rows broadcast back; one corpus pass to
    // per-type micro-moments; the test folds the bounded type frame.
    "q327_brown_forsythe" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      // exact integer division in DECIMAL space: Spark's `DIV`
      // (IntegralDivide) returns a LONG and silently WRAPS past 2^63
      // (measured: 4e24 DIV 2000 → garbage), so the q324 micro trick
      // must divide as (a − a mod b)/b — the remainder subtraction
      // makes the decimal quotient integral, hence exactly
      // representable, hence un-rounded. DuckDB's `//` is HUGEINT and
      // needs no such care.
      def idiv(a: Column, b: Column): Column =
        ((dec(a) - pmod(dec(a), dec(b))) / dec(b)).cast("decimal(38,0)")
      val med = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
      val perType = Tables.events(s, d)
        .join(broadcast(med), "event_type")
        .select(col("event_type"),
          floor(abs(col("value") - col("med")) * 1e6 + 0.5).cast("long")
            .as("zmu"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("ng"), sum(dec(col("zmu"))).as("sz"),
          sum(dec(col("zmu")) * dec(col("zmu"))).as("szz"))
        .withColumn("tb", idiv(col("sz") * col("sz"), col("ng")))
      perType
        .agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
          sum(dec(col("sz"))).as("t"),
          sum(col("szz")).as("szz_all"),
          sum(dec(col("tb"))).as("tb_all"))
        .filter(col("k") > 1L && col("n") > col("k"))
        .withColumn("ssb",
          col("tb_all") - idiv(col("t") * col("t"), col("n")))
        .withColumn("ssw", col("szz_all") - col("tb_all"))
        .select(col("k").as("n_groups"), col("n").as("n_rows"),
          snap6(col("ssb").cast("double") / 1e12
            / (col("k") - 1L).cast("double")).as("msb_dev"),
          snap6(col("ssw").cast("double") / 1e12
            / (col("n") - col("k")).cast("double")).as("msw_dev"),
          when(col("ssw") > 0,
            snap6((col("ssb") * dec(col("n") - col("k"))).cast("double")
              / (col("ssw") * dec(col("k") - 1L)).cast("double")))
            .as("f_stat"))
    }),

    // Intraclass correlation ICC(1) of event value within users, per
    // event type — "is value a USER trait or per-event noise?", the
    // variance-decomposition readout behind any per-user aggregation
    // decision (ICC ≈ 0 ⟹ user means are noise, don't stratify;
    // ICC high ⟹ user is the unit of analysis — the q305 Theil
    // between/within split, done as a proper variance component with
    // the unbalanced-design k₀). Exactness: the one
    // varying-denominator fold (Σ S_g²/n_g across ~|users| groups —
    // which would be an order-sensitive float sum) is defined in
    // MICRO-UNITS VIA INTEGER DIVISION, (S_g²·100) DIV n_g, making
    // the cross-group sum an EXACT DECIMAL (the q119 integer-space
    // rule; truncation bias ≤ |users|·10⁻⁶ value², far under the
    // 6-snap). k₀ likewise folds as one integer division. Scale
    // shape: one corpus pass to (type, user) moments, map-side
    // combined; the ICC folds the per-type frame.
    "q324_icc_users" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      // see q327: Spark's DIV wraps past 2^63, so integer division
      // runs in DECIMAL space as (a − a mod b)/b — exact and
      // overflow-safe to 10³² (the grand term t²·100/N passes 2^63
      // well inside a real corpus).
      def idiv(a: Column, b: Column): Column =
        ((dec(a) - pmod(dec(a), dec(b))) / dec(b)).cast("decimal(38,0)")
      val perUser = Tables.events(s, d)
        .select(col("event_type"), col("user_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("ng"), sum(col("cents")).as("sg"),
          sum(dec(col("cents")) * dec(col("cents"))).as("sxx"))
        .withColumn("tg",
          idiv(dec(col("sg")) * dec(col("sg")) * lit(100L), col("ng")))
      perUser.groupBy(col("event_type"))
        .agg(count(lit(1)).as("g"), sum(col("ng")).as("n"),
          sum(dec(col("sg"))).as("t"),
          sum(col("sxx")).as("sx2"),
          sum(dec(col("tg"))).as("tb_micro"),
          sum(dec(col("ng")) * dec(col("ng"))).as("sn2"))
        .filter(col("g") > 1L && col("n") > col("g"))
        .withColumn("grand_micro",
          idiv(col("t") * col("t") * lit(100L), col("n")))
        .withColumn("ssb_micro", col("tb_micro") - col("grand_micro"))
        .withColumn("ssw_micro",
          col("sx2") * lit(100L) - col("tb_micro"))
        .withColumn("msb", col("ssb_micro").cast("double") / 1e6
          / (col("g") - 1L).cast("double"))
        .withColumn("msw", col("ssw_micro").cast("double") / 1e6
          / (col("n") - col("g")).cast("double"))
        .withColumn("k0",
          idiv((dec(col("n")) * dec(col("n")) - col("sn2")) * lit(1000000L),
            dec(col("n")) * dec(col("g") - 1L)).cast("double") / 1e6)
        .withColumn("den",
          col("msb") + (col("k0") - lit(1.0)) * col("msw"))
        .select(col("event_type"), col("g").as("n_users"),
          col("n").as("n_rows"), snap6(col("msb")).as("msb"),
          snap6(col("msw")).as("msw"), snap6(col("k0")).as("k0"),
          when(col("den") =!= 0.0,
            snap6((col("msb") - col("msw")) / col("den"))).as("icc"))
        .orderBy(col("event_type"))
    }),

    "q308_basket_rules" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val od = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val b = od.select(col("ok").as("ok_b"), col("pk").as("pk_b"))
      val pairs = od.join(b,
          col("ok") === col("ok_b") && col("pk") < col("pk_b"))
        .groupBy(col("pk"), col("pk_b"))
        .agg(count(lit(1)).as("supp_ab"))
        .filter(col("supp_ab") >= 2L)
      // supports/total are part-dimension-sized (a bounded business
      // catalog) — broadcast explicitly rather than leaving the
      // build-side choice to AQE stats.
      val sa = od.groupBy(col("pk")).agg(count(lit(1)).as("supp_a"))
      val sb = sa.select(col("pk").as("pk_b2"), col("supp_a").as("supp_b"))
      val n = od.agg(countDistinct(col("ok")).as("n_orders"))
      pairs
        .join(broadcast(sa), Seq("pk"))
        .join(broadcast(sb), col("pk_b") === col("pk_b2"))
        .crossJoin(broadcast(n))
        .withColumn("lift",
          (dec(col("supp_ab")) * dec(col("n_orders"))).cast("double")
            / (dec(col("supp_a")) * dec(col("supp_b"))).cast("double"))
        .withColumn("rnk", row_number().over(Window.orderBy(
          col("lift").desc, col("pk"), col("pk_b"))).cast("long"))
        .filter(col("rnk") <= 20)
        .select(col("rnk"), col("pk").as("part_a"),
          col("pk_b").as("part_b"), col("supp_ab"),
          snap6(col("supp_ab").cast("double")
            / col("supp_a").cast("double")).as("confidence"),
          snap6(col("lift")).as("lift"))
        .orderBy(col("rnk"))
    }),

    // Pairwise Wasserstein-1 (earth-mover) distance between event-
    // type value distributions — W₁ = ∫|F_A−F_B| dv, the DISTANCE
    // metric the drift family lacks: q224's KS statistic is the max
    // CDF gap (location-blind), q225's PSI needs arbitrary bins; W₁
    // integrates the whole gap in value units. Two map-side-combined
    // corpus passes: per-value type counts collapse to a map per
    // pooled grid point, and the global type set arrives as ONE
    // broadcast collect_set row the grid explodes against — NOT a
    // collect_list window over the grid, which materializes the
    // whole value list per row (measured 371 s quadratic vs 1.6 s
    // for this shape). CDF gaps are exact cross-products
    // |cum_A·n_B − cum_B·n_A| (DECIMAL); each interval term snaps to
    // micro-longs BEFORE the per-pair sum (the q297 rule), so the
    // only unordered fold is exact. Scale shape: everything after
    // the first aggregation runs on the bounded distinct-value grid
    // (2-decimal money domain — the q231 argument) × |types|².
    "q310_wasserstein" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val tysArr = Tables.events(s, d)
        .agg(sort_array(collect_set(col("event_type"))).as("tys"))
      val pv = Tables.events(s, d)
        .groupBy(col("value"), col("event_type"))
        .agg(count(lit(1)).as("ca"))
        .groupBy(col("value"))
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("ca"))))).as("m"))
        .crossJoin(broadcast(tysArr))
      val grid = pv
        .select(col("value"), col("m"), explode(col("tys")).as("t"))
        .select(col("value"), col("t"),
          coalesce(element_at(col("m"), col("t")), lit(0L)).as("ca"))
        .withColumn("cum", sum(col("ca")).over(
          Window.partitionBy(col("t")).orderBy(col("value"))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nt", sum(col("ca")).over(Window.partitionBy(col("t"))))
      val b = grid.select(col("value").as("v_b"), col("t").as("t_b"),
        col("cum").as("cum_b"), col("nt").as("nt_b"))
      val wPair = Window.partitionBy(col("t"), col("t_b"))
        .orderBy(col("value"))
      grid.join(b, col("value") === col("v_b") && col("t") < col("t_b"))
        .withColumn("dv", lead(col("value"), 1).over(wPair) - col("value"))
        .filter(col("dv").isNotNull)
        .withColumn("gap", abs(dec(col("cum")) * dec(col("nt_b"))
          - dec(col("cum_b")) * dec(col("nt"))))
        .withColumn("term6", floor(col("gap").cast("double")
          / (dec(col("nt")) * dec(col("nt_b"))).cast("double")
          * col("dv") * 1e6 + 0.5).cast("long"))
        .groupBy(col("t").as("type_a"), col("t_b").as("type_b"))
        .agg(count(lit(1)).as("n_grid"),
          (sum(col("term6")).cast("double") / 1e6).as("w1_raw"))
        .select(col("type_a"), col("type_b"), col("n_grid"),
          snap6(col("w1_raw")).as("w1_distance"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Cliff's delta per order priority vs the rest — the ORDINAL
    // effect size (Cliff 1993): δ = (#{x>y} − #{x<y})/(n₁n₂) over all
    // cross pairs, the robust "how big is the difference" companion
    // to q231's Mann-Whitney significance (U says WHETHER priorities
    // shift price mass; δ says BY HOW MUCH, insensitive to outliers
    // where q33's means are not). Never pairwise: per distinct price
    // v, #{rest < v} = (cumAll<v) − (cumGrp<v), so both pair counts
    // fold as Σ n_grp(v)·(bounded cum diffs) — exact DECIMAL
    // cross-products from TWO rank-style prefix sums (one over the
    // distinct-value frame, one per (priority, value)), a single
    // division at the end. Magnitude bins are the Romano et al. 2006
    // thresholds on the SNAPPED δ. Scale shape: value-level frames
    // only (≈|distinct prices|), range-partitioned prefix-sum
    // windows, no row² anywhere.
    "q331_cliffs_delta" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val ords = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"),
          col("o_totalprice").as("v"))
      // both prefix sums ride DistributedRank (round 14): the global
      // cum_le window put the whole distinct-price frame through ONE
      // task and the prio-partitioned one through 5 — o_totalprice's
      // distinct-cents frame saturates only in the tens of millions
      // (q341's rungs show it still growing at 100×), far past a
      // single sort task's comfort. run/tot are the same exact longs.
      val vt = graft.ops.DistributedRank.withRank(
          ords.groupBy(col("v")).agg(count(lit(1)).as("nv")),
          Seq(col("v")), Nil, sums = Seq("nv" -> col("nv")))
        .select(col("v"), col("nv"), col("run_nv").as("cum_le"),
          col("tot_nv").as("n_all"))
      val pv = graft.ops.DistributedRank.withRank(
          ords.groupBy(col("prio"), col("v"))
            .agg(count(lit(1)).as("np")),
          Seq(col("v")), Seq("prio"), sums = Seq("np" -> col("np")))
        .select(col("prio"), col("v"), col("np"),
          col("run_np").as("cump_le"), col("tot_np").as("n_p"))
      pv.join(vt, "v")
        .withColumn("b_lt",
          (col("cum_le") - col("nv")) - (col("cump_le") - col("np")))
        .withColumn("b_gt",
          (col("n_all") - col("cum_le")) - (col("n_p") - col("cump_le")))
        .groupBy(col("prio"))
        .agg(max(col("n_p")).as("n_focus"), max(col("n_all")).as("n_all"),
          sum(dec(col("np")) * dec(col("b_lt"))).as("gt_pairs"),
          sum(dec(col("np")) * dec(col("b_gt"))).as("lt_pairs"))
        // n_all == n_focus (a single class holds every row): there is
        // no rest group to compare against — delta is NULL, and so is
        // its magnitude label (an unguarded `otherwise` would read the
        // NULL comparisons as false and mislabel it "large").
        .withColumn("delta6", when(col("n_all") > col("n_focus"),
          snap6((col("gt_pairs") - col("lt_pairs"))
            .cast("double") / (dec(col("n_focus"))
              * dec(col("n_all") - col("n_focus"))).cast("double"))))
        .select(col("prio").as("o_orderpriority"), col("n_focus"),
          (col("n_all") - col("n_focus")).as("n_rest"),
          col("gt_pairs").cast("long").as("gt_pairs"),
          col("lt_pairs").cast("long").as("lt_pairs"),
          col("delta6").as("cliffs_delta"),
          when(col("delta6").isNull, lit(null).cast("string"))
            .when(abs(col("delta6")) < 0.147, "negligible")
            .when(abs(col("delta6")) < 0.33, "small")
            .when(abs(col("delta6")) < 0.474, "medium")
            .otherwise("large").as("magnitude"))
        .orderBy(col("o_orderpriority"))
    }),

    // Cronbach's alpha over the event-type "instrument" — internal
    // consistency of the k = |event types| per-user activity scores
    // ("do the five signals move together across users, i.e. does
    // 'activity' behave like ONE latent trait?"), the psychometric
    // reliability readout q324's ICC (absolute agreement on one
    // score) doesn't give. Dense user × type grid with REAL zeros
    // (an inactive user scores 0, it doesn't vanish); item and
    // total-score variance numerators are exact DECIMAL
    // U·Σs² − (Σs)² sharing the U² denominator, so
    // α = k(num_tot − Σnum_item) / ((k−1)·num_tot) is ONE division
    // of exact operands, 6-snapped. Scale shape: one corpus pass to
    // per-(user, type) counts; the grid is |users| × |bounded type
    // set| via broadcast cross join; readout folds are counters.
    "q333_cronbach_alpha" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val ev = Tables.events(s, d)
      val users = ev.select(col("user_id")).distinct()
      val types = ev.select(col("event_type")).distinct()
      val filled = users.crossJoin(broadcast(types))
        .join(ev.groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("c")),
          Seq("user_id", "event_type"), "left")
        .select(col("user_id"), col("event_type"),
          coalesce(col("c"), lit(0L)).as("c"))
      val items = filled.groupBy(col("event_type"))
        .agg(count(lit(1)).as("u"), sum(col("c")).as("sc"),
          sum(dec(col("c")) * dec(col("c"))).as("sc2"))
        .agg(count(lit(1)).as("k"), max(col("u")).as("n_users"),
          sum(dec(col("u")) * col("sc2")
            - dec(col("sc")) * dec(col("sc"))).as("num_items"))
      val total = filled.groupBy(col("user_id"))
        .agg(sum(col("c")).as("s"))
        .agg(count(lit(1)).as("u2"), sum(col("s")).as("ss"),
          sum(dec(col("s")) * dec(col("s"))).as("ss2"))
        .select((dec(col("u2")) * col("ss2")
          - dec(col("ss")) * dec(col("ss"))).as("num_tot"),
          col("u2"))
      items.crossJoin(broadcast(total))
        .select(col("k").as("n_items"), col("n_users"),
          snap6(col("num_items").cast("double")
            / (dec(col("u2")) * dec(col("u2"))).cast("double"))
            .as("sum_item_var"),
          snap6(col("num_tot").cast("double")
            / (dec(col("u2")) * dec(col("u2"))).cast("double"))
            .as("total_var"),
          // k > 1 guard (VERDICT r12 #4): a single-item instrument has
          // no internal consistency to measure — k−1 = 0 would make
          // this 0/0 → NaN in Spark's double division, where the
          // oracle's HUGEINT path errors. NULL on both engines.
          when(col("num_tot") > 0 && col("k") > 1L,
            snap6((dec(col("k")) * (col("num_tot") - col("num_items")))
              .cast("double")
              / (dec(col("k") - 1L) * col("num_tot")).cast("double")))
            .as("cronbach_alpha"))
    }),

    // Cochran's Q across the k event-type "treatments" — do the k
    // BINARY per-user reach flags (did user u fire type t on the
    // probe day 2024-01-05?) share one success rate, the k-sample
    // McNemar that completes the agreement family (q333's alpha
    // treats the scores as continuous; Q asks the matched-binary
    // question)? Day-level reach keeps the design non-degenerate at
    // every SF: lifetime reach saturates to all-ones (every R_i = k
    // ⟹ denominator exactly 0), while per-user DAILY density is
    // scale-invariant in this corpus. Exact throughout: since
    // ΣC_j = ΣR_i = N, the textbook form collapses to
    // Q = (k−1)·(k·ΣC_j² − N²) / (k·ΣR_i − ΣR_i²) — column sums C_j,
    // row sums R_i over ALL subjects (zero-row users count), and N
    // are integers from ONE distinct-pair pass, both Σ folds exact
    // DECIMAL, one double division at the end. Scale shape: corpus →
    // distinct (user, type) probe-day pairs (map-side combined); row
    // sums on the user frame, column sums on the bounded type frame;
    // output is one row.
    "q339_cochrans_q" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val ev = Tables.events(s, d)
      val pairs = ev
        .filter(to_date(col("ts")) === lit("2024-01-05").cast("date"))
        .select(col("user_id"), col("event_type")).distinct()
      val rows = ev.select(col("user_id")).distinct()
        .join(pairs.groupBy(col("user_id")).agg(count(lit(1)).as("r")),
          Seq("user_id"), "left")
        .select(coalesce(col("r"), lit(0L)).as("r"))
        .agg(count(lit(1)).as("n_users"), sum(col("r")).as("nn"),
          sum(dec(col("r")) * dec(col("r"))).as("sr2"))
      val cols = pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("cj"))
        .agg(count(lit(1)).as("k"),
          sum(dec(col("cj")) * dec(col("cj"))).as("sc2"))
      cols.crossJoin(broadcast(rows))
        .select(col("k").as("n_treatments"), col("n_users"),
          (col("k") - 1L).as("df"),
          when(dec(col("k")) * dec(col("nn")) - col("sr2") > 0,
            snap6((dec(col("k") - 1L) * (dec(col("k")) * col("sc2")
                - dec(col("nn")) * dec(col("nn")))).cast("double")
              / (dec(col("k")) * dec(col("nn")) - col("sr2"))
                .cast("double"))).as("q_stat"))
    }),

    // McNemar's test on paired per-user purchase reach, probe day 5
    // vs probe day 25 — "did conversion CHANGE within users?" — the
    // paired-proportion test an unpaired q143-style A/B gets wrong
    // when the same users sit in both windows (only the DISCORDANT
    // users carry information). Single-day probes keep the paired
    // flags non-degenerate at every SF (half-month reach saturates
    // to all-ones in this corpus — b = c = 0 and the test dies; a
    // day's reach sits mid-range and is density-, not volume-,
    // scaled). Both the raw χ² = (b−c)²/(b+c) and Edwards'
    // continuity-corrected (|b−c|−1)²/(b+c) are single divisions of
    // exact integers; b+c = 0 yields NULL identically. Scale shape:
    // one corpus pass to per-user probe flags (map-side combined),
    // a 4-cell fold, one row out.
    "q340_mcnemar" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase"
            && to_date(col("ts")) === lit("2024-01-05").cast("date"),
          1L).otherwise(0L)).as("p1"),
          max(when(col("event_type") === "purchase"
            && to_date(col("ts")) === lit("2024-01-25").cast("date"),
          1L).otherwise(0L)).as("p2"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("p1") === 1L && col("p2") === 0L, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("p1") === 0L && col("p2") === 1L, 1L)
            .otherwise(0L)).as("c"))
        .select(col("n_users"), col("b").as("n_lost"),
          col("c").as("n_gained"),
          when(col("b") + col("c") > 0,
            snap6(((col("b") - col("c")) * (col("b") - col("c")))
              .cast("double")
              / (col("b") + col("c")).cast("double"))).as("chi2"),
          when(col("b") + col("c") > 0,
            snap6(((abs(col("b") - col("c")) - 1L)
              * (abs(col("b") - col("c")) - 1L)).cast("double")
              / (col("b") + col("c")).cast("double"))).as("chi2_cc"))
    }),

    // Jonckheere-Terpstra ordered-alternative test — "does order
    // price TREND across the five priorities in their natural
    // order?" — strictly sharper than q290's Kruskal-Wallis when the
    // alternative is ordered (KW spends power on every permutation
    // of group means; JT only on the monotone one). Never pairwise
    // in rows: the doubled statistic JT2 = Σ_{i<j} Σ_v
    // np_j(v)·(2·cum_i(<v) + np_i(v)) folds over a DENSE
    // group×distinct-value grid (one prefix-sum window per group,
    // then one self-join on value across the 10 ordered group
    // pairs — value-level frames only). Null moments are the exact
    // tie-corrected Hollander-Wolfe forms: E2 = (N²−Σn_i²)/2 and
    // 72·Var = A + 2·B/(N(N−1)(N−2)) + 9·C/(N(N−1)) with A, B, C
    // pure integer sums over group sizes and pooled tie groups — all
    // DECIMAL-exact, two double divisions (Var, z) at the end.
    // Scale shape: value-level grid ≈ |distinct prices|×|groups|;
    // the pair join carries bounded group fan-out, never rows².
    "q341_jonckheere" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("g"), col("o_totalprice").as("v"))
      val pv = o.groupBy(col("g"), col("v")).agg(count(lit(1)).as("np"))
      // per-group running count via DistributedRank, not a
      // g-partitioned window (round 14): |priorities| = 5 partitions
      // over the distinct-value grid funnel value-scale frames
      // through 5 sort tasks — the q179 funnel class. run_np is the
      // same inclusive prefix sum in exact longs.
      val grid = graft.ops.DistributedRank.withRank(
          pv.select(col("v")).distinct()
            .crossJoin(broadcast(pv.select(col("g")).distinct()))
            .join(pv, Seq("g", "v"), "left")
            .select(col("g"), col("v"),
              coalesce(col("np"), lit(0L)).as("np")),
          Seq(col("v")), Seq("g"), sums = Seq("np" -> col("np")))
        .withColumnRenamed("run_np", "cumle")
        .select(col("g"), col("v"), col("np"), col("cumle"))
      val b = grid.select(col("g").as("gb"), col("v").as("vb"),
        col("np").as("npb"), col("cumle").as("cumleb"))
      val jt = grid.join(b, col("v") === col("vb") && col("g") < col("gb"))
        .filter(col("npb") > 0)
        .agg(sum(dec(col("npb"))
          * (lit(2L).cast("decimal(38,0)")
              * (col("cumle") - col("np")).cast("decimal(38,0)")
            + dec(col("np")))).as("jt2"))
      // group sizes and pooled tie groups for the exact null moments
      val gs = o.groupBy(col("g")).agg(count(lit(1)).as("ni"))
        .agg(count(lit(1)).as("n_groups"), sum(col("ni")).as("nn"),
          sum(dec(col("ni")) * dec(col("ni"))).as("sn2"),
          sum(dec(col("ni")) * dec(col("ni") - 1L)).as("sn11"),
          sum(dec(col("ni")) * dec(col("ni") - 1L)
            * dec(lit(2L) * col("ni") + 5L)).as("sn25"),
          sum(dec(col("ni")) * dec(col("ni") - 1L)
            * dec(col("ni") - 2L)).as("sn12"))
      val ts = o.groupBy(col("v")).agg(count(lit(1)).as("tj"))
        .agg(sum(dec(col("tj")) * dec(col("tj") - 1L)).as("st11"),
          sum(dec(col("tj")) * dec(col("tj") - 1L)
            * dec(lit(2L) * col("tj") + 5L)).as("st25"),
          sum(dec(col("tj")) * dec(col("tj") - 1L)
            * dec(col("tj") - 2L)).as("st12"))
      jt.crossJoin(broadcast(gs)).crossJoin(broadcast(ts))
        .withColumn("e2", (dec(col("nn")) * dec(col("nn")) - col("sn2"))
          .cast("double") / 2.0)
        // nn ≤ 2: the tie-correction terms divide by nn(nn−1)(nn−2) —
        // no null variance exists for a 2-row corpus (NULL, never a
        // div-0 error; Spark ANSI throws even on DOUBLE ÷ 0)
        .withColumn("vvar", when(col("nn") > 2L,
          (dec(col("nn")) * dec(col("nn") - 1L)
            * dec(lit(2L) * col("nn") + 5L) - col("sn25") - col("st25"))
            .cast("double") / 72.0
          + (col("sn12") * col("st12")).cast("double")
            / (lit(36.0) * (dec(col("nn")) * dec(col("nn") - 1L)
              * dec(col("nn") - 2L)).cast("double"))
          + (col("sn11") * col("st11")).cast("double")
            / (lit(8.0) * (dec(col("nn")) * dec(col("nn") - 1L))
              .cast("double"))))
        .select(col("n_groups"), col("nn").as("n_total"),
          col("jt2").cast("long").as("jt2"),
          // e2 is one exact division of DECIMAL operands (never an
          // order-sensitive fold) — emitted UNSNAPPED: snap6's
          // floor-long would overflow at N ≥ ~4·10⁶ rows (e2 ~ N²/2).
          col("e2").as("e_jt2"),
          // sd, not Var: Var ~ N³ overflows snap6's long at sf0.1
          // (floor(9e13·1e6) > 2⁶³ — measured); the standard error
          // is the number a monitor thresholds anyway, and its
          // centi-snap stays inside a long to N ~ 10¹² rows.
          when(col("vvar") > 0.0,
            floor(sqrt(col("vvar")) * 100.0 + 0.5) / 100.0)
            .as("sd_jt"),
          when(col("vvar") > 0.0,
            snap6((col("jt2").cast("double") - col("e2"))
              / (lit(2.0) * sqrt(col("vvar"))))).as("z"))
    }),

    // CUPED variance reduction (Deng et al. 2013) — the modern
    // experimentation workhorse: use each user's PRE-period activity
    // as a control covariate, θ = cov(pre, post)/var(pre), and the
    // adjusted metric's variance drops by exactly ρ² — this query
    // reports how much an A/B test on this population would gain
    // (q143 runs the test; CUPED is why mature platforms need ~half
    // the sample). All moments are exact DECIMAL cross-products of
    // per-user integer counts (U·Σxy − ΣxΣy etc.), so θ, var(post),
    // ρ², and var(adj) = var(post)·(1−ρ²) are arithmetic expressions
    // of exact operands — identical both engines, 6-snapped.
    // Degenerate pre-periods (var(pre) = 0) yield NULL identically.
    // Scale shape: one corpus pass to per-user (pre, post) counters
    // (map-side combined), a 6-counter fold, one row out.
    "q345_cuped" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(sum(when(to_date(col("ts"))
            <= lit("2024-01-15").cast("date"), 1L).otherwise(0L))
            .as("x"),
          sum(when(to_date(col("ts"))
            > lit("2024-01-15").cast("date"), 1L).otherwise(0L))
            .as("y"))
        .agg(count(lit(1)).as("uu"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(dec(col("x")) * dec(col("x"))).as("sxx"),
          sum(dec(col("y")) * dec(col("y"))).as("syy"),
          sum(dec(col("x")) * dec(col("y"))).as("sxy"))
        .withColumn("cnum", dec(col("uu")) * col("sxy")
          - dec(col("sx")) * dec(col("sy")))
        .withColumn("dx", dec(col("uu")) * col("sxx")
          - dec(col("sx")) * dec(col("sx")))
        .withColumn("dy", dec(col("uu")) * col("syy")
          - dec(col("sy")) * dec(col("sy")))
        .select(col("uu").as("n_users"),
          when(col("dx") > 0, snap6(col("cnum").cast("double")
            / col("dx").cast("double"))).as("theta"),
          snap6(col("dy").cast("double")
            / (col("uu").cast("double") * col("uu").cast("double")))
            .as("var_post"),
          // ρ² squares AFTER the exact→double cast: a DECIMAL square
          // of cnum ~ U·Σxy would overflow 38 digits at ~10⁹ users,
          // while the double square of the exact value is the same
          // deterministic op both engines.
          when(col("dx") > 0 && col("dy") > 0,
            snap6(col("cnum").cast("double") * col("cnum").cast("double")
              / (col("dx").cast("double") * col("dy").cast("double"))))
            .as("rho2"),
          when(col("dx") > 0 && col("dy") > 0,
            snap6(col("dy").cast("double")
              / (col("uu").cast("double") * col("uu").cast("double"))
              * (lit(1.0)
                - col("cnum").cast("double") * col("cnum").cast("double")
                / (col("dx").cast("double") * col("dy").cast("double")))))
            .as("var_adjusted"))
    }),

    // Hill tail-index ladder on order prices — "how heavy is the
    // price tail?" α̂(k) = k·10⁶ / Σᵢ₌₁..k (ln x₍ᵢ₎ − ln x₍ₖ₊₁₎) over
    // the top-k order statistics, read at k ∈ {50, 100, 200} (the
    // Hill-plot stability check): the continuous-value tail
    // diagnostic q245's Zipf slope (token ranks) and q318's
    // L-moments (whole-distribution shape) don't give — extreme
    // quantile extrapolation and "is variance even finite?" both
    // key off α. Exactness: each ln snaps to a µnat long, the
    // excess sum is Σl6 − k·l6_ref of exact longs, and γ (mean log
    // excess = 1/α) and α are single divisions. Scale shape: one
    // rank-style sort (TakeOrdered-sized: only the top max-k+1
    // ranks survive the filter), a 3-rung ladder over it.
    "q351_hill_tail" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val ranked = Tables.orders(s, d)
        .select(col("o_totalprice").as("x"), col("o_orderkey"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("x").desc, col("o_orderkey"))).cast("long"))
        .filter(col("rn") <= 201L)
        .withColumn("l6", floor(log(col("x")) * 1e6 + 0.5).cast("long"))
      val ks = ranked.sparkSession.range(0, 3)
        .select((lit(50L) * pow(lit(2.0), col("id")).cast("long"))
          .as("k"))
      val refs = ks.join(ranked.select((col("rn") - 1L).as("k"),
        col("l6").as("l6ref"), col("x").as("x_ref")), Seq("k"))
      ks.crossJoin(broadcast(ranked))
        .filter(col("rn") <= col("k"))
        .groupBy(col("k")).agg(sum(col("l6")).as("sl"))
        .join(refs, Seq("k"))
        .withColumn("exc", col("sl") - col("k") * col("l6ref"))
        .select(col("k"), col("x_ref").as("threshold_price"),
          when(col("exc") > 0, snap6(col("exc").cast("double")
            / (col("k").cast("double") * 1e6))).as("gamma"),
          when(col("exc") > 0, snap6(
            (col("k").cast("double") * 1e6)
              / col("exc").cast("double"))).as("hill_alpha"))
        .orderBy(col("k"))
    }),

    // ABC / Pareto classification of parts by revenue — the
    // inventory-control staple ("A-parts: the ~20% carrying 80% of
    // revenue get tight control"), the CLASSIFICATION complement of
    // q213's raw concentration index: rank parts by exact-cent
    // revenue, classify by INCLUSIVE cumulative share with pure
    // integer cross-multiplications (cum·100 ≤ 80·total → A,
    // ≤ 95·total → B, else C — no float share is ever compared),
    // and report each class's part count and revenue share. Scale
    // shape: one corpus pass to per-part cents (map-side combined),
    // then the cumulative revenue rides DistributedRank's q101-style
    // prefix sum over the PART frame — never a global sorted window
    // (the r13 form funneled every part through ONE task), a 3-row
    // fold.
    "q355_abc_analysis" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val rev = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long")
            .as("cents"))
        .groupBy(col("l_partkey")).agg(sum(col("cents")).as("rev"))
      DistributedRank.withRank(rev,
          Seq(col("rev").desc, col("l_partkey")),
          sums = Seq("rev" -> col("rev")))
        .withColumn("cum", col("run_rev"))
        .withColumn("tot", col("tot_rev"))
        .withColumn("cls",
          when(dec(col("cum")) * 100L <= dec(col("tot")) * 80L, "A")
            .when(dec(col("cum")) * 100L <= dec(col("tot")) * 95L, "B")
            .otherwise("C"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("class_rev"))
        .withColumn("all_parts",
          sum(col("n_parts")).over(Window.partitionBy()))
        .withColumn("all_rev",
          sum(col("class_rev")).over(Window.partitionBy()))
        .select(col("cls").as("abc_class"), col("n_parts"),
          snap6(col("n_parts").cast("double")
            / col("all_parts").cast("double")).as("part_share"),
          snap6(col("class_rev").cast("double")
            / col("all_rev").cast("double")).as("revenue_share"))
        .orderBy(col("abc_class"))
    }),

    // Simpson's-paradox screen — does the quantity-vs-discount slope
    // REVERSE sign inside any return-flag group relative to the
    // pooled slope? (The aggregation trap every dashboard walks
    // into: q212 fits the pooled response; this checks whether the
    // pooled sign even survives stratification.) Slopes are exact
    // rationals (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) on integer-scaled
    // discounts; the reversal flag compares INTEGER numerator signs
    // (denominators are positive), so the boolean is exact, never a
    // float-sign artifact. Scale shape: one corpus pass to per-group
    // moment counters (map-side combined), a bounded group frame ×
    // broadcast pooled row.
    "q358_simpsons_check" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"))
      def moments(df: DataFrame): DataFrame = df
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(dec(col("x")) * dec(col("x"))).as("sxx"),
          sum(dec(col("x")) * dec(col("y"))).as("sxy"))
        .select(col("n"),
          (dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
            .as("num"),
          (dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
            .as("den"))
      val pooled = moments(li)
        .select(col("num").as("num_all"), col("den").as("den_all"))
      val grps = li.groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(dec(col("x")) * dec(col("x"))).as("sxx"),
          sum(dec(col("x")) * dec(col("y"))).as("sxy"))
        .select(col("g"), col("n"),
          (dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
            .as("num"),
          (dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
            .as("den"))
      grps.crossJoin(broadcast(pooled))
        .select(col("g").as("l_returnflag"), col("n").as("n_rows"),
          when(col("den") > 0, snap6(col("num").cast("double")
            / col("den").cast("double"))).as("slope_group"),
          when(col("den_all") > 0, snap6(col("num_all").cast("double")
            / col("den_all").cast("double"))).as("slope_pooled"),
          (col("num") > 0 && col("num_all") < 0
            || col("num") < 0 && col("num_all") > 0)
            .as("sign_reversed"))
        .orderBy(col("l_returnflag"))
    }),

    // Partial correlation ρ(quantity, price | discount) — does the
    // quantity-price relationship survive CONTROLLING for discount?
    // (q236's Spearman and q167's rolling Pearson are bivariate; the
    // partial is the first rung of causal hygiene — a correlation
    // that vanishes given a confounder was never structural.) All
    // three pairwise r's come from one 9-counter exact-moment fold;
    // ρ_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) is a single
    // deterministic double expression of the exact cross-products
    // (each r² expressed as num²/(den_a·den_b) of exact DECIMAL
    // casts). Scale shape: one corpus pass, one row out.
    "q359_partial_corr" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      Tables.lineitem(s, d)
        .select(col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice")).cast("long").as("y"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("z"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("z")).as("sz"),
          sum(dec(col("x")) * dec(col("x"))).as("sxx"),
          sum(dec(col("y")) * dec(col("y"))).as("syy"),
          sum(dec(col("z")) * dec(col("z"))).as("szz"),
          sum(dec(col("x")) * dec(col("y"))).as("sxy"),
          sum(dec(col("x")) * dec(col("z"))).as("sxz"),
          sum(dec(col("y")) * dec(col("z"))).as("syz"))
        .withColumn("cxy", (dec(col("n")) * col("sxy")
          - dec(col("sx")) * dec(col("sy"))).cast("double"))
        .withColumn("cxz", (dec(col("n")) * col("sxz")
          - dec(col("sx")) * dec(col("sz"))).cast("double"))
        .withColumn("cyz", (dec(col("n")) * col("syz")
          - dec(col("sy")) * dec(col("sz"))).cast("double"))
        .withColumn("vx", (dec(col("n")) * col("sxx")
          - dec(col("sx")) * dec(col("sx"))).cast("double"))
        .withColumn("vy", (dec(col("n")) * col("syy")
          - dec(col("sy")) * dec(col("sy"))).cast("double"))
        .withColumn("vz", (dec(col("n")) * col("szz")
          - dec(col("sz")) * dec(col("sz"))).cast("double"))
        // zero-variance margins have no correlation (NULL, never a
        // div-0 error — Spark ANSI throws even on DOUBLE ÷ 0)
        .withColumn("rxy", when(col("vx") > 0.0 && col("vy") > 0.0,
          col("cxy") / sqrt(col("vx") * col("vy"))))
        .withColumn("rxz", when(col("vx") > 0.0 && col("vz") > 0.0,
          col("cxz") / sqrt(col("vx") * col("vz"))))
        .withColumn("ryz", when(col("vy") > 0.0 && col("vz") > 0.0,
          col("cyz") / sqrt(col("vy") * col("vz"))))
        .select(col("n").as("n_rows"), snap6(col("rxy")).as("r_xy"),
          snap6(col("rxz")).as("r_xz"), snap6(col("ryz")).as("r_yz"),
          when((lit(1.0) - col("rxz") * col("rxz")) > 0.0
              && (lit(1.0) - col("ryz") * col("ryz")) > 0.0,
            snap6((col("rxy") - col("rxz") * col("ryz"))
              / sqrt((lit(1.0) - col("rxz") * col("rxz"))
                * (lit(1.0) - col("ryz") * col("ryz")))))
            .as("partial_r_xy_given_z"))
    }),

    // Per-part price-dispersion audit — parts whose unit price
    // varies most across line items (CV² of the per-unit price in
    // exact cents), the price-integrity screen behind "same part,
    // wildly different charges" (q205 finds duplicate payments;
    // this finds INCONSISTENT pricing): CV² = (nΣp² − (Σp)²)/(Σp)²
    // is a single division of exact DECIMAL cross-products per
    // part, top-15 by (snapped CV² DESC, part) with a minimum
    // support of 5 line items. Scale shape: one corpus pass to
    // per-part moment counters (map-side combined), TakeOrdered.
    "q360_price_dispersion" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 0)
        .select(col("l_partkey"),
          floor(col("l_extendedprice") * 100 / col("l_quantity") + 0.5)
            .cast("long").as("unit_cents"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), sum(col("unit_cents")).as("sp"),
          sum(dec(col("unit_cents")) * dec(col("unit_cents"))).as("sp2"))
        .filter(col("n") >= 5L && col("sp") > 0L)
        .select(col("l_partkey"), col("n").as("n_lines"),
          snap6(col("sp").cast("double") / (col("n").cast("double")
            * 100.0)).as("mean_unit_price"),
          snap6((dec(col("n")) * col("sp2")
            - dec(col("sp")) * dec(col("sp"))).cast("double")
            / (dec(col("sp")) * dec(col("sp"))).cast("double"))
            .as("cv2"))
        .orderBy(col("cv2").desc, col("l_partkey"))
        .limit(15)
    }),

    // Pareto-knee detection on the part-revenue concentration curve
    // (Kneedle's geometric core: the knee is the rank maximizing the
    // normalized gap between cumulative revenue share and the
    // diagonal) — turns q355's fixed 80/95 ABC thresholds into a
    // DATA-CHOSEN cut ("control exactly the parts before the knee").
    // The gap ordering is fully exact: gap = cum·P − rank·T is an
    // exact DECIMAL cross-product, argmax ranks on it directly
    // (tie → smaller rank); shares are single divisions. Scale
    // shape: one corpus pass to per-part cents, then rank/cumsum/
    // totals ride DistributedRank's q101-style prefix sum over the
    // part frame (the r13 global sorted window funneled every part
    // through ONE task), and the argmax is a TakeOrdered heap — each
    // partition forwards one row, never a second global window.
    "q364_pareto_knee" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val rev = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long")
            .as("cents"))
        .groupBy(col("l_partkey")).agg(sum(col("cents")).as("rev"))
      DistributedRank.withRank(rev,
          Seq(col("rev").desc, col("l_partkey")),
          sums = Seq("rev" -> col("rev")))
        .withColumn("cum", col("run_rev"))
        .withColumn("tot", col("tot_rev"))
        .withColumn("np", col("n_all"))
        .withColumn("gap",
          dec(col("cum")) * dec(col("np")) - dec(col("rk")) * dec(col("tot")))
        .orderBy(col("gap").desc, col("rk"))
        .limit(1)
        .select(col("rk").as("knee_rank"), col("np").as("n_parts"),
          snap6(col("rk").cast("double") / col("np").cast("double"))
            .as("knee_part_share"),
          snap6(col("cum").cast("double") / col("tot").cast("double"))
            .as("knee_rev_share"),
          snap6(col("gap").cast("double")
            / (dec(col("np")) * dec(col("tot"))).cast("double"))
            .as("max_gap"))
    }),

    // Empirical upper-tail dependence λ̂ = P(price > q95 | quantity >
    // q95) — do EXTREMES co-occur? The tail question q359's partial
    // correlation (a center statistic) cannot answer: two variables
    // can be globally uncorrelated yet tail-dependent (the risk-
    // compounding case) or the reverse. Thresholds are ORDER
    // STATISTICS, never float quantiles: rank k = ceil(0.95·n) =
    // (19n+19) DIV 20 in pure integers, the threshold is the
    // smallest value whose cumulative count reaches k (= the k-th
    // order statistic), exceedance is strict >, and
    // λ̂ is one division of exact counts. Scale shape: thresholds
    // come off the DEDUPED value frames (smallest v whose cumulative
    // count reaches k — identical to the row-rank order statistic
    // because exceedance is strict, but the exchange carries
    // map-side-combined value counts, never a corpus-wide row sort:
    // the row_number formulation measured 10.3× at 10× data, this
    // one is sublinear), broadcast back as 1-row frames; one
    // counting pass, one row out.
    "q374_tail_dependence" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      val li = Tables.lineitem(s, d)
        .select(col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
      def thresh(c: String): DataFrame = li
        .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col(c))))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
        .filter(col("cum") >= expr("(19 * n + 19) DIV 20")
          && col("cum") - col("cnt") < expr("(19 * n + 19) DIV 20"))
        .select(col(c).as(s"q_$c"), col("n"))
      li.crossJoin(broadcast(thresh("x")))
        .crossJoin(broadcast(thresh("y").drop("n")))
        .agg(max(col("n")).as("n_rows"), max(col("q_x")).as("q95_qty"),
          max(col("q_y")).as("q95_cents"),
          sum(when(col("x") > col("q_x"), 1L).otherwise(0L))
            .as("n_x_exceed"),
          sum(when(col("y") > col("q_y"), 1L).otherwise(0L))
            .as("n_y_exceed"),
          sum(when(col("x") > col("q_x") && col("y") > col("q_y"), 1L)
            .otherwise(0L)).as("n_joint"))
        .select(col("n_rows"), col("q95_qty"), col("q95_cents"),
          col("n_x_exceed"), col("n_y_exceed"), col("n_joint"),
          when(col("n_x_exceed") > 0,
            snap6(col("n_joint").cast("double")
              / col("n_x_exceed").cast("double"))).as("lambda_upper"))
    }),

    // Decision-stump split finder — the CART primitive: over nine
    // decile-boundary candidate thresholds on order price, which
    // split best separates high-priority orders by weighted Gini
    // impurity? (q337 RANKS whole features by information gain; a
    // stump finds the actual CUT POINT — the first node any tree
    // learner would grow, and a one-rule baseline worth reporting
    // before any heavier model.) Candidates come from ntile
    // boundaries over the unique (price, orderkey) order; per-
    // candidate class counts are ONE conditional-aggregation pass
    // (9× bounded fan-out); the weighted Gini is a deterministic
    // double expression of exact counts, argmin on (snapped gini,
    // threshold). Scale shape: the decile boundaries come from
    // DistributedRank (q101-style distributed rank + the exact ntile
    // formula — the r13 global ntile window funneled every order
    // through ONE task), one corpus pass for the counts, a 9-row
    // readout.
    "q378_decision_stump" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("pc"),
          (col("o_orderpriority") === "1-URGENT"
            || col("o_orderpriority") === "2-HIGH").as("pos"))
      val bounds = DistributedRank.withRank(
          o.select(col("pc"), col("o_orderkey")),
          Seq(col("pc"), col("o_orderkey")))
        .withColumn("dec10", DistributedRank.ntileOf("rk", "n_all", 10))
        .filter(col("dec10") <= 9L)
        .groupBy(col("dec10")).agg(max(col("pc")).as("thr"))
      val cand = o.crossJoin(broadcast(bounds))
        .groupBy(col("dec10"), col("thr"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pc") <= col("thr") && col("pos"), 1L)
            .otherwise(0L)).as("pl"),
          sum(when(col("pc") <= col("thr") && !col("pos"), 1L)
            .otherwise(0L)).as("nl"),
          sum(when(col("pc") > col("thr") && col("pos"), 1L)
            .otherwise(0L)).as("pr"),
          sum(when(col("pc") > col("thr") && !col("pos"), 1L)
            .otherwise(0L)).as("nr"))
        .withColumn("gini", when(
          col("pl") + col("nl") > 0 && col("pr") + col("nr") > 0,
          ((col("pl") + col("nl")).cast("double")
            - (col("pl").cast("double") * col("pl").cast("double")
              + col("nl").cast("double") * col("nl").cast("double"))
              / (col("pl") + col("nl")).cast("double")
            + (col("pr") + col("nr")).cast("double")
            - (col("pr").cast("double") * col("pr").cast("double")
              + col("nr").cast("double") * col("nr").cast("double"))
              / (col("pr") + col("nr")).cast("double"))
            / col("n").cast("double")))
        .withColumn("g6", snap6(col("gini")))
        .withColumn("best", row_number().over(
          // dec10 as final tie-break (ADVICE r12): two deciles whose
          // max price coincides carry identical (g6, thr), and the
          // arbitrary winner could differ across engines/partitionings.
          Window.orderBy(col("g6").asc_nulls_last, col("thr"),
            col("dec10"))) === 1)
      cand.select(col("dec10").as("decile"),
          snap6(col("thr").cast("double") / 100.0).as("threshold"),
          (col("pl") + col("nl")).as("n_left"),
          col("pl").as("pos_left"), col("pr").as("pos_right"),
          col("g6").as("weighted_gini"), col("best").as("is_best_split"))
        .orderBy(col("decile"))
    }),

    // Lorenz curve points at customer deciles — the CURVE behind
    // q179's Gini scalar ("the bottom 50% of customers carry X% of
    // revenue"), the concentration readout a revenue-risk review
    // actually reads: customers rank ascending by exact-cent spend
    // (ntile over the unique (spend, custkey) order), each decile
    // emits its cumulative revenue share and the gap to the
    // perfect-equality diagonal — both single divisions of exact
    // DECIMAL sums (gap numerator cum·10 − d·tot is an exact
    // cross-product). Customers with no orders count at zero spend
    // (left join — the concentration question includes them).
    // Scale shape: one corpus pass to per-customer cents, deciles
    // from DistributedRank's distributed rank + exact ntile formula
    // (the r13 global ntile window funneled every customer through
    // ONE task), a 10-row readout (whose own cum/tot windows ride
    // the bounded decile frame).
    "q380_lorenz_curve" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val spend = Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("cents")),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("cents"), lit(0L)).as("cents"))
      DistributedRank.withRank(spend,
          Seq(col("cents"), col("c_custkey")))
        .withColumn("dec10", DistributedRank.ntileOf("rk", "n_all", 10))
        .groupBy(col("dec10"))
        .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("cs"))
        .withColumn("cum", sum(col("cs")).over(
          Window.orderBy(col("dec10"))))
        .withColumn("tot", sum(col("cs")).over(Window.partitionBy()))
        // zero total revenue (all-NULL prices) leaves every share
        // undefined → NULL, never an ANSI ÷0 (null-payload probe)
        .select(col("dec10").as("decile"), col("n_customers"),
          when(col("tot") > 0,
            snap6(col("cum").cast("double") / col("tot").cast("double")))
            .as("cum_revenue_share"),
          when(col("tot") > 0,
            snap6((dec(col("cum")) * lit(10L) - dec(col("dec10"))
              * dec(col("tot"))).cast("double")
              / (dec(col("tot")) * lit(10L)).cast("double")))
            .as("gap_to_equality"))
        .orderBy(col("decile"))
    }),

    // Process-capability indices Cp/Cpk for line-item quantity
    // against the spec band [1, 50] — the manufacturing-quality
    // lens that closes the SPC family (q330's EWMA and q237's CUSUM
    // watch the process IN TIME; capability asks whether the process
    // fits its tolerances AT ALL — Cpk < 1 means defects are
    // structural, not incidental): Cp = (USL−LSL)·n/(6√vnum) and
    // Cpk = min(USL·n−S, S−LSL·n)/(3√vnum) with vnum = nΣx²−S²,
    // so both are deterministic double expressions of exact integer
    // operands; the out-of-spec share is an exact count ratio.
    // Scale shape: one corpus pass to 4 counters, one row out.
    // Delegates to the library op [[graft.ops.Stats.capability]] (the
    // Frame.stats facade runs the same code path); spec limits are the
    // corpus quantity domain [1, 50].
    "q382_process_capability" -> ((s, d) =>
      graft.ops.Stats.capability(Tables.lineitem(s, d), "l_quantity",
          lsl = 1L, usl = 50L)
        .withColumnRenamed("mean_x", "mean_qty"))
  )

  def oracle: Map[String, String] = Map(
    "q231_mannwhitney" ->
      """WITH bv AS (SELECT value, event_type, count(*) AS ca
        |  FROM events GROUP BY 1, 2),
        |tv AS (SELECT value, CAST(sum(ca) AS BIGINT) AS cv
        |  FROM bv GROUP BY 1),
        |rk AS (SELECT value,
        |    2 * (sum(cv) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) - cv) + cv + 1 AS rank2
        |  FROM tv),
        |g AS (SELECT CAST(sum(cv) AS BIGINT) AS n_total FROM tv),
        |a AS (SELECT event_type, CAST(sum(ca) AS BIGINT) AS n_a,
        |    sum(ca * rank2) AS r2a
        |  FROM bv JOIN rk USING (value) GROUP BY 1),
        |u AS (SELECT event_type, n_a, n_total - n_a AS n_b,
        |    CAST(r2a - n_a * (n_a + 1) AS DOUBLE) AS u2
        |  FROM a, g)
        |SELECT event_type, n_a, n_b,
        |  floor(u2 / CAST(2 AS DOUBLE) * 1e6 + 0.5) / 1e6 AS u_stat,
        |  CASE WHEN n_b > 0 THEN
        |    floor(u2 / (CAST(2 AS DOUBLE) * CAST(n_a AS DOUBLE)
        |      * CAST(n_b AS DOUBLE)) * 1e6 + 0.5) / 1e6 END AS auc
        |FROM u ORDER BY event_type""".stripMargin,

    "q236_spearman" ->
      """WITH sp AS (SELECT o_custkey,
        |    sum(o_totalprice::DECIMAL(12,2)) AS spend
        |  FROM orders GROUP BY 1),
        |b AS (SELECT c_mktsegment AS seg, c_acctbal AS x,
        |    coalesce(spend, 0) AS y
        |  FROM customer LEFT JOIN sp ON c_custkey = o_custkey),
        |r AS (SELECT seg,
        |    count(*) OVER (PARTITION BY seg) AS n,
        |    2 * (count(*) OVER (PARTITION BY seg ORDER BY x
        |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - count(*) OVER (PARTITION BY seg, x))
        |      + count(*) OVER (PARTITION BY seg, x) + 1 AS r2x,
        |    2 * (count(*) OVER (PARTITION BY seg ORDER BY y
        |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - count(*) OVER (PARTITION BY seg, y))
        |      + count(*) OVER (PARTITION BY seg, y) + 1 AS r2y
        |  FROM b),
        |dv AS (SELECT seg, n, r2x - (n + 1) AS dx, r2y - (n + 1) AS dy
        |  FROM r),
        |g AS (SELECT seg, CAST(max(n) AS BIGINT) AS n_customers,
        |    sum(dx * dy) AS sxy, sum(dx * dx) AS sxx,
        |    sum(dy * dy) AS syy
        |  FROM dv GROUP BY 1)
        |SELECT seg, n_customers,
        |  CASE WHEN sxx > 0 AND syy > 0 THEN
        |    floor(CAST(sxy AS DOUBLE)
        |      / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
        |      * 1e6 + 0.5) / 1e6
        |  ELSE CAST(0 AS DOUBLE) END AS rho
        |FROM g ORDER BY seg""".stripMargin,

    // the sketch estimates are folded into tolerance booleans on the
    // Spark side, so the exact engine's answer is (exact, TRUE, TRUE).
    "q39_approx_sketch" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS acd_within_5pct,
        |  TRUE AS p50_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the shard/merge machinery is Spark-side; the exact engine
    // verifies the shard count, the row total (proves no shard was
    // lost in the parquet round-trip), the exact distinct, and that
    // both estimate booleans fold to TRUE.
    "q115_sketch_rollup" ->
      """SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_shards,
        |  CAST(count(*) AS BIGINT) AS rows_total,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS merged_within_5pct,
        |  TRUE AS direct_within_5pct
        |FROM events""".stripMargin,

    // the oracle recomputes the VIEW FROM SCRATCH over the full table:
    // the incremental state+delta merge must equal it to the cent.
    "q122_incremental_mv" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
        |    AS DECIMAL(14,2)) AS VARCHAR) AS total
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q86_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity) FILTER (l_linestatus = 'F'), 2) AS "F",
        |  round(sum(l_quantity) FILTER (l_linestatus = 'O'), 2) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q87_unpivot" ->
      """SELECT p_partkey, 'size_v' AS metric, CAST(p_size AS BIGINT) AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'mod_v' AS metric, p_partkey % 10 AS value
        |FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    "q30_agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  count(*) AS n_rows, count(l_quantity) AS n_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q31_agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_parts,
        |  count(DISTINCT (l_suppkey, l_partkey)) AS nd_ps,
        |  round(sum(DISTINCT l_quantity), 2) AS sumd_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q32_agg_first_last" ->
      """SELECT o_orderstatus,
        |  arg_min(o_totalprice, CAST(epoch(o_orderdate) AS BIGINT) * 1000000000 + o_orderkey) AS first_price,
        |  arg_max(o_totalprice, CAST(epoch(o_orderdate) AS BIGINT) * 1000000000 + o_orderkey) AS last_price,
        |  min(o_orderdate) AS first_date, max(o_orderdate) AS last_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q33_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS sd_samp,
        |  round(stddev_pop(l_quantity), 6) AS sd_pop,
        |  round(var_samp(l_quantity), 6) AS var_samp,
        |  round(var_pop(l_quantity), 6) AS var_pop,
        |  CASE WHEN stddev_pop(l_quantity) * stddev_pop(l_extendedprice) > 0
        |    THEN round(covar_pop(l_quantity, l_extendedprice)
        |      / (stddev_pop(l_quantity) * stddev_pop(l_extendedprice)), 6)
        |  END AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q33c_listagg_mode" ->
      """SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
        |    AS k_listagg,
        |  mode(l_linenumber % 2) AS k_mode,
        |  mode(l_linenumber % 2) AS k_mode_wg
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q31b_bitmap_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_distinct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q33b_agg_extras" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 1) AS k_booland,
        |  bool_or(l_discount = 0) AS k_boolor,
        |  bit_and(l_linenumber) AS k_bitand,
        |  bit_or(l_linenumber) AS k_bitor,
        |  bit_xor(l_linenumber) AS k_bitxor,
        |  median(l_quantity) AS k_median,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS k_slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS k_icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS k_r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS k_rcount,
        |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS k_avgx,
        |  round(regr_avgy(l_extendedprice, l_quantity), 6) AS k_avgy,
        |  round(regr_sxx(l_extendedprice, l_quantity), 2) AS k_sxx,
        |  round(regr_sxy(l_extendedprice, l_quantity), 2) AS k_sxy
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q34_agg_skew_kurt" ->
      """WITH m AS (SELECT l_returnflag AS g, avg(l_quantity) AS mu
        |           FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |  round((sum(pow(l_quantity - mu, 3)) / count(*))
        |    / pow(sum(pow(l_quantity - mu, 2)) / count(*), 1.5), 6) AS skew_qty,
        |  round((sum(pow(l_quantity - mu, 4)) / count(*))
        |    / pow(sum(pow(l_quantity - mu, 2)) / count(*), 2) - 3, 6) AS kurt_qty
        |FROM lineitem JOIN m ON l_returnflag = m.g
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q35_agg_global" ->
      """SELECT round(sum(l_extendedprice), 2) AS sum_price,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS n, count(DISTINCT l_orderkey) AS nd_orders
        |FROM lineitem""".stripMargin,

    "q36_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q37_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q38_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q75_salted_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q143_ab_test" ->
      """WITH m AS (SELECT user_id, round(sum(value), 4) AS m,
        |    (user_id * 2654435761 + 7919) % 2 AS v
        |  FROM events GROUP BY user_id),
        |r AS (SELECT
        |    count(*) FILTER (v = 0) AS n_a,
        |    count(*) FILTER (v = 1) AS n_b,
        |    floor(avg(m) FILTER (v = 0) * 1e6 + 0.5) / 1e6 AS mean_a,
        |    floor(avg(m) FILTER (v = 1) * 1e6 + 0.5) / 1e6 AS mean_b,
        |    floor(var_samp(m) FILTER (v = 0) * 1e6 + 0.5) / 1e6 AS var_a,
        |    floor(var_samp(m) FILTER (v = 1) * 1e6 + 0.5) / 1e6 AS var_b
        |  FROM m)
        |SELECT n_a, n_b, mean_a, mean_b,
        |  (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) AS t_stat,
        |  abs((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b)) > 1.96
        |    AS significant
        |FROM r""".stripMargin,

    // exact trailing-7-day distinct; the sketch estimate is asserted
    // in-query as the 5%-envelope boolean (q115 recipe) the oracle
    // reproduces as a constant.
    "q134_rolling_hll" ->
      """WITH du AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |ex AS (SELECT d.day, count(DISTINCT du.user_id) AS exact_7d
        |  FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY d.day)
        |SELECT day, CAST(exact_7d AS BIGINT) AS exact_7d,
        |  TRUE AS est_within_5pct
        |FROM ex ORDER BY day""".stripMargin,

    "q136_equidepth_hist" -> {
      val ps = (1 to 15).map(i => i / 16.0).mkString(", ")
      s"""WITH b AS (SELECT list_transform(
         |    quantile_cont(l_extendedprice, [$ps]), q -> round(q, 4)) AS bs
         |  FROM lineitem),
         |c AS (SELECT l.l_extendedprice AS x,
         |    CAST(len(list_filter(b.bs, e -> l.l_extendedprice > e)) AS INT)
         |      AS bucket
         |  FROM lineitem l CROSS JOIN b)
         |SELECT bucket, count(*) AS n, min(x) AS min_x, max(x) AS max_x,
         |  round(sum(x), 2) AS sum_x
         |FROM c GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    "q132_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.05), 4) AS lo,
        |    round(quantile_cont(l_extendedprice, 0.95), 4) AS hi
        |  FROM lineitem GROUP BY l_returnflag),
        |c AS (SELECT l.l_returnflag, b.lo, b.hi, l.l_extendedprice AS x,
        |    CASE WHEN l.l_extendedprice < b.lo THEN b.lo
        |         WHEN l.l_extendedprice > b.hi THEN b.hi
        |         ELSE l.l_extendedprice END AS clipped
        |  FROM lineitem l JOIN b USING (l_returnflag))
        |SELECT l_returnflag, lo, hi, count(*) AS n,
        |  CAST(sum(CASE WHEN x < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped_lo,
        |  CAST(sum(CASE WHEN x > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped_hi,
        |  round(sum(clipped), 2) AS sum_clipped,
        |  round(avg(clipped), 4) AS avg_clipped,
        |  min(clipped) AS min_clipped,
        |  max(clipped) AS max_clipped
        |FROM c GROUP BY l_returnflag, lo, hi
        |ORDER BY l_returnflag""".stripMargin,

    "q213_supplier_hhi" ->
      """WITH ps AS (SELECT s_nationkey, s_suppkey,
        |    CAST(round(sum(l_extendedprice::DECIMAL(12,2)
        |      * (1 - l_discount::DECIMAL(12,2))), 2) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem, supplier WHERE l_suppkey = s_suppkey
        |  GROUP BY 1, 2)
        |SELECT s_nationkey, count(*) AS n_suppliers,
        |  floor(CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
        |    / (CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
        |    * 1e6 + 0.5) / 1e6 AS hhi
        |FROM ps GROUP BY 1 ORDER BY 1""".stripMargin,

    "q212_discount_response" ->
      """WITH g AS (SELECT l_discount, count(*) AS n_lines,
        |    sum(l_quantity) AS sum_qty,
        |    round(sum(l_extendedprice::DECIMAL(12,2)
        |      * (1 - l_discount::DECIMAL(12,2))), 2) AS rev_dec
        |  FROM lineitem GROUP BY l_discount),
        |t AS (SELECT sum(rev_dec) AS total_dec FROM g)
        |SELECT l_discount, n_lines,
        |  sum_qty / CAST(n_lines AS DOUBLE) AS avg_qty,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(rev_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) AS rev_share
        |FROM g, t ORDER BY l_discount""".stripMargin,

    "q39b_percentile_exact" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q157_chi_square" ->
      """WITH cells AS (SELECT p.p_brand, l.l_returnflag,
        |    count(*) AS observed
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |m AS (SELECT p_brand, l_returnflag, observed,
        |    sum(observed) OVER (PARTITION BY p_brand) AS row_n,
        |    sum(observed) OVER (PARTITION BY l_returnflag) AS col_n,
        |    sum(observed) OVER () AS total_n
        |  FROM cells)
        |SELECT p_brand, l_returnflag, CAST(observed AS BIGINT) AS observed,
        |  CAST(row_n * col_n AS DOUBLE) / CAST(total_n AS DOUBLE)
        |    AS expected,
        |  (CAST(observed AS DOUBLE)
        |     - CAST(row_n * col_n AS DOUBLE) / CAST(total_n AS DOUBLE))
        |  * (CAST(observed AS DOUBLE)
        |     - CAST(row_n * col_n AS DOUBLE) / CAST(total_n AS DOUBLE))
        |  / (CAST(row_n * col_n AS DOUBLE) / CAST(total_n AS DOUBLE))
        |    AS chi2_cell
        |FROM m ORDER BY p_brand, l_returnflag""".stripMargin,

    // component-sums least squares, same parenthesization as Spark:
    // n/Σx/Σx² exact ints, Σy/Σxy snapped, then pure IEEE arithmetic.
    "q162_trend_forecast" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', ts::DATE) AS DOUBLE)
        |      AS x,
        |    round(sum(value), 4) AS day_sum
        |  FROM events GROUP BY event_type, ts::DATE),
        |r AS (SELECT event_type, count(*) AS n_days,
        |    sum(x) AS sx, sum(x * x) AS sxx,
        |    round(sum(day_sum), 4) AS sy,
        |    round(sum(x * day_sum), 2) AS sxy,
        |    max(x) AS max_x
        |  FROM daily GROUP BY event_type),
        |k AS (SELECT event_type, n_days, max_x,
        |    CASE WHEN n_days * sxx - sx * sx > 0 THEN
        |      (n_days * sxy - sx * sy) / (n_days * sxx - sx * sx)
        |    END AS slope,
        |    sy, sx
        |  FROM r),
        |f AS (SELECT event_type, n_days, max_x, slope,
        |    (sy - slope * sx) / n_days AS icept
        |  FROM k)
        |SELECT event_type, n_days, slope, icept,
        |  icept + slope * (max_x + 1) AS forecast_next
        |FROM f ORDER BY event_type""".stripMargin,

    "q177_weighted_median" ->
      """WITH j AS (SELECT p_brand, l_extendedprice AS price,
        |    CAST(l_quantity AS BIGINT) AS wt, l_orderkey, l_linenumber
        |  FROM lineitem, part WHERE l_partkey = p_partkey),
        |c AS (SELECT *,
        |    sum(wt) OVER (PARTITION BY p_brand
        |      ORDER BY price, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(wt) OVER (PARTITION BY p_brand) AS w_total
        |  FROM j)
        |SELECT p_brand, min(price) AS weighted_median_price,
        |  CAST(max(w_total) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= w_total
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q288_kendall_tau" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x, round(sum(value), 4) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN (xa < xb AND ya < yb)
        |      OR (xa > xb AND ya > yb) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS concordant,
        |    CAST(sum(CASE WHEN (xa < xb AND ya > yb)
        |      OR (xa > xb AND ya < yb) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS discordant,
        |    CAST(sum(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_x,
        |    CAST(sum(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_y
        |  FROM p GROUP BY 1)
        |SELECT event_type, n_pairs, concordant, discordant, ties_x,
        |  ties_y,
        |  CASE WHEN n_pairs > ties_x AND n_pairs > ties_y THEN
        |    floor(CAST(concordant - discordant AS DOUBLE)
        |      / sqrt(CAST(n_pairs - ties_x AS DOUBLE)
        |        * CAST(n_pairs - ties_y AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |  END AS tau_b
        |FROM g ORDER BY event_type""".stripMargin,

    "q290_kruskal_wallis" ->
      """WITH bv AS (SELECT value, event_type, count(*) AS ca
        |  FROM events GROUP BY 1, 2),
        |tv AS (SELECT value, CAST(sum(ca) AS BIGINT) AS cv
        |  FROM bv GROUP BY 1),
        |rk AS (SELECT value, cv,
        |    2 * (sum(cv) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) - cv) + cv + 1 AS rank2
        |  FROM tv),
        |a AS (SELECT event_type, CAST(sum(ca) AS BIGINT) AS n_a,
        |    sum(ca * rank2) AS r2a,
        |    sum(ca * (cv * cv - 1)) AS tie_a
        |  FROM bv JOIN rk USING (value) GROUP BY 1),
        |w AS (SELECT event_type, n_a, r2a, tie_a,
        |    sum(n_a) OVER () AS n, sum(tie_a) OVER () AS tsum
        |  FROM a),
        |t AS (SELECT event_type, n_a, r2a, n, tsum,
        |    CAST(r2a - n_a * (n + 1) AS DOUBLE)
        |      * CAST(r2a - n_a * (n + 1) AS DOUBLE)
        |      / (CAST(4 AS DOUBLE) * CAST(n_a AS DOUBLE)) AS term
        |  FROM w),
        |h AS (SELECT event_type, n_a, r2a, n, tsum,
        |    CAST(12 AS DOUBLE) * sum(term) OVER ()
        |      / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) AS h,
        |    CASE WHEN n > 1 THEN CAST(1 AS DOUBLE)
        |      - CAST(tsum AS DOUBLE)
        |      / CAST(n * n * n - n AS DOUBLE) END AS tie_c
        |  FROM t)
        |SELECT event_type, n_a,
        |  floor(CAST(r2a AS DOUBLE) / (CAST(2 AS DOUBLE)
        |    * CAST(n_a AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mean_rank,
        |  floor(h * 1e6 + 0.5) / 1e6 AS h_stat,
        |  CASE WHEN tie_c <> 0 THEN
        |    floor(h / tie_c * 1e6 + 0.5) / 1e6 END AS h_adj
        |FROM h ORDER BY event_type""".stripMargin,

    "q292_cramers_v" ->
      """WITH cells AS (SELECT event_type,
        |    CAST(((CAST(ts AS DATE) - DATE '2024-01-01') % 7 + 7) % 7
        |      AS BIGINT) AS dow,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, dow, o,
        |    CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
        |    CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS ct,
        |    CAST(sum(o) OVER () AS BIGINT) AS n
        |  FROM cells),
        |c2 AS (SELECT *,
        |    (CAST(o AS DOUBLE) - CAST(CAST(rt AS HUGEINT)
        |        * CAST(ct AS HUGEINT) AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(o AS DOUBLE) - CAST(CAST(rt AS HUGEINT)
        |        * CAST(ct AS HUGEINT) AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(CAST(rt AS HUGEINT) * CAST(ct AS HUGEINT)
        |          AS DOUBLE) / CAST(n AS DOUBLE)) AS cell
        |  FROM w),
        |dims AS (SELECT count(DISTINCT event_type) AS r,
        |    count(DISTINCT dow) AS c FROM cells),
        |tot AS (SELECT sum(cell) AS chi2 FROM c2),
        |g AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n_rows,
        |    floor(sum(cell) * 1e6 + 0.5) / 1e6 AS chi2_part,
        |    max(n) AS nn
        |  FROM c2 GROUP BY 1)
        |SELECT g.event_type, g.n_rows, g.chi2_part,
        |  floor(chi2 * 1e6 + 0.5) / 1e6 AS chi2,
        |  CAST(least(r - 1, c - 1) AS BIGINT) AS df_star,
        |  CASE WHEN least(r - 1, c - 1) > 0 THEN
        |    floor(sqrt(chi2 / (CAST(nn AS DOUBLE)
        |      * CAST(least(r - 1, c - 1) AS DOUBLE))) * 1e6 + 0.5) / 1e6
        |    END AS v_cramer
        |FROM g, dims, tot ORDER BY event_type""".stripMargin,

    "q294_isotonic_response" ->
      """WITH lv AS (SELECT
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS pct,
        |    CAST(count(*) AS BIGINT) AS den,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS num
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT pct, den, num,
        |    CAST(sum(num) OVER (ORDER BY pct ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
        |    CAST(sum(den) OVER (ORDER BY pct ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cd
        |  FROM lv),
        |pr AS (SELECT j.pct AS pj, k.pct AS pk,
        |    CAST(k.cn - (j.cn - j.num) AS DOUBLE)
        |      / CAST(k.cd - (j.cd - j.den) AS DOUBLE) AS m
        |  FROM c j JOIN c k ON j.pct <= k.pct),
        |inn AS (SELECT i.pct, i.den, i.num, pr.pj,
        |    min(pr.m) AS inner_min
        |  FROM c i JOIN pr ON pr.pj <= i.pct AND i.pct <= pr.pk
        |  GROUP BY 1, 2, 3, 4),
        |f AS (SELECT pct, den, num, max(inner_min) AS iso
        |  FROM inn GROUP BY 1, 2, 3)
        |SELECT pct, den AS n_rows,
        |  floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS raw_rate,
        |  floor(iso * 1e6 + 0.5) / 1e6 AS iso_rate
        |FROM f ORDER BY pct""".stripMargin,

    "q301_mantel_haenszel" ->
      """WITH cells AS (SELECT p_brand,
        |    CAST(sum(CASE WHEN l_discount >= 0.05::DOUBLE
        |      AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN l_discount >= 0.05::DOUBLE
        |      AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN l_discount < 0.05::DOUBLE
        |      AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN l_discount < 0.05::DOUBLE
        |      AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |w AS (SELECT *, a + b + c + d AS n FROM cells),
        |t AS (SELECT *,
        |    CASE WHEN n > 0 THEN
        |      CAST(CAST(a AS HUGEINT) * CAST(d AS HUGEINT) AS DOUBLE)
        |        / CAST(n AS DOUBLE) END AS adn,
        |    CASE WHEN n > 0 THEN
        |      CAST(CAST(b AS HUGEINT) * CAST(c AS HUGEINT) AS DOUBLE)
        |        / CAST(n AS DOUBLE) END AS bcn
        |  FROM w),
        |g AS (SELECT *, CASE WHEN sum(bcn) OVER () > 0 THEN
        |    sum(adn) OVER () / sum(bcn) OVER () END AS mh
        |  FROM t)
        |SELECT p_brand, a, b, c, d,
        |  CASE WHEN CAST(b AS HUGEINT) * CAST(c AS HUGEINT) > 0 THEN
        |    floor(CAST(CAST(a AS HUGEINT) * CAST(d AS HUGEINT)
        |        AS DOUBLE)
        |      / CAST(CAST(b AS HUGEINT) * CAST(c AS HUGEINT)
        |        AS DOUBLE) * 1e6 + 0.5) / 1e6
        |  END AS or_stratum,
        |  floor(mh * 1e6 + 0.5) / 1e6 AS mh_or
        |FROM g ORDER BY p_brand""".stripMargin,

    "q305_theil_decomposition" ->
      """WITH sp AS (SELECT o_custkey,
        |    CAST(round(sum(o_totalprice::DECIMAL(12,2)), 2) * 100
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |b AS (SELECT c_nationkey, cents,
        |    CAST(count(*) OVER (PARTITION BY c_nationkey) AS BIGINT)
        |      AS nn,
        |    CAST(sum(cents) OVER (PARTITION BY c_nationkey) AS BIGINT)
        |      AS xn,
        |    CAST(count(*) OVER () AS BIGINT) AS n_tot,
        |    CAST(sum(cents) OVER () AS BIGINT) AS x_tot
        |  FROM sp JOIN customer ON o_custkey = c_custkey),
        |t AS (SELECT *,
        |    CAST(cents AS HUGEINT)
        |      * (CAST(floor(ln(CAST(CAST(cents AS HUGEINT) * nn
        |            AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |        - CAST(floor(ln(CAST(xn AS DOUBLE)) * 1e6 + 0.5)
        |          AS BIGINT)) AS term,
        |    CAST(cents AS HUGEINT)
        |      * (CAST(floor(ln(CAST(CAST(cents AS HUGEINT) * n_tot
        |            AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |        - CAST(floor(ln(CAST(x_tot AS DOUBLE)) * 1e6 + 0.5)
        |          AS BIGINT)) AS term_g
        |  FROM b),
        |n AS (SELECT c_nationkey, max(nn) AS n_cust, max(xn) AS xn,
        |    max(n_tot) AS n_tot, max(x_tot) AS x_tot,
        |    sum(term) AS sterm, sum(term_g) AS sterm_g
        |  FROM t GROUP BY 1),
        |nb AS (SELECT *,
        |    CAST(xn AS HUGEINT)
        |      * (CAST(floor(ln(CAST(CAST(xn AS HUGEINT) * n_tot
        |            AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |        - CAST(floor(ln(CAST(CAST(x_tot AS HUGEINT) * n_cust
        |            AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS bterm
        |  FROM n),
        |g AS (SELECT *, sum(sterm) OVER () AS sw,
        |    sum(bterm) OVER () AS sb, sum(sterm_g) OVER () AS sg
        |  FROM nb)
        |SELECT c_nationkey, n_cust,
        |  CAST(xn AS DOUBLE) / 100.0::DOUBLE AS revenue,
        |  floor(CAST(sterm AS DOUBLE) / (CAST(xn AS DOUBLE) * 1e6)
        |    * 1e6 + 0.5) / 1e6 AS t_within_nation,
        |  floor(CAST(xn AS DOUBLE) / CAST(x_tot AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS weight,
        |  floor(CAST(sw AS DOUBLE) / (CAST(x_tot AS DOUBLE) * 1e6)
        |    * 1e6 + 0.5) / 1e6 AS theil_within,
        |  floor(CAST(sb AS DOUBLE) / (CAST(x_tot AS DOUBLE) * 1e6)
        |    * 1e6 + 0.5) / 1e6 AS theil_between,
        |  floor(CAST(sg AS DOUBLE) / (CAST(x_tot AS DOUBLE) * 1e6)
        |    * 1e6 + 0.5) / 1e6 AS theil_total
        |FROM g ORDER BY c_nationkey""".stripMargin,

    "q327_brown_forsythe" ->
      """WITH med AS (SELECT event_type,
        |    round(quantile_cont(value, 0.5), 4) AS med
        |  FROM events GROUP BY 1),
        |z AS (SELECT e.event_type,
        |    CAST(floor(abs(e.value - m.med) * 1e6 + 0.5) AS BIGINT)
        |      AS zmu
        |  FROM events e JOIN med m USING (event_type)),
        |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
        |    sum(CAST(zmu AS HUGEINT)) AS sz,
        |    sum(CAST(zmu AS HUGEINT) * CAST(zmu AS HUGEINT)) AS szz
        |  FROM z GROUP BY 1),
        |tb AS (SELECT *, (sz * sz) // CAST(ng AS HUGEINT) AS tbv
        |  FROM pt),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    sum(sz) AS t, sum(szz) AS szz_all, sum(tbv) AS tb_all
        |  FROM tb),
        |f AS (SELECT *,
        |    tb_all - (t * t) // CAST(n AS HUGEINT) AS ssb,
        |    szz_all - tb_all AS ssw
        |  FROM g WHERE k > 1 AND n > k)
        |SELECT k AS n_groups, n AS n_rows,
        |  floor(CAST(ssb AS DOUBLE) / 1e12 / CAST(k - 1 AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS msb_dev,
        |  floor(CAST(ssw AS DOUBLE) / 1e12 / CAST(n - k AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS msw_dev,
        |  CASE WHEN ssw > 0 THEN
        |    floor(CAST(ssb * CAST(n - k AS HUGEINT) AS DOUBLE)
        |      / CAST(ssw * CAST(k - 1 AS HUGEINT) AS DOUBLE)
        |      * 1e6 + 0.5) / 1e6 END AS f_stat
        |FROM f""".stripMargin,

    "q324_icc_users" ->
      """WITH pu AS (SELECT event_type, user_id,
        |    CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sg,
        |    sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)
        |      * CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS sxx
        |  FROM events GROUP BY 1, 2),
        |tg AS (SELECT *, (CAST(sg AS HUGEINT) * CAST(sg AS HUGEINT)
        |    * 100) // ng AS tgv FROM pu),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS g,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    sum(CAST(sg AS HUGEINT)) AS t,
        |    sum(sxx) AS sx2,
        |    sum(tgv) AS tb_micro,
        |    sum(CAST(ng AS HUGEINT) * CAST(ng AS HUGEINT)) AS sn2
        |  FROM tg GROUP BY 1),
        |f AS (SELECT *,
        |    tb_micro - (t * t * 100) // CAST(n AS HUGEINT) AS ssb_micro,
        |    sx2 * 100 - tb_micro AS ssw_micro,
        |    ((CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - sn2) * 1000000)
        |      // (CAST(n AS HUGEINT) * CAST(g - 1 AS HUGEINT)) AS k0m
        |  FROM g WHERE g > 1 AND n > g),
        |m AS (SELECT event_type, g, n,
        |    CAST(ssb_micro AS DOUBLE) / 1e6 / CAST(g - 1 AS DOUBLE)
        |      AS msb,
        |    CAST(ssw_micro AS DOUBLE) / 1e6 / CAST(n - g AS DOUBLE)
        |      AS msw,
        |    CAST(k0m AS DOUBLE) / 1e6 AS k0
        |  FROM f)
        |SELECT event_type, g AS n_users, n AS n_rows,
        |  floor(msb * 1e6 + 0.5) / 1e6 AS msb,
        |  floor(msw * 1e6 + 0.5) / 1e6 AS msw,
        |  floor(k0 * 1e6 + 0.5) / 1e6 AS k0,
        |  CASE WHEN msb + (k0 - CAST(1 AS DOUBLE)) * msw <> 0 THEN
        |    floor((msb - msw) / (msb + (k0 - CAST(1 AS DOUBLE)) * msw)
        |      * 1e6 + 0.5) / 1e6 END AS icc
        |FROM m ORDER BY event_type""".stripMargin,

    "q317_trend_test" ->
      """WITH lv AS (SELECT l_linestatus,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS i,
        |    CAST(count(*) AS BIGINT) AS n_i,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r_i
        |  FROM lineitem GROUP BY 1, 2),
        |g AS (SELECT l_linestatus,
        |    CAST(count(*) AS BIGINT) AS n_levels,
        |    CAST(sum(n_i) AS BIGINT) AS n,
        |    CAST(sum(r_i) AS BIGINT) AS r,
        |    sum(CAST(i AS HUGEINT) * CAST(n_i AS HUGEINT)) AS s1,
        |    sum(CAST(i AS HUGEINT) * CAST(i AS HUGEINT)
        |      * CAST(n_i AS HUGEINT)) AS s2,
        |    sum(CAST(i AS HUGEINT) * CAST(r_i AS HUGEINT)) AS sr
        |  FROM lv GROUP BY 1),
        |t AS (SELECT *,
        |    CAST(n AS HUGEINT) * sr - CAST(r AS HUGEINT) * s1 AS ts,
        |    CAST(n AS HUGEINT) * s2 - s1 * s1 AS vn
        |  FROM g)
        |SELECT l_linestatus, n_levels, n, r,
        |  floor(CAST(ts AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS trend_stat,
        |  CASE WHEN r > 0 AND r < n AND vn > 0 THEN
        |    floor(CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)
        |      * CAST(n AS DOUBLE)
        |      / (CAST(r AS DOUBLE) * CAST(n - r AS DOUBLE)
        |        * CAST(vn AS DOUBLE)) * 1e6 + 0.5) / 1e6 END AS z2
        |FROM t ORDER BY l_linestatus""".stripMargin,

    "q318_l_moments" ->
      """WITH rk AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS BIGINT) AS r
        |  FROM events),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(cents AS HUGEINT)) AS s0,
        |    sum(CAST(r - 1 AS HUGEINT) * CAST(cents AS HUGEINT)) AS s1,
        |    sum(CAST(r - 1 AS HUGEINT) * CAST(r - 2 AS HUGEINT)
        |      * CAST(cents AS HUGEINT)) AS s2
        |  FROM rk GROUP BY 1),
        |b AS (SELECT *,
        |    CAST(s0 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(100 AS
        |      DOUBLE)) AS b0,
        |    CAST(s1 AS DOUBLE) / (CAST(CAST(n AS HUGEINT)
        |      * CAST(n - 1 AS HUGEINT) AS DOUBLE) * CAST(100 AS DOUBLE))
        |      AS b1,
        |    CAST(s2 AS DOUBLE) / (CAST(CAST(n AS HUGEINT)
        |      * CAST(n - 1 AS HUGEINT) * CAST(n - 2 AS HUGEINT)
        |      AS DOUBLE) * CAST(100 AS DOUBLE)) AS b2
        |  FROM g),
        |l AS (SELECT *, CAST(2 AS DOUBLE) * b1 - b0 AS l2v,
        |    CAST(6 AS DOUBLE) * b2 - CAST(6 AS DOUBLE) * b1 + b0 AS l3v
        |  FROM b)
        |SELECT event_type, n,
        |  floor(b0 * 1e6 + 0.5) / 1e6 AS l1,
        |  floor(l2v * 1e6 + 0.5) / 1e6 AS l2,
        |  CASE WHEN b0 <> 0 THEN floor(l2v / b0 * 1e6 + 0.5) / 1e6 END
        |    AS l_cv,
        |  CASE WHEN l2v <> 0 THEN floor(l3v / l2v * 1e6 + 0.5) / 1e6 END
        |    AS l_skew
        |FROM l ORDER BY event_type""".stripMargin,

    "q308_basket_rules" ->
      """WITH od AS (SELECT DISTINCT l_orderkey AS ok,
        |    l_partkey AS pk FROM lineitem),
        |pairs AS (SELECT a.pk, b.pk AS pk_b,
        |    CAST(count(*) AS BIGINT) AS supp_ab
        |  FROM od a JOIN od b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sa AS (SELECT pk, CAST(count(*) AS BIGINT) AS supp_a
        |  FROM od GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders
        |  FROM od),
        |sc AS (SELECT p.pk, p.pk_b, p.supp_ab, a.supp_a,
        |    b.supp_a AS supp_b, n.n_orders,
        |    CAST(CAST(p.supp_ab AS HUGEINT)
        |      * CAST(n.n_orders AS HUGEINT) AS DOUBLE)
        |      / CAST(CAST(a.supp_a AS HUGEINT)
        |        * CAST(b.supp_a AS HUGEINT) AS DOUBLE) AS lift
        |  FROM pairs p
        |  JOIN sa a ON p.pk = a.pk
        |  JOIN sa b ON p.pk_b = b.pk
        |  CROSS JOIN n),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY lift DESC,
        |    pk, pk_b) AS BIGINT) AS rnk FROM sc)
        |SELECT rnk, pk AS part_a, pk_b AS part_b, supp_ab,
        |  floor(CAST(supp_ab AS DOUBLE) / CAST(supp_a AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS confidence,
        |  floor(lift * 1e6 + 0.5) / 1e6 AS lift
        |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin,

    "q310_wasserstein" ->
      """WITH bv AS (SELECT value, event_type AS t,
        |    CAST(count(*) AS BIGINT) AS ca
        |  FROM events GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT value FROM bv),
        |tys AS (SELECT DISTINCT t FROM bv),
        |grid AS (SELECT v.value, ty.t, coalesce(b.ca, 0) AS ca
        |  FROM vals v CROSS JOIN tys ty
        |  LEFT JOIN bv b ON b.value = v.value AND b.t = ty.t),
        |c AS (SELECT value, t,
        |    CAST(sum(ca) OVER (PARTITION BY t ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(ca) OVER (PARTITION BY t) AS BIGINT) AS nt
        |  FROM grid),
        |p AS (SELECT a.t, b.t AS t_b, a.value,
        |    lead(a.value) OVER (PARTITION BY a.t, b.t
        |      ORDER BY a.value) - a.value AS dv,
        |    abs(CAST(a.cum AS HUGEINT) * b.nt
        |      - CAST(b.cum AS HUGEINT) * a.nt) AS gap,
        |    a.nt AS nt, b.nt AS nt_b
        |  FROM c a JOIN c b ON a.value = b.value AND a.t < b.t),
        |s AS (SELECT t, t_b, CAST(count(*) AS BIGINT) AS n_grid,
        |    CAST(sum(CAST(floor(CAST(gap AS DOUBLE)
        |      / CAST(CAST(nt AS HUGEINT) * nt_b AS DOUBLE)
        |      * dv * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s6
        |  FROM p WHERE dv IS NOT NULL GROUP BY 1, 2)
        |SELECT t AS type_a, t_b AS type_b, n_grid,
        |  floor(CAST(s6 AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6
        |    AS w1_distance
        |FROM s ORDER BY type_a, type_b""".stripMargin,

    "q331_cliffs_delta" ->
      """WITH o AS (SELECT o_orderpriority AS prio, o_totalprice AS v
        |  FROM orders),
        |vt AS (SELECT v, CAST(count(*) AS BIGINT) AS nv FROM o
        |  GROUP BY 1),
        |vc AS (SELECT v, nv,
        |    CAST(sum(nv) OVER (ORDER BY v) AS BIGINT) AS cum_le,
        |    CAST(sum(nv) OVER () AS BIGINT) AS n_all
        |  FROM vt),
        |pv AS (SELECT prio, v, CAST(count(*) AS BIGINT) AS np FROM o
        |  GROUP BY 1, 2),
        |pc AS (SELECT prio, v, np,
        |    CAST(sum(np) OVER (PARTITION BY prio ORDER BY v) AS BIGINT)
        |      AS cump_le,
        |    CAST(sum(np) OVER (PARTITION BY prio) AS BIGINT) AS n_p
        |  FROM pv),
        |j AS (SELECT pc.prio, pc.np,
        |    (vc.cum_le - vc.nv) - (pc.cump_le - pc.np) AS b_lt,
        |    (vc.n_all - vc.cum_le) - (pc.n_p - pc.cump_le) AS b_gt,
        |    pc.n_p, vc.n_all
        |  FROM pc JOIN vc ON pc.v = vc.v),
        |g AS (SELECT prio, max(n_p) AS n_focus, max(n_all) AS n_all,
        |    sum(CAST(np AS HUGEINT) * CAST(b_lt AS HUGEINT)) AS gt_pairs,
        |    sum(CAST(np AS HUGEINT) * CAST(b_gt AS HUGEINT)) AS lt_pairs
        |  FROM j GROUP BY 1),
        |f AS (SELECT *, CASE WHEN n_all > n_focus THEN
        |    floor(CAST(gt_pairs - lt_pairs AS DOUBLE)
        |    / CAST(CAST(n_focus AS HUGEINT)
        |      * CAST(n_all - n_focus AS HUGEINT) AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 END AS delta6
        |  FROM g)
        |SELECT prio AS o_orderpriority, n_focus,
        |  CAST(n_all - n_focus AS BIGINT) AS n_rest,
        |  CAST(gt_pairs AS BIGINT) AS gt_pairs,
        |  CAST(lt_pairs AS BIGINT) AS lt_pairs,
        |  delta6 AS cliffs_delta,
        |  CASE WHEN delta6 IS NULL THEN NULL
        |    WHEN abs(delta6) < 0.147::DOUBLE THEN 'negligible'
        |    WHEN abs(delta6) < 0.33::DOUBLE THEN 'small'
        |    WHEN abs(delta6) < 0.474::DOUBLE THEN 'medium'
        |    ELSE 'large' END AS magnitude
        |FROM f ORDER BY o_orderpriority""".stripMargin,

    "q333_cronbach_alpha" ->
      """WITH ev AS (SELECT user_id, event_type FROM events),
        |grid AS (SELECT u.user_id, t.event_type
        |  FROM (SELECT DISTINCT user_id FROM ev) u
        |  CROSS JOIN (SELECT DISTINCT event_type FROM ev) t),
        |cnt AS (SELECT user_id, event_type,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |fl AS (SELECT g.user_id, g.event_type,
        |    coalesce(c.c, 0) AS c
        |  FROM grid g LEFT JOIN cnt c
        |    ON g.user_id = c.user_id AND g.event_type = c.event_type),
        |it AS (SELECT event_type, CAST(count(*) AS BIGINT) AS u,
        |    CAST(sum(c) AS BIGINT) AS sc,
        |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sc2
        |  FROM fl GROUP BY 1),
        |ia AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(max(u) AS BIGINT) AS n_users,
        |    sum(CAST(u AS HUGEINT) * sc2
        |      - CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT)) AS num_items
        |  FROM it),
        |us AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS s FROM fl
        |  GROUP BY 1),
        |ta AS (SELECT CAST(count(*) AS BIGINT) AS u2,
        |    CAST(sum(s) AS BIGINT) AS ss,
        |    sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS ss2
        |  FROM us),
        |tn AS (SELECT CAST(u2 AS HUGEINT) * ss2
        |    - CAST(ss AS HUGEINT) * CAST(ss AS HUGEINT) AS num_tot, u2
        |  FROM ta)
        |SELECT k AS n_items, n_users,
        |  floor(CAST(num_items AS DOUBLE) / CAST(CAST(u2 AS HUGEINT)
        |    * CAST(u2 AS HUGEINT) AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS sum_item_var,
        |  floor(CAST(num_tot AS DOUBLE) / CAST(CAST(u2 AS HUGEINT)
        |    * CAST(u2 AS HUGEINT) AS DOUBLE) * 1e6 + 0.5) / 1e6
        |    AS total_var,
        |  CASE WHEN num_tot > 0 AND k > 1 THEN
        |    floor(CAST(CAST(k AS HUGEINT) * (num_tot - num_items)
        |        AS DOUBLE)
        |      / CAST(CAST(k - 1 AS HUGEINT) * num_tot AS DOUBLE)
        |      * 1e6 + 0.5) / 1e6 END AS cronbach_alpha
        |FROM ia, tn""".stripMargin,

    "q339_cochrans_q" ->
      """WITH p AS (SELECT DISTINCT user_id, event_type FROM events
        |  WHERE CAST(ts AS DATE) = DATE '2024-01-05'),
        |r AS (SELECT coalesce(pr.rr, 0) AS rr
        |  FROM (SELECT DISTINCT user_id FROM events) au
        |  LEFT JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS rr
        |    FROM p GROUP BY 1) pr ON au.user_id = pr.user_id),
        |ra AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(rr) AS BIGINT) AS nn,
        |    sum(CAST(rr AS HUGEINT) * CAST(rr AS HUGEINT)) AS sr2
        |  FROM r),
        |cc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cj
        |  FROM p GROUP BY 1),
        |ca AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    sum(CAST(cj AS HUGEINT) * CAST(cj AS HUGEINT)) AS sc2
        |  FROM cc)
        |SELECT k AS n_treatments, n_users,
        |  CAST(k - 1 AS BIGINT) AS df,
        |  CASE WHEN CAST(k AS HUGEINT) * nn - sr2 > 0 THEN
        |    floor(CAST(CAST(k - 1 AS HUGEINT) * (CAST(k AS HUGEINT)
        |        * sc2 - CAST(nn AS HUGEINT) * nn) AS DOUBLE)
        |      / CAST(CAST(k AS HUGEINT) * nn - sr2 AS DOUBLE)
        |      * 1e6 + 0.5) / 1e6 END AS q_stat
        |FROM ca, ra""".stripMargin,

    "q340_mcnemar" ->
      """WITH g AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase'
        |      AND CAST(ts AS DATE) = DATE '2024-01-05' THEN 1
        |      ELSE 0 END) AS p1,
        |    max(CASE WHEN event_type = 'purchase'
        |      AND CAST(ts AS DATE) = DATE '2024-01-25' THEN 1
        |      ELSE 0 END) AS p2
        |  FROM events GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM g)
        |SELECT n_users, b AS n_lost, c AS n_gained,
        |  CASE WHEN b + c > 0 THEN floor(CAST((b - c) * (b - c)
        |    AS DOUBLE) / CAST(b + c AS DOUBLE) * 1e6 + 0.5) / 1e6 END
        |    AS chi2,
        |  CASE WHEN b + c > 0 THEN
        |    floor(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
        |      / CAST(b + c AS DOUBLE) * 1e6 + 0.5) / 1e6 END
        |    AS chi2_cc
        |FROM a""".stripMargin,

    "q341_jonckheere" ->
      """WITH o AS (SELECT o_orderpriority AS g, o_totalprice AS v
        |  FROM orders),
        |pv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS np FROM o
        |  GROUP BY 1, 2),
        |grid AS (SELECT gg.g, vv.v, coalesce(pv.np, 0) AS np
        |  FROM (SELECT DISTINCT v FROM pv) vv
        |  CROSS JOIN (SELECT DISTINCT g FROM pv) gg
        |  LEFT JOIN pv ON pv.g = gg.g AND pv.v = vv.v),
        |cg AS (SELECT g, v, np,
        |    CAST(sum(np) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
        |      AS cumle
        |  FROM grid),
        |jt AS (SELECT sum(CAST(b.np AS HUGEINT)
        |    * (2 * CAST(a.cumle - a.np AS HUGEINT) + a.np)) AS jt2
        |  FROM cg a JOIN cg b ON a.v = b.v AND a.g < b.g
        |  WHERE b.np > 0),
        |gs0 AS (SELECT g, CAST(count(*) AS BIGINT) AS ni FROM o
        |  GROUP BY 1),
        |gs AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(ni) AS BIGINT) AS nn,
        |    sum(CAST(ni AS HUGEINT) * ni) AS sn2,
        |    sum(CAST(ni AS HUGEINT) * (ni - 1)) AS sn11,
        |    sum(CAST(ni AS HUGEINT) * (ni - 1) * (2 * ni + 5))
        |      AS sn25,
        |    sum(CAST(ni AS HUGEINT) * (ni - 1) * (ni - 2)) AS sn12
        |  FROM gs0),
        |ts0 AS (SELECT v, CAST(count(*) AS BIGINT) AS tj FROM o
        |  GROUP BY 1),
        |tsx AS (SELECT sum(CAST(tj AS HUGEINT) * (tj - 1)) AS st11,
        |    sum(CAST(tj AS HUGEINT) * (tj - 1) * (2 * tj + 5))
        |      AS st25,
        |    sum(CAST(tj AS HUGEINT) * (tj - 1) * (tj - 2)) AS st12
        |  FROM ts0),
        |f AS (SELECT n_groups, nn, jt2,
        |    CAST(CAST(nn AS HUGEINT) * nn - sn2 AS DOUBLE)
        |      / 2.0::DOUBLE AS e2,
        |    CASE WHEN nn > 2 THEN
        |    CAST(CAST(nn AS HUGEINT) * (nn - 1) * (2 * nn + 5)
        |        - sn25 - st25 AS DOUBLE) / 72.0::DOUBLE
        |      + CAST(sn12 * st12 AS DOUBLE) / (36.0::DOUBLE
        |        * CAST(CAST(nn AS HUGEINT) * (nn - 1) * (nn - 2)
        |          AS DOUBLE))
        |      + CAST(sn11 * st11 AS DOUBLE) / (8.0::DOUBLE
        |        * CAST(CAST(nn AS HUGEINT) * (nn - 1) AS DOUBLE))
        |      END AS vvar
        |  FROM gs, tsx, jt)
        |SELECT n_groups, nn AS n_total, CAST(jt2 AS BIGINT) AS jt2,
        |  e2 AS e_jt2,
        |  CASE WHEN vvar > 0 THEN
        |    floor(sqrt(vvar) * 100.0::DOUBLE + 0.5) / 100.0::DOUBLE
        |  END AS sd_jt,
        |  CASE WHEN vvar > 0 THEN floor((CAST(jt2 AS DOUBLE) - e2)
        |    / (2.0::DOUBLE * sqrt(vvar)) * 1e6 + 0.5) / 1e6 END AS z
        |FROM f""".stripMargin,

    "q345_cuped" ->
      """WITH g AS (SELECT user_id,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS uu,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM g),
        |b AS (SELECT uu,
        |    CAST(uu AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |      AS cnum,
        |    CAST(uu AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |      AS dx,
        |    CAST(uu AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
        |      AS dy
        |  FROM a)
        |SELECT uu AS n_users,
        |  CASE WHEN dx > 0 THEN floor(CAST(cnum AS DOUBLE)
        |    / CAST(dx AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS theta,
        |  floor(CAST(dy AS DOUBLE)
        |    / (CAST(uu AS DOUBLE) * CAST(uu AS DOUBLE)) * 1e6 + 0.5)
        |    / 1e6 AS var_post,
        |  CASE WHEN dx > 0 AND dy > 0 THEN
        |    floor(CAST(cnum AS DOUBLE) * CAST(cnum AS DOUBLE)
        |      / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)) * 1e6 + 0.5)
        |    / 1e6 END AS rho2,
        |  CASE WHEN dx > 0 AND dy > 0 THEN
        |    floor(CAST(dy AS DOUBLE)
        |      / (CAST(uu AS DOUBLE) * CAST(uu AS DOUBLE))
        |      * (1.0::DOUBLE - CAST(cnum AS DOUBLE)
        |        * CAST(cnum AS DOUBLE) / (CAST(dx AS DOUBLE)
        |          * CAST(dy AS DOUBLE))) * 1e6 + 0.5) / 1e6 END
        |    AS var_adjusted
        |FROM b""".stripMargin,

    "q351_hill_tail" ->
      """WITH rk AS (SELECT o_totalprice AS x,
        |    CAST(row_number() OVER (ORDER BY o_totalprice DESC,
        |      o_orderkey) AS BIGINT) AS rn
        |  FROM orders),
        |top AS (SELECT x, rn,
        |    CAST(floor(ln(x) * 1e6 + 0.5) AS BIGINT) AS l6
        |  FROM rk WHERE rn <= 201),
        |ks AS (SELECT CAST(k AS BIGINT) AS k
        |  FROM (VALUES (50), (100), (200)) t(k)),
        |sl AS (SELECT ks.k, CAST(sum(top.l6) AS BIGINT) AS sl
        |  FROM ks JOIN top ON top.rn <= ks.k GROUP BY 1),
        |rf AS (SELECT ks.k, top.l6 AS l6ref, top.x AS x_ref
        |  FROM ks JOIN top ON top.rn = ks.k + 1),
        |f AS (SELECT sl.k, rf.x_ref,
        |    sl.sl - sl.k * rf.l6ref AS exc
        |  FROM sl JOIN rf ON sl.k = rf.k)
        |SELECT k, x_ref AS threshold_price,
        |  CASE WHEN exc > 0 THEN floor(CAST(exc AS DOUBLE)
        |    / (CAST(k AS DOUBLE) * 1e6) * 1e6 + 0.5) / 1e6 END
        |    AS gamma,
        |  CASE WHEN exc > 0 THEN floor((CAST(k AS DOUBLE) * 1e6)
        |    / CAST(exc AS DOUBLE) * 1e6 + 0.5) / 1e6 END
        |    AS hill_alpha
        |FROM f ORDER BY k""".stripMargin,

    "q355_abc_analysis" ->
      """WITH rev AS (SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT *,
        |    CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(rev) OVER () AS BIGINT) AS tot
        |  FROM rev),
        |cl AS (SELECT *,
        |    CASE WHEN CAST(cum AS HUGEINT) * 100 <= CAST(tot
        |        AS HUGEINT) * 80 THEN 'A'
        |      WHEN CAST(cum AS HUGEINT) * 100 <= CAST(tot
        |        AS HUGEINT) * 95 THEN 'B'
        |      ELSE 'C' END AS cls
        |  FROM c),
        |g AS (SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
        |    CAST(sum(rev) AS BIGINT) AS class_rev
        |  FROM cl GROUP BY 1),
        |t AS (SELECT *, CAST(sum(n_parts) OVER () AS BIGINT)
        |      AS all_parts,
        |    CAST(sum(class_rev) OVER () AS BIGINT) AS all_rev
        |  FROM g)
        |SELECT cls AS abc_class, n_parts,
        |  floor(CAST(n_parts AS DOUBLE) / CAST(all_parts AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS part_share,
        |  floor(CAST(class_rev AS DOUBLE) / CAST(all_rev AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS revenue_share
        |FROM t ORDER BY abc_class""".stripMargin,

    "q358_simpsons_check" ->
      """WITH li AS (SELECT l_returnflag AS g,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
        |    CAST(l_quantity AS BIGINT) AS y
        |  FROM lineitem),
        |pooled AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM li),
        |pl AS (SELECT CAST(n AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy AS num_all,
        |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |      AS den_all
        |  FROM pooled),
        |g0 AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM li GROUP BY 1),
        |gg AS (SELECT g, n,
        |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |      AS num,
        |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |      AS den
        |  FROM g0)
        |SELECT g AS l_returnflag, n AS n_rows,
        |  CASE WHEN den > 0 THEN floor(CAST(num AS DOUBLE)
        |    / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6 END
        |    AS slope_group,
        |  CASE WHEN den_all > 0 THEN floor(CAST(num_all AS DOUBLE)
        |    / CAST(den_all AS DOUBLE) * 1e6 + 0.5) / 1e6 END
        |    AS slope_pooled,
        |  (num > 0 AND num_all < 0) OR (num < 0 AND num_all > 0)
        |    AS sign_reversed
        |FROM gg, pl ORDER BY l_returnflag""".stripMargin,

    "q359_partial_corr" ->
      """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice) AS BIGINT) AS y,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS z
        |  FROM lineitem),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(z) AS BIGINT) AS sz,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(z AS HUGEINT) * z) AS szz,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * z) AS sxz,
        |    sum(CAST(y AS HUGEINT) * z) AS syz
        |  FROM li),
        |c AS (SELECT n,
        |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |      AS DOUBLE) AS cxy,
        |    CAST(CAST(n AS HUGEINT) * sxz - CAST(sx AS HUGEINT) * sz
        |      AS DOUBLE) AS cxz,
        |    CAST(CAST(n AS HUGEINT) * syz - CAST(sy AS HUGEINT) * sz
        |      AS DOUBLE) AS cyz,
        |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |      AS DOUBLE) AS vx,
        |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
        |      AS DOUBLE) AS vy,
        |    CAST(CAST(n AS HUGEINT) * szz - CAST(sz AS HUGEINT) * sz
        |      AS DOUBLE) AS vz
        |  FROM m),
        |r AS (SELECT n,
        |    CASE WHEN vx > 0 AND vy > 0 THEN cxy / sqrt(vx * vy) END
        |      AS rxy,
        |    CASE WHEN vx > 0 AND vz > 0 THEN cxz / sqrt(vx * vz) END
        |      AS rxz,
        |    CASE WHEN vy > 0 AND vz > 0 THEN cyz / sqrt(vy * vz) END
        |      AS ryz
        |  FROM c)
        |SELECT n AS n_rows,
        |  floor(rxy * 1e6 + 0.5) / 1e6 AS r_xy,
        |  floor(rxz * 1e6 + 0.5) / 1e6 AS r_xz,
        |  floor(ryz * 1e6 + 0.5) / 1e6 AS r_yz,
        |  CASE WHEN (1.0::DOUBLE - rxz * rxz) > 0
        |      AND (1.0::DOUBLE - ryz * ryz) > 0 THEN
        |    floor((rxy - rxz * ryz)
        |      / sqrt((1.0::DOUBLE - rxz * rxz)
        |        * (1.0::DOUBLE - ryz * ryz)) * 1e6 + 0.5) / 1e6 END
        |    AS partial_r_xy_given_z
        |FROM r""".stripMargin,

    "q360_price_dispersion" ->
      """WITH u AS (SELECT l_partkey,
        |    CAST(floor(l_extendedprice * 100 / l_quantity + 0.5)
        |      AS BIGINT) AS unit_cents
        |  FROM lineitem WHERE l_quantity > 0),
        |g AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(unit_cents) AS BIGINT) AS sp,
        |    sum(CAST(unit_cents AS HUGEINT) * unit_cents) AS sp2
        |  FROM u GROUP BY 1)
        |SELECT l_partkey, n AS n_lines,
        |  floor(CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE)
        |    * 100.0::DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_unit_price,
        |  floor(CAST(CAST(n AS HUGEINT) * sp2 - CAST(sp AS HUGEINT)
        |      * sp AS DOUBLE) / CAST(CAST(sp AS HUGEINT) * sp
        |      AS DOUBLE) * 1e6 + 0.5) / 1e6 AS cv2
        |FROM g WHERE n >= 5 AND sp > 0
        |ORDER BY cv2 DESC, l_partkey LIMIT 15""".stripMargin,

    "q364_pareto_knee" ->
      """WITH rev AS (SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT l_partkey, rev,
        |    CAST(row_number() OVER (ORDER BY rev DESC, l_partkey)
        |      AS BIGINT) AS rk,
        |    CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(rev) OVER () AS BIGINT) AS tot,
        |    CAST(count(*) OVER () AS BIGINT) AS np
        |  FROM rev),
        |g AS (SELECT *, CAST(cum AS HUGEINT) * np
        |    - CAST(rk AS HUGEINT) * tot AS gap
        |  FROM c),
        |r AS (SELECT *, row_number() OVER (ORDER BY gap DESC, rk)
        |      AS sel
        |  FROM g)
        |SELECT rk AS knee_rank, np AS n_parts,
        |  floor(CAST(rk AS DOUBLE) / CAST(np AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS knee_part_share,
        |  floor(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS knee_rev_share,
        |  floor(CAST(gap AS DOUBLE) / CAST(CAST(np AS HUGEINT) * tot
        |    AS DOUBLE) * 1e6 + 0.5) / 1e6 AS max_gap
        |FROM r WHERE sel = 1""".stripMargin,

    "q374_tail_dependence" ->
      """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |tx AS (SELECT x AS q_x, n FROM (SELECT x,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(count(*)) OVER (ORDER BY x) AS BIGINT) AS cum,
        |    CAST(sum(count(*)) OVER () AS BIGINT) AS n
        |  FROM li GROUP BY x)
        |  WHERE cum >= (19 * n + 19) // 20
        |    AND cum - cnt < (19 * n + 19) // 20),
        |ty AS (SELECT y AS q_y FROM (SELECT y,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(count(*)) OVER (ORDER BY y) AS BIGINT) AS cum,
        |    CAST(sum(count(*)) OVER () AS BIGINT) AS n
        |  FROM li GROUP BY y)
        |  WHERE cum >= (19 * n + 19) // 20
        |    AND cum - cnt < (19 * n + 19) // 20),
        |a AS (SELECT CAST(max(n) AS BIGINT) AS n_rows,
        |    CAST(max(q_x) AS BIGINT) AS q95_qty,
        |    CAST(max(q_y) AS BIGINT) AS q95_cents,
        |    CAST(sum(CASE WHEN x > q_x THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_x_exceed,
        |    CAST(sum(CASE WHEN y > q_y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_y_exceed,
        |    CAST(sum(CASE WHEN x > q_x AND y > q_y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_joint
        |  FROM li, tx, ty)
        |SELECT n_rows, q95_qty, q95_cents, n_x_exceed, n_y_exceed,
        |  n_joint,
        |  CASE WHEN n_x_exceed > 0 THEN floor(CAST(n_joint AS DOUBLE)
        |    / CAST(n_x_exceed AS DOUBLE) * 1e6 + 0.5) / 1e6 END
        |    AS lambda_upper
        |FROM a""".stripMargin,

    "q378_decision_stump" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc,
        |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS pos
        |  FROM orders),
        |bd AS (SELECT dec10, CAST(max(pc) AS BIGINT) AS thr FROM (
        |    SELECT pc, CAST(ntile(10) OVER (ORDER BY pc, o_orderkey)
        |      AS BIGINT) AS dec10 FROM o)
        |  WHERE dec10 <= 9 GROUP BY 1),
        |c AS (SELECT dec10, thr, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pc <= thr AND pos THEN 1 ELSE 0 END)
        |      AS BIGINT) AS pl,
        |    CAST(sum(CASE WHEN pc <= thr AND NOT pos THEN 1 ELSE 0
        |      END) AS BIGINT) AS nl,
        |    CAST(sum(CASE WHEN pc > thr AND pos THEN 1 ELSE 0 END)
        |      AS BIGINT) AS pr,
        |    CAST(sum(CASE WHEN pc > thr AND NOT pos THEN 1 ELSE 0
        |      END) AS BIGINT) AS nr
        |  FROM o, bd GROUP BY 1, 2),
        |g AS (SELECT *, CASE WHEN pl + nl > 0 AND pr + nr > 0 THEN
        |    (CAST(pl + nl AS DOUBLE)
        |      - (CAST(pl AS DOUBLE) * CAST(pl AS DOUBLE)
        |        + CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE))
        |        / CAST(pl + nl AS DOUBLE)
        |      + CAST(pr + nr AS DOUBLE)
        |      - (CAST(pr AS DOUBLE) * CAST(pr AS DOUBLE)
        |        + CAST(nr AS DOUBLE) * CAST(nr AS DOUBLE))
        |        / CAST(pr + nr AS DOUBLE))
        |      / CAST(n AS DOUBLE) END AS gini
        |  FROM c),
        |sg AS (SELECT *, floor(gini * 1e6 + 0.5) / 1e6 AS g6 FROM g),
        |r AS (SELECT *, row_number() OVER (ORDER BY g6 ASC NULLS LAST,
        |    thr, dec10) AS rk FROM sg)
        |SELECT dec10 AS decile,
        |  floor(CAST(thr AS DOUBLE) / 100.0::DOUBLE * 1e6 + 0.5) / 1e6
        |    AS threshold,
        |  CAST(pl + nl AS BIGINT) AS n_left, pl AS pos_left,
        |  pr AS pos_right, g6 AS weighted_gini,
        |  rk = 1 AS is_best_split
        |FROM r ORDER BY decile""".stripMargin,

    "q380_lorenz_curve" ->
      """WITH sp AS (SELECT c.c_custkey,
        |    CAST(coalesce(o.cents, 0) AS BIGINT) AS cents
        |  FROM customer c LEFT JOIN (SELECT o_custkey,
        |      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
        |        AS BIGINT)) AS BIGINT) AS cents
        |    FROM orders GROUP BY 1) o
        |  ON c.c_custkey = o.o_custkey),
        |dq AS (SELECT *, CAST(ntile(10) OVER (ORDER BY cents,
        |    c_custkey) AS BIGINT) AS dec10 FROM sp),
        |g AS (SELECT dec10, CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(cents) AS BIGINT) AS cs
        |  FROM dq GROUP BY 1),
        |c AS (SELECT *,
        |    CAST(sum(cs) OVER (ORDER BY dec10) AS BIGINT) AS cum,
        |    CAST(sum(cs) OVER () AS BIGINT) AS tot
        |  FROM g)
        |SELECT dec10 AS decile, n_customers,
        |  CASE WHEN tot > 0 THEN
        |    floor(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) * 1e6 + 0.5)
        |      / 1e6 END AS cum_revenue_share,
        |  CASE WHEN tot > 0 THEN
        |    floor(CAST(CAST(cum AS HUGEINT) * 10 - CAST(dec10
        |        AS HUGEINT) * tot AS DOUBLE)
        |      / CAST(CAST(tot AS HUGEINT) * 10 AS DOUBLE) * 1e6 + 0.5)
        |      / 1e6 END AS gap_to_equality
        |FROM c ORDER BY decile""".stripMargin,

    "q382_process_capability" ->
      """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x
        |  FROM lineitem),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    CAST(sum(CASE WHEN x < 1 OR x > 50 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_oos
        |  FROM li),
        |v AS (SELECT *, CAST(CAST(n AS HUGEINT) * sxx
        |    - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS vnum FROM a)
        |SELECT n AS n_rows,
        |  floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS mean_qty,
        |  CASE WHEN vnum > 0 THEN floor(49.0::DOUBLE
        |    * CAST(n AS DOUBLE) / (6.0::DOUBLE * sqrt(vnum))
        |    * 1e6 + 0.5) / 1e6 END AS cp,
        |  CASE WHEN vnum > 0 THEN floor(
        |    CAST(least(50 * n - sx, sx - n) AS DOUBLE)
        |    / (3.0::DOUBLE * sqrt(vnum)) * 1e6 + 0.5) / 1e6 END
        |    AS cpk,
        |  floor(CAST(n_oos AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS out_of_spec_share
        |FROM v""".stripMargin
  )
}
