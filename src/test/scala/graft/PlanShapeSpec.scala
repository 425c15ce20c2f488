package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards for the scale properties that correctness
  * checks can't see: no unbounded cartesian products anywhere in the
  * catalog, filters pushed into parquet scans, pre-aggregation kept
  * below outer joins, and broadcast (not shuffle) feeding the
  * similarity cross join. These are the plans we'd want at 1000
  * executors; pinning them keeps a refactor from silently regressing
  * into a shuffle-everything shape that still passes the oracle.
  */
class PlanShapeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no query plans a CartesianProduct") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name planned a cartesian:\n$p")
    }
  }

  test("q01 pushes its predicates into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
  }

  test("q21/q22 aggregate the fact side below the join") {
    for (q <- Seq("q21_join_left", "q22_join_right")) {
      val p = plan(q)
      val joinAt = p.linesIterator.indexWhere(_.contains("Join"))
      val aggBelow = p.linesIterator.zipWithIndex.exists {
        case (l, i) => i > joinAt && l.contains("HashAggregate")
      }
      assert(joinAt >= 0 && aggBelow,
        s"$q should pre-aggregate orders below the join:\n$p")
    }
  }

  test("q70 broadcasts the query vectors, never shuffles the corpus for them") {
    val p = plan("q70_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q74 as-of join is a single-shuffle union+window, not a range join") {
    val p = plan("q74_join_asof")
    assert(p.contains("Window"), p)
    val joinNode =
      "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
    assert(joinNode.findFirstIn(p).isEmpty,
      s"as-of should not plan a join (the dedup-side agg is fine):\n$p")
  }

  test("q69 dedup runs as WindowGroupLimit partial/final, one row per fp crosses") {
    val p = plan("q69_pipeline")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(p).isDefined,
      s"expected partial WindowGroupLimit below the dedup exchange:\n$p")
    assert("WindowGroupLimit.*Final".r.findFirstIn(p).isDefined, p)
    assert(p.contains("partial_count"), s"lang rollup lost map-side partials:\n$p")
  }

  test("q49 session windows pre-aggregate before the shuffle (MergingSessions)") {
    val p = plan("q49_session_window")
    assert(p.contains("MergingSessions"), s"expected MergingSessions plan:\n$p")
    assert(p.contains("partial_count"),
      s"session agg lost its partial (map-side) stage:\n$p")
  }

  test("q76b reduces the seed fan-out map-side and broadcasts seeds/probes") {
    val p = plan("q76b_ann_ivf_probe")
    assert(p.contains("partial_max_by"),
      s"cell assignment must partial-aggregate before the shuffle:\n$p")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("join-strategy hints steer the planner") {
    import org.apache.spark.sql.functions.broadcast
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, sf).select("c_custkey", "c_name")
    // broadcast() forces BHJ even where size stats would not.
    val bhj = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(bhj.contains("BroadcastHashJoin"), bhj)
    // merge hint forces a sort-merge join despite the broadcastable dim.
    val smj = o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(smj.contains("SortMergeJoin"), smj)
    // shuffle_hash avoids the sort entirely.
    val shj = o.hint("shuffle_hash").join(c, o("o_custkey") === c("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(shj.contains("ShuffledHashJoin"), shj)
  }

  test("q107/q108 broadcast growing tables by stats, never by hint") {
    // customer and supplier grow linearly with scale factor: a
    // hardcoded broadcast() on them is an executor OOM at 100 TB. The
    // composites may hint only fixed-cardinality dims (region ≤5,
    // nation ≤25 rows); for everything else the planner's size stats
    // must pick BroadcastHashJoin on their own at test scale — proving
    // the hint was redundant where it was safe and removable where it
    // was not.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for (q <- Seq("q107_shipping_priority", "q108_local_volume")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val hinted = df.queryExecution.analyzed.collect {
        case h: ResolvedHint => h.child.toString
      }
      for (sub <- hinted; t <- Seq("customer", "supplier", "orders", "lineitem"))
        assert(!sub.toLowerCase.contains(t),
          s"$q hints linearly-growing table $t:\n$sub")
      val p = df.queryExecution.executedPlan.toString
      assert(
        p.linesIterator.exists(l =>
          l.contains("BroadcastHashJoin") && l.contains("c_custkey")),
        s"$q: stats should pick an unhinted BHJ for customer at test scale:\n$p")
    }
  }

  test("q109 argmax is a struct-max aggregate with partials, not a window") {
    // the top-gram argmax must ride the same two-level hash aggregation
    // as the counts (map-side partial_max below the doc_id exchange) —
    // a window formulation would shuffle-and-sort every (doc, gram) row.
    val p = plan("q109_repetition")
    assert(!p.contains("Window"), s"q109 must not plan a window:\n$p")
    assert(p.contains("partial_max"),
      s"struct argmax lost its map-side partial:\n$p")
    assert(p.contains("partial_count"),
      s"gram counting lost its map-side partial:\n$p")
  }

  test("q110 top-k evaluates as WindowGroupLimit, df agg keeps partials") {
    // the rnk <= 3 filter must push into the window as a group limit
    // (bounded heap per partition), so only ~k rows per doc cross the
    // final sort rather than every (doc, term) pair.
    val p = plan("q110_tfidf_topk")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(p).isDefined,
      s"q110 should plan a partial WindowGroupLimit below the exchange:\n$p")
    assert(p.contains("partial_count"),
      s"tf/df aggregation lost map-side partials:\n$p")
  }

  test("q101 tokenizes the corpus exactly once (single scan, reused)") {
    // the three-level prefix sum reads the corpus through one
    // repartition-by-bucket exchange shared by every consumer; before
    // the round-9 rework each consumer's copy diverged (nullable
    // bucket keys → differing inferred filters; column pruning →
    // doc_id-free twin) and the corpus was normalized+tokenized THREE
    // times. See Curation.seqPack for the three conspiring details.
    val df = SparkEntry.queries("q101_seq_pack")(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(finalPlan).length == 1,
      s"q101 must scan the corpus exactly once:\n$finalPlan")
    assert(finalPlan.contains("ReusedExchange"),
      s"expected the bucket repartition exchange to be reused:\n$finalPlan")
  }

  test("q110 tokenize stage runs once, reused by the tf and df branches") {
    // tf feeds both the df aggregate and the join probe; the df count
    // references tf's count column (un-foldably) so ColumnPruning
    // can't plan a cheaper functions=[] twin of the (doc, term)
    // aggregate — both branches share one canonically identical
    // Exchange and AQE reuses its stage (see CorpusSignals.tfidfTopK).
    val df = SparkEntry.queries("q110_tfidf_topk")(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"),
      s"expected the (doc_id, term) exchange to be reused:\n$finalPlan")
    assert("Generate explode".r.findAllIn(finalPlan).length == 1,
      s"the tokenize→explode stage must execute exactly once:\n$finalPlan")
  }

  test("q63 never evaluates the simhash inside a filter") {
    // InferFiltersFromConstraints once pushed isnotnull(chunk_val) all
    // the way into the scan as isnotnull(graft_simhash(<full per-word
    // md5 pipeline>)) — the query's dominant cost evaluated once in
    // the filter and again in the projection, on both self-join sides.
    // The chain is now non-nullable by construction (coalesce'd text),
    // so the only filters left are cheap column null-checks.
    val p = plan("q63_dedup_simhash")
    val offending = p.linesIterator.filter(l =>
      l.contains("Filter") && l.contains("graft_simhash"))
    assert(offending.isEmpty,
      s"simhash evaluated inside a filter:\n${offending.mkString("\n")}\n$p")
  }

  test("q111 fingerprint stage runs once, reused across both consumers") {
    // the (h, doc_id) pre-aggregation makes the occurrence-count branch
    // and the join-probe branch share a canonically identical
    // Exchange(h, doc_id) subtree over the normalize→explode→md5
    // pipeline (the query's dominant cost), so AQE materializes that
    // stage once and the second consumer reads the same shuffle files —
    // persist/checkpoint semantics from a pure stateless DataFrame.
    // Needs the executed adaptive plan: reuse only appears at runtime.
    val df = SparkEntry.queries("q111_dup_substrings")(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"),
      s"expected the (h, doc_id) exchange to be reused:\n$finalPlan")
    assert("Generate explode".r.findAllIn(finalPlan).length == 1,
      s"the explode→md5 pipeline must execute exactly once:\n$finalPlan")
  }

  test("no query fuses a distinct aggregate with object-buffer aggregates") {
    // round-7 postmortem (q39, 37% of the whole bench): Spark's
    // distinct-aggregate rewrite keys the FIRST aggregation phase on
    // (group keys ++ distinct keys) — any TypedImperativeAggregate in
    // the same Aggregate then builds its heavy object buffer once per
    // DISTINCT-KEY group (~200k serialized HLL++/QuantileSummaries
    // buffers at sf0.1; a straight OOM at cluster scale). The fix is
    // always the same: split into two aggregations joined on the group
    // key. Sweep every registered query's analyzed plan for the shape
    // so the next occurrence fails at test time, not in the bench.
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, TypedImperativeAggregate}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val aggs = fn(spark, sf).queryExecution.analyzed.collect {
        case a: Aggregate => a
      }
      for (a <- aggs) {
        val exprs = a.aggregateExpressions.flatMap(_.collect {
          case ae: AggregateExpression => ae
        })
        val distinct = exprs.filter(_.isDistinct)
        // a lone DISTINCT TypedImperative (e.g. listagg(DISTINCT x)) is
        // fine: its partial phase is a pure dedup with no buffers, and
        // the buffer builds only in the final phase keyed on the group.
        // The pathology needs a NON-distinct object buffer riding the
        // same Aggregate — that one gets built per distinct-key group.
        val objectBuf = exprs.filter(ae => !ae.isDistinct &&
          ae.aggregateFunction.isInstanceOf[TypedImperativeAggregate[_]])
        assert(distinct.isEmpty || objectBuf.isEmpty,
          s"$name fuses distinct aggregate(s) ${distinct.map(_.sql)} with " +
            s"object-buffer aggregate(s) ${objectBuf.map(_.sql)} in one " +
            s"Aggregate — the distinct rewrite will build the object " +
            s"buffers per distinct-key group (q39 r7 pathology)")
      }
    }
  }

  test("q39 object-buffer aggregation stays keyed on l_returnflag alone") {
    // the physical twin of the sweep above: after optimization no
    // aggregate carrying TypedImperative buffers may group on anything
    // beyond the 3-value l_returnflag (the r7 defect grouped them on
    // (l_returnflag, l_partkey) — ~200k buffer groups).
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, TypedImperativeAggregate}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val plan = SparkEntry.queries("q39_approx_sketch")(spark, sf)
      .queryExecution.optimizedPlan
    val heavy = plan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.collect {
        case ae: AggregateExpression => ae
      }.exists(_.aggregateFunction.isInstanceOf[TypedImperativeAggregate[_]]))
        => a
    }
    assert(heavy.nonEmpty, s"q39 lost its sketch aggregation:\n$plan")
    for (a <- heavy)
      assert(a.groupingExpressions.size <= 1,
        s"q39 object-buffer aggregate keyed on ${a.groupingExpressions} — " +
          s"must group on l_returnflag only:\n$a")
  }

  test("q39 exact-distinct leg shuffles bucket bitmaps, not distinct pairs") {
    // round-9 shape: the exact leg is the two-level bitmap form — one
    // 4 KB fixed-width bitmap per (flag, 32768-key bucket) crosses the
    // exchange instead of every distinct (flag, partkey) pair (32768×
    // shuffle-row compression at 100 TB partkey cardinality). A revert
    // to count_distinct would reintroduce the distinct rewrite's
    // O(distinct-keys) shuffle rows.
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val qe = SparkEntry.queries("q39_approx_sketch")(spark, sf).queryExecution
    val aggExprs = qe.analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.flatMap(_.collect {
          case ae: AggregateExpression => ae
        })
    }.flatten
    assert(!aggExprs.exists(_.isDistinct),
      s"q39 regained a distinct aggregate: ${aggExprs.map(_.sql)}")
    val p = qe.executedPlan.toString
    assert(p.contains("bitmap_construct_agg"),
      s"q39 exact leg lost the bitmap form:\n$p")
  }

  test("q29b banded interval join plans as an equi join, not a nested loop") {
    // the whole point of banding: the ±60 s predicate must ride as a
    // residual on a hash/merge EQUI join over the bin key — a
    // BroadcastNestedLoopJoin here means the O(n²) shape came back.
    val p = plan("q29b_join_banded")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"banded join degraded to a nested loop:\n$p")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r.findFirstIn(p).isDefined,
      s"expected an equi join on the bin key:\n$p")
  }

  test("q114 z-order rewrite: one fact-side shuffle, bounds ride broadcast") {
    // the layout rewrite must cost exactly one pass over the fact
    // table plus one tiny bounds aggregate: the min/max frame joins
    // back as a broadcast 1-row build (never a shuffled join of the
    // fact side), and the only exchange that moves fact rows is the
    // single range partition on the interleaved z-value. A hash
    // exchange or a sort-merge join here means the rewrite started
    // shuffling the corpus twice — the shape that breaks at 100 TB.
    val p = graft.sources.IOQueries.zordered(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_returnflag"),
      "l_orderkey", "l_partkey", 8).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"bounds should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"bounds join must not shuffle the fact side:\n$p")
    val ranges = "Exchange rangepartitioning".r.findAllIn(p).length
    assert(ranges == 1, s"expected exactly one range exchange, found $ranges:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"no hash exchange should appear in a layout rewrite:\n$p")
  }

  test("q120 SCD2: one user_id exchange serves both windows and the agg") {
    // gaps-and-islands keys everything on user_id: the lag window, the
    // running-sum window, the (user_id, version) aggregate (subset
    // clustering), and the lead window must all reuse ONE hash
    // exchange; a second hash exchange means a per-version reshuffle
    // crept in — at 100 TB that doubles the dominant shuffle.
    val p = plan("q120_scd2")
    val hashes = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashes == 1,
      s"expected exactly one hash exchange, found $hashes:\n$p")
  }

  test("q122 incremental refresh scans state + delta slice, never history") {
    // the point of the MV: refresh cost is O(delta). The refresh plan
    // must read the persisted partials plus ONE orders scan whose
    // `>= cutoff` predicate is pushed into parquet; a LessThan scan in
    // the refresh plan means the history aggregation ran again.
    val p = plan("q122_incremental_mv")
    assert(p.contains("mv_state"), s"state partials not read:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"delta predicate must reach the orders scan:\n$p")
    assert(!p.contains("LessThan(o_orderdate"),
      s"refresh plan re-scanned closed history:\n$p")
  }

  test("q119 k-means output plan: assignment is per-row, one hash exchange") {
    // the broadcast-as-literal design means assignment adds NO join and
    // NO shuffle: the only hash exchange in the final plan is the
    // k-group aggregate (plus the contract orderBy's range exchange).
    // A second hash exchange or any join node means the per-row
    // centroid evaluation regressed to a fan-out join.
    val p = plan("q119_kmeans")
    val hashes = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashes == 1,
      s"expected exactly one hash exchange (k-group agg), found $hashes:\n$p")
    assert(!p.contains("Join"), s"assignment must not join:\n$p")
  }

  test("q125 point-in-time lookup compiles to windows, not a join") {
    // the as-of shape is the point: a BETWEEN-interval join would
    // nested-loop or fan out per interval; the union + running-last
    // form must plan ZERO join operators, and every hash exchange must
    // key on user_id (never on an interval or a constant).
    val p = plan("q125_pit_lookup")
    assert(!p.contains("Join"), s"PIT lookup planned a join:\n$p")
    val hashes = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    val allHashes = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(allHashes == hashes && hashes >= 1,
      s"every hash exchange must key on user_id ($hashes of $allHashes):\n$p")
  }

  test("q123 ANN probe prunes cell partitions with a static filter") {
    // the point of partitionBy(cell): the probe scan must carry the
    // probed-cell IN list as a PARTITION filter (directory pruning,
    // zero data bytes read from unprobed cells), and that list must
    // genuinely exclude cells — otherwise the "index" is a full scan
    // with extra steps.
    val p = plan("q123_ann_partitioned")
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(p)
    assert(pf.isDefined, s"no partition filters on the probe scan:\n$p")
    val inList = "IN \\(([^)]*)\\)".r.findFirstMatchIn(pf.get)
    assert(inList.isDefined, s"probed-cell IN list not pushed:\n${pf.get}")
    val probed = inList.get.group(1).split(",").length
    val dirs = new java.io.File(
      s"target/tmp/ann/${sf.replaceAll("[^A-Za-z0-9.]", "_")}/ivf_cells")
      .listFiles().count(_.getName.startsWith("cell="))
    assert(probed < dirs,
      s"probe touches all $dirs cells — nothing pruned ($probed probed)")
  }

  test("q58b parses each XML document exactly once (plus one xpath)") {
    // from_xml (XmlToStructs) is non-codegen, so Catalyst performs no
    // subexpression elimination on it: every textual occurrence in the
    // plan is a full per-row DOM parse. The query materializes the
    // struct once and getFields from it; CollapseProject must keep the
    // multiply-referenced alias un-inlined. Round-5 regression: 4
    // parses per row made this one query 28% of the whole bench.
    val p = SparkEntry.queries("q58b_xml")(spark, sf)
      .queryExecution.optimizedPlan.toString
    val parses = "from_xml".r.findAllIn(p).length
    assert(parses == 1, s"expected exactly one from_xml, found $parses:\n$p")
  }

  test("q216-q221 shingle/curation tier plans the pinned scan counts") {
    // the shingle pipeline (split → hash → sort per doc) is the
    // dominant CPU cost of this tier at corpus scale; re-planning it
    // per consumer is the q101/q110 failure mode. Pins: q216's single
    // posexplode feeds posting lists AND containment prefixes (2 scans
    // total — candidate generation + verify, whose two doc_id joins
    // share one exchange); q217's first-occurrence attribution is a
    // window, not a groupBy+join-back; q218 carries source through the
    // pipeline instead of joining back; q220/q221 are one corpus pass
    // + one hash window each.
    val expect = Seq(
      ("q216_containment", 2, true),
      ("q217_ngram_novelty", 1, false),
      ("q218_source_leakage", 1, false),
      ("q220_curation_funnel", 1, false),
      ("q221_effective_tokens", 1, false))
    for ((q, scans, wantReuse) <- expect) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("FileScan parquet".r.findAllIn(finalPlan).length == scans,
        s"$q must plan exactly $scans corpus scan(s):\n$finalPlan")
      if (wantReuse)
        assert(finalPlan.contains("ReusedExchange"),
          s"$q's verify joins should share one sh exchange:\n$finalPlan")
    }
  }

  test("q224-q232 stats/audit tier plans the pinned scan counts") {
    // each new statistics/audit query must be ONE corpus pass with
    // windows over the aggregated (bounded) frame — the q192/q195
    // principle; join-back/crossJoin(agg) formulations measured 2-3
    // scans before the q229/q231 rewrites. q228 is pinned at 2 by
    // design: the probe (eval-cohort) side and the train side are
    // structurally different subtrees, like q216.
    val expect = Seq(
      ("q224_ks_drift", 1), ("q225_psi_drift", 1),
      ("q226_kanon_audit", 1), ("q227_jaro_linkage", 1),
      ("q228_leak_spans", 2), ("q229_mix_plan", 1),
      ("q231_mannwhitney", 1), ("q232_kaplan_meier", 1),
      // q235/q238: the bounded broadcast frame (bucket distributions /
      // column totals) re-derives the corpus subtree feeding it — the
      // q228 two-subtree shape; a production pipeline persists the
      // shared aggregate. q236 (re-pinned round 14): the deduped-value
      // rank maps and the join-back probe all read a per-invocation
      // localCheckpoint of the customer⋈spend base — the two table
      // scans live inside the eager checkpoint.
      ("q233_temperature_mix", 1), ("q234_bpe_pairs", 1),
      ("q235_dsir_weights", 2), ("q236_spearman", 0),
      ("q237_cusum", 1), ("q238_cohens_kappa", 2),
      ("q239_logrank", 1),
      // q240's pairwise self-join rides ONE daily exchange (reused);
      // q241 is one flag pass to the 10-bin frame. q243 is 2 by
      // design: the broadcast centroid frame and the point side are
      // structurally different embedding subtrees (q228 shape).
      ("q240_theilsen", 1), ("q241_calibration", 1),
      ("q243_silhouette", 2), ("q244_fano", 1),
      ("q245_zipf_slope", 1),
      // q247: counters, N, and the top-20 probe all ride ONE reused
      // vocabulary exchange.
      ("q246_event_dedup", 1), ("q247_cms_heavy_hitters", 1),
      ("q248_ldiversity", 1),
      // q249: segment fan-out, first-occurrence window, and per-doc
      // re-group all ride ONE corpus scan; q250/q251 are pure
      // map-side passes (inference/entropy inside the row).
      ("q249_segment_dedup", 1), ("q250_quality_classifier", 1),
      ("q251_word_entropy", 1),
      // q252: the 32× Poisson fan-out, replica means, and base stats
      // ride ONE corpus scan; q253's chunk frame feeds both join
      // sides via ReusedExchange; q254 is one pass to the cell frame.
      ("q252_bootstrap_ci", 1), ("q253_cdc_chunks", 1),
      ("q254_dp_release", 1),
      // q255: train + score — the q197 statelessness trade; the
      // window-marginal rewrite measured 5 → 2 scans (join-back
      // marginals re-planned the bigram subtree per branch).
      // q256/q257: one pass to a bounded frame, everything else
      // rides windows/self-joins over it.
      ("q255_kn_bigram", 2), ("q256_acf", 1),
      ("q257_kfold_audit", 1),
      // q258: signature + exact-verify subtrees over the distinct
      // (type,user) frame — 2 by design (q235 shape), exchange
      // reused. q259 is a pure fan-out (zero data shuffles);
      // q260 rides the native Generate node into one doc re-group.
      ("q258_minhash_overlap", 2), ("q259_image_patches", 1),
      ("q260_shingle_gen", 1),
      // q261: sets + pairing all ride ONE (lang,source) window
      // exchange — never a join. q262: one pass to the cell frame;
      // marginals/N are window sums and re-groups OVER THE CELLS.
      // q263: fingerprint AND word-set ride one base frame through
      // the capped chunk self-join; the r14 occupancy cap's
      // rank-filtered window puts BOTH join sides on the same
      // (chunk_id, chunk_val) exchange, so ReusedExchange collapses
      // the self-join to ONE corpus scan (r13's count-derived stride
      // sample planned 3 — the gmod aggregate was a third scan).
      ("q261_rouge_pairs", 1), ("q262_mutual_info", 1),
      ("q263_simhash_eval", 1),
      // q264: codebook + point subtrees (q243's 2-scan shape).
      // q265/q266: marginals are keyed windows and 1-row broadcasts
      // over the ONE (w1,w2)/(source,term) exchange — ReuseExchange
      // unifies the totals twin with the main frame.
      ("q264_pq_codes", 2), ("q265_collocations", 1),
      ("q266_rbo_rankings", 1),
      // q267: hashed-once sequences pair on one lead() window, the DP
      // runs per pair row. q268: sketch + exact-verify twin (q258's
      // 2-subtree shape). q269: one pass to the vocab frame.
      ("q267_rouge_l", 1), ("q268_hll_registers", 2),
      ("q269_stem_audit", 1),
      // q270: vocab-build and probe branches carry different split
      // filters — 2 subtrees by design. q271 (re-pinned round 14):
      // signature and set sides both read a per-invocation
      // localCheckpoint of the exploded shingle-hash frame — the one
      // corpus scan lives in the eager checkpoint, the returned plan
      // reads the checkpointed RDD (r13 planned the shingle pipeline
      // once per join side = 2 scans).
      // q272: one pass to the (lang, bigram) frame.
      ("q270_oov_coverage", 2), ("q271_lsh_tuning", 0),
      ("q272_char_bigrams", 1),
      // q273: per-doc stats in-row before the one content-hash
      // exchange. q274: the 8-cell grid folds back map-side.
      // q275: seeds, assignment (2), queries ×2 (exact + probes), and
      // the exact-truth brute subtree each scan the embeddings table —
      // 6 scans, accepted: this is the run-once-on-a-sample
      // MEASUREMENT query (the INDEX path q76b/q123 stays 2).
      ("q273_dedup_impact", 1), ("q274_filter_yield", 1),
      ("q275_ann_recall", 6),
      // q276: blocked-candidate self-join sides + the verify-stage
      // shingle join — 3 scans (the q91 family shape); the persisted
      // pair frame keeps edges/wedges/closure from re-scanning.
      // q277: the per-(label, half) centroid subtree self-joined.
      // q278: one kernel pass.
      ("q276_transitivity", 3), ("q277_split_drift", 2),
      ("q278_simhash_bits", 1),
      // q279 (re-pinned round 14): train/held/membership subtrees all
      // read the per-invocation localCheckpoint of the (bkt, h)
      // shingle frame — the one corpus scan lives in the eager
      // checkpoint (r13 ran the shingle pipeline per subtree = 3).
      ("q279_bloom_fpr", 0),
      // q280: the driver-side iteration's collect() is a separate
      // job; the OUTPUT plan scans events once for the empirical
      // twin. q281: signature + exact-verify subtrees (q258 shape).
      ("q280_markov_stationary", 1), ("q281_minhash_k_curve", 2),
      // q282: one pass to the (type, day) cell frame, the 3× α
      // fan-out rides it. q283 (r14): midpoint ranks come from the
      // two DOMAIN-bounded (lang, value) marginal frames hash-joined
      // back — 3 tokenize scans (main + x/y marginals), the q255
      // statelessness trade; the r13 1-scan form ran the rank
      // windows per-lang over the per-DOC frame (corpus/|langs|
      // rows through one task per language).
      ("q282_dp_epsilon_curve", 1), ("q283_length_ttr_corr", 3),
      // q284: shingle first-occurrence + doc-checkpoint branches.
      ("q284_heaps_law", 2),
      // q285: the all-users leg + three type-pruned stage legs each
      // scan events (type pushed into the scan) — 4 by design.
      // q286: ONE pass; cohorts derive from a user window, never a
      // second scan.
      ("q285_funnel", 4), ("q286_cohort_retention", 1),
      // q287: ONE pass — the MG summaries partial-aggregate map-side,
      // only ≤k counters per (lang, task) cross the shuffle.
      ("q287_heavy_hitters", 1),
      // q288: the daily-frame self-join rides ONE scan — both pair
      // sides are the same (type, day) aggregate and ReuseExchange
      // dedupes the subtree. q289: orders + lineitem, one scan each,
      // PLUS the two 1-column min/max bound scans feeding the
      // month-start seed spine (round 12 — trivially column-pruned,
      // never a re-run of the join); the ± boundary fan-out is an
      // explode, never a union re-plan.
      // q290: q231's one-pass pooled-rank shape.
      ("q288_kendall_tau", 1), ("q289_order_concurrency", 4),
      ("q290_kruskal_wallis", 1),
      // q291: one tokenize pass; per-source totals ride a window on
      // the count frame and ReuseExchange collapses the pair
      // self-join (q288's shape). q292: one pass to the bounded
      // |types|×|dows| cell frame, all totals via windows over it.
      // q293: one pass — user-keyed lead() windows, map-side
      // combined trigram counts.
      ("q291_jsd_sources", 1), ("q292_cramers_v", 1),
      ("q293_event_trigrams", 1),
      // q294: one pass to the 11-level frame; j/k/i sides all ride
      // the same exchange (the i branch keeps cn in its grouping
      // keys so Catalyst can't prune the window and re-scan).
      // q295: one pass to the (type, day) frame.
      ("q294_isotonic_response", 1), ("q295_changepoint", 1),
      // q296: ONE corpus scan — the recursion runs over the nation
      // dimension (its per-level scans live inside the UnionLoop
      // node, which prints no FileScan; the visible scan is the
      // single customer join). q297: two column-pruned scans of
      // embeddings for the adjacent-id self-join (the sides read
      // different column sets, so the exchange can't be shared).
      ("q296_recursive_hierarchy", 1), ("q297_jl_distortion", 2),
      // q298: orders + lineitem once each; degrees ride windows over
      // the distinct edge frame, never a join-back. q299: one pass
      // to the daily frame, the 5-scale fan-out is an explode.
      ("q298_degree_assortativity", 2), ("q299_haar_anomaly", 1),
      // q300 (re-pinned round 14): the greedy k=3 rounds iterate over
      // a per-invocation localCheckpoint of the (doc_id, h) element
      // frame — the ONE corpus scan lives inside the eager checkpoint
      // at construction, so the returned plan reads the checkpointed
      // RDD and plans ZERO FileScans (r13's lazy form planned 5 full
      // shingle pipelines, one per greedy consumer).
      ("q300_greedy_coverage", 0),
      // q301: part + lineitem once each to the |brands|×4 cell
      // frame; pooling rides windows over it. q302/q303: one pass.
      ("q301_mantel_haenszel", 2), ("q302_capture_recapture", 1),
      ("q303_neyman_allocation", 1),
      // q304: one sequence pass (q293's shape). q305: orders +
      // customer once each; the decomposition rides windows.
      ("q304_entropy_rate", 1), ("q305_theil_decomposition", 2),
      // q306: one pass to the daily frame; R/S blocks and the
      // ln-ln OLS all ride windows on it. q307: lineitem + part
      // once each; the base month attaches as a brand-window max.
      ("q306_hurst_rs", 1), ("q307_price_index", 2),
      // q308: the within-basket self-join and the support side both
      // derive from one distinct (order, part) exchange
      // (ReuseExchange); the third scan is the broadcast n_orders
      // count. q309: one pass to the daily frame.
      ("q308_basket_rules", 3), ("q309_sprt_monitor", 1),
      // q310: two map-side passes — the (value, type) counts and the
      // broadcast type-set row (the collect_list-window draft was a
      // 371 s quadratic runaway). q311: one pass to the daily frame.
      ("q310_wasserstein", 2), ("q311_seasonal_decompose", 1))
    for ((q, scans) <- expect) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("FileScan parquet".r.findAllIn(finalPlan).length == scans,
        s"$q must plan exactly $scans corpus scan(s):\n$finalPlan")
    }
  }

  test("q92 profiles every column in ONE table pass") {
    // describe-style stats must not plan one scan per column: the whole
    // point of the stacked single-aggregation form is that a 100 TB
    // profile reads the table once.
    val p = plan("q92_describe")
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 1, s"q92 should scan lineitem exactly once:\n$p")
  }

  test("q129 postings are WindowGroupLimit-capped and the explode stage is reused") {
    // the cap is the scale property: a stopword's posting list must
    // never materialize — the partial group limit forwards ≤k rows per
    // term per map task. And the tokenize→explode→tf stage feeds both
    // the stats aggregate and the window; their shared (term, doc_id)
    // exchange must plan once (the q110/q111 ReuseExchange recipe), so
    // the corpus is scanned and tokenized exactly once.
    val p = plan("q129_inverted_index")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(p).isDefined,
      s"q129 should plan a partial WindowGroupLimit below the exchange:\n$p")
    val df = SparkEntry.queries("q129_inverted_index")(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"),
      s"expected the (term, doc_id) tf exchange to be reused:\n$finalPlan")
    assert("FileScan parquet".r.findAllIn(finalPlan).length == 1,
      s"q129 must tokenize the corpus exactly once:\n$finalPlan")
  }

  test("q130 salted join keys on (suppkey, salt)") {
    // the point of the salt: the join's equality keys must include the
    // salt column, so a hot suppkey spreads over R reducers instead of
    // hot-spotting one. (At test scale the 80-row replicated dim
    // broadcasts; the keys are what survive to a shuffle join at
    // 100 TB.)
    val p = plan("q130_salted_join")
    val joinLine = p.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(joinLine.contains("fsalt") && joinLine.contains("dsalt"),
      s"salt must be part of the join keys:\n$p")
  }

  test("q132/q136 percentile bounds broadcast back; no corpus re-shuffle") {
    // the two-pass winsorize/equi-depth shape: pass 1 aggregates
    // percentile maps (map-side partials — one value→count map per
    // task, merged once), pass 2 is a per-row clip/bucket against the
    // BROADCAST bounds. A sort-merge join or a hash exchange of the
    // raw rows toward the bounds frame would shuffle the corpus twice.
    for (q <- Seq("q132_winsorize", "q136_equidepth_hist")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange"), s"$q must broadcast bounds:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q re-shuffled the corpus against the bounds frame:\n$p")
    }
    // Round 14: neither query uses the Percentile aggregate any more —
    // its value→count map buffer holds a group's whole distinct-value
    // set in ONE task. Bounds now come from
    // DistributedRank.exactPercentiles (deduped value frame +
    // distributed cumulative counts, bit-identical interpolation —
    // helper doc), so the plans must be percentile-free.
    for (q <- Seq("q132_winsorize", "q136_equidepth_hist")) {
      assert(!plan(q).contains("percentile"),
        s"$q should derive bounds without the Percentile aggregate")
    }
  }

  test("q133 encode stage is per-row against a broadcast map; vocab is TakeOrdered") {
    // the vocab rides to every task as ONE broadcast map row, so
    // encoding adds no shuffle over the corpus: the only hash exchange
    // in the whole plan is the term-count aggregate inside the vocab
    // build, and the top-V cut is a TakeOrderedAndProject (bounded
    // heap), not a global sort.
    val p = plan("q133_vocab_encode")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q133 must cross-join the 1-row vocab map via broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-V vocab cut should be a bounded heap:\n$p")
    val hashes = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashes == 1,
      s"expected exactly one hash exchange (term counts), found $hashes:\n$p")
  }

  test("q135 sessionization rides ONE user_id hash exchange") {
    // lag window, running-sum window, and the (user, session)
    // aggregate all key on user_id — subset clustering must reuse one
    // exchange (the q120 shape); a second hash exchange means a
    // per-session reshuffle crept in.
    val p = plan("q135_sessionize")
    val hashes = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashes == 1,
      s"expected exactly one hash exchange, found $hashes:\n$p")
  }

  test("q158 PPJoin: no shingle recompute leaks into a pre-join filter") {
    // the self-join formulation made Catalyst push an inferred
    // isnotnull(sz) below the Generate, re-inlining the whole shingle
    // pipeline into a Filter that re-evaluates split() PER ARRAY
    // ELEMENT (element_at(split(...), i) inside the shingle lambda) —
    // 23 s at sf0.1 for millisecond work. The cheap one-split length
    // filter (size(split(..)) >= 3) is fine; the per-element signature
    // in any Filter means the pathological pushdown came back.
    for (q <- Seq("q158_ppjoin", "q181_delta_dedup")) {
      val p = plan(q)
      val badFilter = p.linesIterator.exists(l =>
        l.contains("Filter") && l.contains("element_at(split("))
      assert(!badFilter,
        s"$q: a Filter re-inlines the shingle pipeline (per-element split):\n$p")
    }
    assert(!plan("q158_ppjoin").contains("SortMergeJoin"),
      "candidate generation should group, not sort-merge self-join")
  }

  test("q163 returns report bounds the top-20 with a heap, not a global sort") {
    val p = plan("q163_returns_report")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject for ORDER BY + LIMIT 20:\n$p")
  }

  test("q165 pushes each disjunct's implicates into BOTH parquet scans") {
    val p = plan("q165_disjunct_revenue")
    // lineitem side: quantity ranges survive inside an Or pushed filter;
    // part side: brand/size conjuncts likewise.
    assert("PushedFilters: \\[[^\\]]*Or\\(".r.findAllIn(p).length >= 2,
      s"expected OR-composed pushed filters on both scans:\n$p")
  }

  test("q161 attribution rides ONE user_id hash exchange") {
    val p = plan("q161_attribution")
    val hashes = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashes == 1,
      s"expected exactly one hash exchange, found $hashes:\n$p")
  }

  test("q183 plans the EXISTS as a semi join, never inner+distinct") {
    val p = plan("q183_order_priority")
    assert(p.contains("LeftSemi"),
      s"expected a LeftSemi join for the EXISTS:\n$p")
  }

  test("q193 aggregates order quantities below the joins, top-100 by heap") {
    val p = plan("q193_big_orders")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject for ORDER BY + LIMIT 100:\n$p")
    val joinAt = p.linesIterator.indexWhere(_.contains("Join"))
    val aggBelow = p.linesIterator.zipWithIndex.exists {
      case (l, i) => i > joinAt && l.contains("HashAggregate")
    }
    assert(joinAt >= 0 && aggBelow,
      s"the HAVING aggregate must run below the dimension joins:\n$p")
  }

  test("TPC-H tier evaluates each shared corpus stage exactly once") {
    // q182/q190: group-then-join-back twins stay canonically identical
    // (explicit isNotNull on the grouping key where a consumer-side
    // join would otherwise infer it one-sidedly) so AQE reuses the
    // shuffle stage; q192/q195: the correlated subquery compiles to a
    // window over one exchange. Either way lineitem is scanned ONCE —
    // the property that halves the corpus cost at 100 TB.
    for (q <- Seq("q182_min_cost_supplier", "q190_top_supplier",
        "q192_small_qty_revenue", "q195_waiting_suppliers")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val liScans = "FileScan parquet \\[l_".r.findAllIn(finalPlan).length
      assert(liScans == 1,
        s"$q must scan lineitem exactly once, found $liScans:\n$finalPlan")
    }
  }

  test("q197 LM trains in one pass and scores in one pass") {
    // TRAIN: one corpus scan into the term-keyed tf exchange, which
    // the vocab TakeOrdered and the (N, V) scalar both reuse; SCORE:
    // one corpus scan against the broadcast cost map. Exactly two
    // scans total — the statelessness floor for train+apply in one
    // pure DataFrame (the q111 trade).
    val df = SparkEntry.queries("q197_lm_perplexity")(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(finalPlan).length
    assert(scans == 2,
      s"q197 must scan the corpus exactly twice (train + score), found $scans:\n$finalPlan")
    assert(finalPlan.contains("ReusedExchange"),
      s"expected the term-keyed tf exchange to be reused:\n$finalPlan")
  }

  test("scalar-heavy projections stay inside whole-stage codegen") {
    import org.apache.spark.sql.execution.debug._
    for (q <- Seq("q50_math", "q51_trig", "q57_conditional", "q59_bitwise")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val physical = df.queryExecution.executedPlan
      physical.execute().count() // finalize THIS plan's AQE stages
      val cg = codegenString(physical)
      assert(!cg.startsWith("Found 0 WholeStageCodegen"),
        s"$q fell out of whole-stage codegen:\n${cg.take(400)}")
    }
  }

  test("global (empty-partitionSpec) windows appear only over bounded frames") {
    // A window with no partition spec funnels its whole input through
    // ONE task — the q159 rule. That is fine over a frame whose size
    // is bounded regardless of corpus scale (a 10-row decile readout,
    // a ≤|shuffle-partitions| DistributedRank bucket frame, a
    // calendar/value/vocab dimension) and a scale-killer over an
    // entity-scale frame (docs/orders/customers/parts) — round 13
    // shipped seven of the latter (q284/q344/q355/q363/q364/q378/
    // q380, all rewritten onto DistributedRank in round 14). This
    // sweep pins, per query, how many global logical Window nodes the
    // optimized plan contains; every entry below was individually
    // adjudicated as bounded-frame. A new global window anywhere in
    // the catalog — or one more in a pinned query — fails here and
    // must be justified (bounded input) before being added.
    //
    // Bounded-frame classes behind the pins:
    //  - DistributedRank bucket-offset frames (≤ one row per shuffle
    //    partition): q101 (its own 3-level form), and the r14
    //    rewrites q284/q344/q355/q363/q364/q378/q380 (plus their
    //    ≤10-row decile/class readout windows);
    //  - rank-filtered top-k that WindowGroupLimit bounds map-side:
    //    q89/q308/q319/q351/q352;
    //  - dimension-bounded frames (calendar days, distinct bounded
    //    values, vocab/bucket/cell grids, survival time steps):
    //    everything else, per the r13 plan audit.
    val allowed = Map(
      "q101_seq_pack" -> 1, "q133_vocab_encode" -> 1,
      "q141_rrf_fusion" -> 2, "q157_chi_square" -> 1,
      "q167_rolling_corr" -> 4, "q171_churn_hazard" -> 1,
      "q201_pct_of_parent" -> 1, "q226_kanon_audit" -> 1,
      "q229_mix_plan" -> 1, "q231_mannwhitney" -> 2,
      "q232_kaplan_meier" -> 2, "q233_temperature_mix" -> 2,
      "q235_dsir_weights" -> 1, "q239_logrank" -> 2,
      "q241_calibration" -> 2, "q245_zipf_slope" -> 1,
      "q248_ldiversity" -> 1, "q257_kfold_audit" -> 1,
      "q262_mutual_info" -> 3, "q280_markov_stationary" -> 1,
      "q284_heaps_law" -> 6, "q289_order_concurrency" -> 1,
      "q290_kruskal_wallis" -> 3, "q292_cramers_v" -> 2,
      "q293_event_trigrams" -> 1, "q294_isotonic_response" -> 3,
      "q300_greedy_coverage" -> 1, "q301_mantel_haenszel" -> 1,
      "q303_neyman_allocation" -> 1, "q305_theil_decomposition" -> 2,
      "q308_basket_rules" -> 1, "q309_sprt_monitor" -> 1,
      "q313_nelson_aalen" -> 2, "q319_gumbel_topk" -> 1,
      "q320_burrows_delta" -> 2, "q325_word_burstiness" -> 1,
      "q326_kendall_w" -> 2, "q329_keyness_fdr" -> 3,
      "q331_cliffs_delta" -> 2, "q335_t_closeness" -> 3,
      "q344_quantile_norm" -> 2, "q349_cumulative_gains" -> 3,
      "q350_modularity" -> 1, "q351_hill_tail" -> 2,
      "q352_topk_churn" -> 2, "q355_abc_analysis" -> 3,
      "q363_novelty_curve" -> 2, "q364_pareto_knee" -> 4,
      "q369_max_drawdown" -> 2, "q370_var_cvar" -> 3,
      "q374_tail_dependence" -> 4, "q378_decision_stump" -> 3,
      "q380_lorenz_curve" -> 4, "q381_rmst" -> 2,
      "q89_take_indices" -> 1)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val globals = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }.length
      assert(globals == allowed.getOrElse(name, 0),
        s"$name plans $globals global window(s), pinned " +
          s"${allowed.getOrElse(name, 0)} — a new empty-partitionSpec " +
          "window must be adjudicated bounded-frame before whitelisting")
    }
  }
}
