package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over relational data (beyond the reference, which has
  * no graph surface; companion to the q91 connected-components closure in
  * [[graft.ops.Dedup]]). The pattern: a corpus-sized relational pipeline
  * DERIVES the graph (edge aggregation — the only 100 TB-scale stage),
  * then the iterative numeric phase runs on the aggregated edge list,
  * which is |nodes|²-bounded and orders of magnitude smaller. This is how
  * production graph pipelines on Spark actually run PageRank-class
  * algorithms: aggregate first, iterate on the summary.
  */
object Graph extends QueryModule {

  /** Damping 0.85, 10 fixed iterations. */
  private val Iters = 10

  /** Undirected non-self pair counts from the shared
    * [[graft.Tables.nationEdges]] frame (VERDICT r12 #3: one corpus
    * derivation for the whole tier): summing the two directed cells of
    * an unordered pair equals counting its undirected rows directly, so
    * this is exactly the `least/greatest → count` frame the q166 family
    * derived from the corpus before round 13 — now a dimension-frame
    * fold over the persisted edge list.
    */
  private def undirectedPairs(s: SparkSession, d: String): DataFrame =
    Tables.nationEdges(s, d).filter(col("src") =!= col("dst"))
      .groupBy(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .agg(sum(col("cnt")).as("cnt"))

  /** The q166 family's data-driven edge threshold: keep unordered pairs
    * whose total trade count clears the graph's own 75th percentile
    * (the raw graph is near-complete, and a fixed constant would stop
    * discriminating as sf grows). Returns the thresholded (u, v) edge
    * list — ≤|nations|² rows at any corpus size.
    */
  private def thresholdedUndirected(s: SparkSession, d: String): DataFrame = {
    val pairs = undirectedPairs(s, d)
    val bound = pairs.agg(
      round(percentile(col("cnt"), lit(0.75)), 6).as("thr"))
    pairs.crossJoin(broadcast(bound))
      .filter(col("cnt") >= col("thr"))
      .select(col("u"), col("v"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PageRank over the nation-level trade graph: an edge src→dst for
    // every lineitem whose ordering customer sits in nation src and
    // supplying supplier in nation dst, weight = lineitem count
    // normalized per source. Scale shape: the three corpus joins key on
    // orderkey/custkey/suppkey (the 100 TB stage) and collapse to a
    // ≤|nations|² edge list; the 10 rank iterations are 25-row frames —
    // every edges-subtree reuse hits AQE's ReuseExchange, and no
    // iteration touches the corpus again. Dangling-node mass is dropped
    // (the standard simplification), identically in the oracle.
    // Cross-engine determinism: the per-iteration aggregate
    // sum(rank·w) is rounded to 10 decimals on BOTH engines before the
    // damping arithmetic (the sum is the only order-sensitive term; ÷,
    // ×, + on the rounded value are IEEE-exact), so ranks stay
    // bit-identical through all 10 iterations.
    "q154_pagerank" -> ((s, d) => {
      val e0 = Tables.nationEdges(s, d)
      val outdeg = e0.groupBy(col("src")).agg(sum(col("cnt")).as("outw"))
      val edges = e0.join(outdeg, "src")
        .select(col("src"), col("dst"),
          (col("cnt").cast("double") / col("outw").cast("double")).as("w"))
      val nations = Tables.nation(s, d).select(col("n_nationkey").as("node"))
      val nn = nations.agg(count(lit(1)).as("n_nodes"))
      val init = nations.crossJoin(broadcast(nn))
        .select(col("node"),
          (lit(1.0) / col("n_nodes").cast("double")).as("rank"))
      // The edge list is ≤|nations|² ≤ 625 rows — collect it once and
      // run the 10 damped iterations driver-side (the q119_kmeans
      // centroid pattern). A foldLeft over DataFrames builds a 10-deep
      // uncached plan that re-analyzes the edges subtree every round;
      // at any corpus size the heavy stage is the edge aggregation
      // above, and the iteration itself is nation-count-sized.
      val edgeRows = edges.collect().map(r =>
        (r.getAs[Number]("src").intValue, r.getAs[Number]("dst").intValue,
          r.getAs[Double]("w"))).sortBy(e => (e._1, e._2))
      val nodeIds = nations.collect()
        .map(_.getAs[Number]("node").intValue).sorted
      val n = nodeIds.length
      // identical snap to the SQL oracle's round(acc, 10): Spark's Round
      // on DoubleType goes through BigDecimal(d) (= valueOf semantics)
      // with HALF_UP, so mirror that exactly.
      def snap10(x: Double): Double =
        BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
      var rank = nodeIds.map(_ -> 1.0 / n).toMap
      for (_ <- 1 to Iters) {
        val acc = scala.collection.mutable.Map.empty[Int, Double]
          .withDefaultValue(0.0)
        for ((src, dst, w) <- edgeRows)
          acc(dst) += rank.getOrElse(src, 0.0) * w
        rank = nodeIds.map(nid =>
          nid -> (0.15 / n + 0.85 * snap10(acc(nid)))).toMap
      }
      import s.implicits._
      nodeIds.toSeq.map(nid => (nid, rank(nid))).toDF("node", "rank")
        .orderBy(col("node"))
    }),

    // Stationary distribution of the event-type Markov chain (q147's
    // transition matrix taken to its fixed point — "where do user
    // journeys SPEND their time", the summary a funnel/session model
    // calibrates against): 12 power iterations on the ≤|types|²
    // transition matrix, collected and iterated DRIVER-SIDE (the
    // q154/q119 pattern — the corpus stage is the one lead() window +
    // transition aggregation; the iteration object is types²-sized at
    // any corpus size). Cross-engine exactness without float order:
    // mass lives in exact MICRO-LONGS and each step is
    // p'(j) = Σ_i (p_i·c_ij) DIV r_i — per-term integer truncation,
    // order-free long sums (the oracle unrolls the same 12 steps as
    // chained CTEs). Output self-checks against the chain's empirical
    // step distribution.
    "q280_markov_stationary" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val rows = trans.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2)))
      val types = rows.flatMap(t => Seq(t._1, t._2)).distinct.sorted
      val idx = types.zipWithIndex.toMap
      val k = types.length
      val c = Array.ofDim[Long](k, k)
      rows.foreach { case (f, t, n) => c(idx(f))(idx(t)) = n }
      val rs = c.map(_.sum)
      var p = Array.fill(k)(1000000L / k)
      for (_ <- 1 to 12) {
        val nx = Array.fill(k)(0L)
        for (i <- 0 until k if rs(i) > 0; j <- 0 until k)
          nx(j) += p(i) * c(i)(j) / rs(i)
        p = nx
      }
      import s.implicits._
      val stat = types.zip(p).toSeq.toDF("event_type", "pm_micro")
      val emp = trans.groupBy(col("to_type").as("event_type"))
        .agg(sum(col("n")).as("n_steps"))
      stat.join(emp, Seq("event_type"))
        .withColumn("pm_tot", sum(col("pm_micro"))
          .over(Window.partitionBy()))
        .withColumn("n_all", sum(col("n_steps"))
          .over(Window.partitionBy()))
        .select(col("event_type"), col("pm_micro"),
          (col("pm_micro").cast("double") / col("pm_tot").cast("double"))
            .as("stationary_share"),
          (col("n_steps").cast("double") / col("n_all").cast("double"))
            .as("empirical_share"))
        .withColumn("abs_gap",
          abs(col("stationary_share") - col("empirical_share")))
        .orderBy(col("event_type"))
    }),

    // Triangle count + local clustering coefficient over the same
    // nation trade graph, undirected: edge {u,v} iff the pair's total
    // trade count clears the corpus's own 75th percentile (a
    // data-driven threshold — the raw graph is near-complete, and a
    // fixed constant would stop discriminating as sf grows). Scale
    // shape mirrors q154: the corpus joins collapse to the ≤|nations|²
    // pair-count frame ONCE; the triangle enumeration (ordered 2-path
    // join a<b<c closed by the {a,c} edge — each triangle counted
    // exactly once) runs on the bounded edge list, never the corpus.
    // Clustering = 2T/(deg·(deg−1)) from exact longs — one
    // correctly-rounded division, no rounding anywhere.
    "q166_triangles" -> ((s, d) => {
      val e = thresholdedUndirected(s, d)
      val tri = e.as("ab").join(e.as("bc"), col("ab.v") === col("bc.u"))
        .join(e.as("ac"),
          col("ac.u") === col("ab.u") && col("ac.v") === col("bc.v"))
        .select(col("ab.u").as("a"), col("ab.v").as("b"),
          col("bc.v").as("c"))
      val triPerNode = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
      val deg = e.select(col("u").as("node"))
        .union(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      Tables.nation(s, d).select(col("n_nationkey").as("node"))
        .join(deg, Seq("node"), "left")
        .join(triPerNode, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("degree"), lit(0L)).as("degree"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
          when(coalesce(col("degree"), lit(0L)) >= 2,
            (coalesce(col("n_triangles"), lit(0L)) * 2).cast("double") /
              (col("degree") * (col("degree") - 1)).cast("double"))
            .otherwise(lit(0.0)).as("clustering"))
        .orderBy(col("node"))
    }),

    // Adamic-Adar link prediction over the q166 thresholded trade
    // graph: for node pairs NOT currently connected, AA(a,b) =
    // Σ_{z ∈ Γ(a)∩Γ(b)} 1/ln(deg z) — rare shared neighbors count
    // more. Same aggregate-first shape (corpus → bounded edge list
    // once); common neighbors come from one 2-path self-join on the
    // symmetrized edges, existing edges drop via a left-anti join.
    // Determinism: ln(deg) snaps via the q110 recipe, each 1/ln term
    // snaps to exact 1e-9-unit LONGS (the q169 recipe — a double sum
    // over common neighbors would be order-sensitive), the final
    // score is one exact-long division. deg-1 neighbors are excluded
    // (ln 1 = 0 — the standard AA domain restriction).
    "q175_link_prediction" -> ((s, d) => {
      val e = thresholdedUndirected(s, d)
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val deg = sym.groupBy(col("u").as("node"))
        .agg(count(lit(1)).as("deg"))
      val common = sym.as("az").join(sym.as("bz"),
          col("az.v") === col("bz.v") && col("az.u") < col("bz.u"))
        .select(col("az.u").as("a"), col("bz.u").as("b"),
          col("az.v").as("z"))
      val ln6 = floor(log(col("deg").cast("double")) * 1e6 + 0.5) / 1e6
      val unit = floor(lit(1e9) / col("ln6") + 0.5).cast("long")
      val scoredPairs = common
        .join(deg.select(col("node").as("z"), col("deg")), "z")
        .filter(col("deg") >= 2)
        .withColumn("ln6", ln6)
        .withColumn("t", unit)
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n_common"), sum(col("t")).as("aa_u"))
      scoredPairs.join(e,
          col("a") === col("u") && col("b") === col("v"), "left_anti")
        .select(col("a"), col("b"), col("n_common"),
          (col("aa_u").cast("double") / 1e9).as("aa_score"))
        .orderBy(col("a"), col("b"))
    }),

    // Degree assortativity of the customer⇄supplier trade graph —
    // "do high-degree customers trade with high-degree suppliers?"
    // (disassortative r < 0 = hub-and-spoke; the mixing number that
    // complements q166 triangles / q276 transitivity / q175 link
    // prediction as a global graph-health readout). r is the Pearson
    // correlation of endpoint degrees over EDGES: every moment
    // (Σdu, Σdu², Σdv, Σdv², Σdu·dv) accumulates in DECIMAL(38,0)
    // from exact long degrees (E·Σdudv ≤ E²·d² stays inside 38 digits
    // to E~10¹²), and r is one fixed-parenthesization double
    // expression of exact operands, 6-snapped. Scale shape: ONE
    // orders⋈lineitem pass aggregates to the distinct edge list;
    // both endpoint degrees ride count-windows over the SAME edge
    // frame (u- then v-partitioned — two bounded shuffles of edge
    // rows, no join-back, no second corpus scan); the final moment
    // aggregate is map-side combined.
    "q298_degree_assortativity" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("u"), col("l_suppkey").as("v"))
        .distinct()
        .withColumn("du", count(lit(1)).over(Window.partitionBy(col("u"))))
        .withColumn("dv", count(lit(1)).over(Window.partitionBy(col("v"))))
      val m = edges.agg(count(lit(1)).as("e"),
        sum(dec(col("du"))).as("su"), sum(dec(col("dv"))).as("sv"),
        sum(dec(col("du")) * dec(col("du"))).as("suu"),
        sum(dec(col("dv")) * dec(col("dv"))).as("svv"),
        sum(dec(col("du")) * dec(col("dv"))).as("suv"))
      m.select(col("e").as("n_edges"),
          snap6(col("su").cast("double") / col("e").cast("double"))
            .as("mean_cust_degree"),
          snap6(col("sv").cast("double") / col("e").cast("double"))
            .as("mean_supp_degree"),
          // zero degree variance on either side (one hub, one edge)
          // leaves r undefined → NULL, never an ANSI ÷0
          when(dec(col("e")) * col("suu") - col("su") * col("su") > 0 &&
              dec(col("e")) * col("svv") - col("sv") * col("sv") > 0,
            snap6((dec(col("e")) * col("suv") - col("su") * col("sv"))
              .cast("double")
              / (sqrt((dec(col("e")) * col("suu") - col("su") * col("su"))
                  .cast("double"))
                * sqrt((dec(col("e")) * col("svv") - col("sv") * col("sv"))
                  .cast("double"))))).as("assortativity"))
    }),

    // Rich-club coefficient sweep over the q166 thresholded nation-
    // trade graph — "do the HUBS trade with each other?" φ(k) =
    // 2·E_{>k}/(N_{>k}(N_{>k}−1)) over nodes of degree > k for a
    // fixed k ladder, the hub-interconnection readout q298's global
    // assortativity compresses into one number (a graph can be
    // disassortative overall yet still have a dense hub core —
    // Colizza et al. 2006; the randomized-rewiring normalization is
    // out of scope and noted as such). All counts exact integers on
    // the bounded nation graph; one double division per k, N < 2
    // rungs NULL identically. Scale shape: the corpus collapses to
    // the bounded edge list once (the q166 aggregate-first shape);
    // the sweep is |ladder| scans of that dimension frame.
    "q342_rich_club" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      val e = thresholdedUndirected(s, d)
      val deg = e.select(col("u").as("node"))
        .union(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      val ks = Tables.nation(s, d).sparkSession
        .range(0, 6).select((col("id") * 2).as("k"))
      val rich = ks.crossJoin(broadcast(deg))
        .filter(col("degree") > col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_rich"))
      val eRich = ks.crossJoin(broadcast(
          e.join(deg.withColumnRenamed("node", "u")
              .withColumnRenamed("degree", "du"), Seq("u"))
            .join(deg.withColumnRenamed("node", "v")
              .withColumnRenamed("degree", "dv"), Seq("v"))))
        .filter(col("du") > col("k") && col("dv") > col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("e_rich"))
      ks.join(rich, Seq("k"), "left")
        .join(eRich, Seq("k"), "left")
        .select(col("k"),
          coalesce(col("n_rich"), lit(0L)).as("n_rich"),
          coalesce(col("e_rich"), lit(0L)).as("e_rich"),
          when(coalesce(col("n_rich"), lit(0L)) >= 2,
            snap6((coalesce(col("e_rich"), lit(0L)) * 2L).cast("double")
              / (col("n_rich") * (col("n_rich") - 1L)).cast("double")))
            .as("phi"))
        .orderBy(col("k"))
    }),

    // Newman modularity of the REGION partition over the q166
    // thresholded nation-trade graph — "do regions form trade
    // communities?" Q = Σ_c [E_c/M − (K_c/2M)²], the partition-
    // quality score that completes the graph-eval family (q166
    // clustering is per-node, q298 assortativity is degree-level,
    // q342 rich-club is hub-level — modularity grades a GIVEN
    // community assignment). Every per-community term shares the
    // denominator 4M², so term_c = (4M·E_c − K_c²)/(4M²) folds as
    // exact integers and the total is one division of the exact
    // numerator sum. Scale shape: the corpus collapses to the
    // bounded edge list once; community joins ride the ≤|nations|
    // map broadcast; output is |regions| rows.
    "q350_modularity" -> ((s, d) => {
      def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val nmap = Tables.nation(s, d)
        .select(col("n_nationkey").as("node"),
          col("n_regionkey").as("reg"))
      val e = thresholdedUndirected(s, d)
        .join(broadcast(nmap.select(col("node").as("u"),
          col("reg").as("reg_u"))), Seq("u"))
        .join(broadcast(nmap.select(col("node").as("v"),
          col("reg").as("reg_v"))), Seq("v"))
      val m = e.agg(count(lit(1)).as("mm"))
      val within = e.filter(col("reg_u") === col("reg_v"))
        .groupBy(col("reg_u").as("reg")).agg(count(lit(1)).as("ec"))
      val ksum = e.select(col("reg_u").as("reg"))
        .union(e.select(col("reg_v").as("reg")))
        .groupBy(col("reg")).agg(count(lit(1)).as("kc"))
      Tables.region(s, d)
        .select(col("r_regionkey").as("reg"), col("r_name"))
        .join(ksum, Seq("reg"), "left")
        .join(within, Seq("reg"), "left")
        .crossJoin(broadcast(m))
        .select(col("reg").as("r_regionkey"), col("r_name"),
          coalesce(col("ec"), lit(0L)).as("e_within"),
          coalesce(col("kc"), lit(0L)).as("degree_sum"), col("mm"),
          (dec(lit(4L) * col("mm")) * dec(coalesce(col("ec"), lit(0L)))
            - dec(coalesce(col("kc"), lit(0L)))
              * dec(coalesce(col("kc"), lit(0L)))).as("tnum"))
        // mm = 0 (an empty thresholded graph): modularity of a
        // partition over zero edges is undefined — NULL, never a
        // div-0 error
        .withColumn("q_term", when(col("mm") > 0L,
          snap6(col("tnum").cast("double")
            / (dec(lit(4L) * col("mm")) * dec(col("mm")))
              .cast("double"))))
        .withColumn("q_total", when(col("mm") > 0L, snap6(
          sum(col("tnum")).over(Window.partitionBy()).cast("double")
            / (dec(lit(4L) * col("mm")) * dec(col("mm")))
              .cast("double"))))
        .select(col("r_regionkey"), col("r_name"), col("e_within"),
          col("degree_sum"), col("mm").as("n_edges"), col("q_term"),
          col("q_total"))
        .orderBy(col("r_regionkey"))
    }),

    // Weak-tie audit (Granovetter) over the q166 trade graph — per
    // edge, its SUPPORT (common-neighbor count): support-0 edges are
    // bridges between otherwise-unconnected neighborhoods, the
    // links a resilience/trust analysis treats differently from
    // embedded ones (q166 counts triangles per NODE; this reads the
    // same structure per EDGE). Support = one 2-path equi-join on
    // the symmetrized adjacency, exact counts; output is every edge
    // with its support and weak flag. Scale shape: corpus → bounded
    // edge list once; the 2-path join carries degree-bounded
    // fan-out on the dimension-sized graph.
    "q371_weak_ties" -> ((s, d) => {
      val e = thresholdedUndirected(s, d)
      val adj = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val nbrU = adj.select(col("u"), col("v").as("w"))
      val nbrV = adj.select(col("u").as("v"), col("v").as("w"))
      val support = e.join(nbrU, Seq("u")).join(nbrV, Seq("v", "w"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("sup"))
      e.join(support, Seq("u", "v"), "left")
        .select(col("u"), col("v"),
          coalesce(col("sup"), lit(0L)).as("support"),
          (coalesce(col("sup"), lit(0L)) === 0L).as("is_weak_tie"))
        .orderBy(col("u"), col("v"))
    }),

    // Harmonic centrality (4-hop-capped) over the q166 trade graph —
    // Σ_v 1/d(u,v), the closeness variant that handles disconnection
    // gracefully (unreachable ⇒ 0, no infinite sums) — the DISTANCE
    // family's entry in the graph tier (q154 ranks by flow, q166 by
    // local density; harmonic ranks by reach). Shortest paths by
    // THREE unrolled min-plus rounds over the bounded nation graph
    // (distances ≤ 4 — the thresholded graph's diameter; capping is
    // the standard large-graph practice and is labeled in the
    // column). Exact: distances are integer mins; reciprocals fold
    // as exact µ-longs 10⁶ DIV d; one division per node. Scale
    // shape: the corpus collapses to the bounded edge list once;
    // every round is a dimension-frame self-join.
    "q372_harmonic_centrality" -> ((s, d) => {
      val e = thresholdedUndirected(s, d)
      // ≤|nations|² edges — collect once and run the capped BFS
      // driver-side (the q154/q119 pattern: a 3-deep DataFrame
      // min-plus unroll re-analyzes the 4-table edge subtree 2³+
      // times and never finishes planning; the heavy stage is the
      // edge aggregation above, the iteration object is bounded).
      val edgeRows = e.collect()
        .map(r => (r.getAs[Number]("u").intValue,
          r.getAs[Number]("v").intValue))
      val adjMap = (edgeRows ++ edgeRows.map(_.swap))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val nodes = Tables.nation(s, d).select(col("n_nationkey"))
        .collect().map(_.getAs[Number](0).intValue).sorted
      val rows = nodes.toSeq.map { src =>
        var frontier = Set(src)
        var seen = Set(src)
        var h6 = 0L
        var reached = 0L
        for (depth <- 1 to 4) {
          frontier = frontier.flatMap(adjMap.getOrElse(_, Set.empty))
            .diff(seen)
          seen ++= frontier
          h6 += frontier.size.toLong * (1000000L / depth)
          reached += frontier.size
        }
        (src, reached, math.floor(h6.toDouble / 1e6 * 1e6 + 0.5) / 1e6)
      }
      import s.implicits._
      rows.toDF("node", "n_reached", "harmonic_4hop")
        .orderBy(col("node"))
    }),

    // 3-core extraction by bounded peeling (5 unrolled rounds) —
    // "the mutually-embedded trading core": repeatedly drop nodes
    // with fewer than 3 surviving neighbors; what's left is the
    // 3-core, the cohesion structure q342's rich-club (degree on
    // the FULL graph) doesn't see — a high-degree node whose
    // neighbors all leave is not core. Peeling is data-dependent,
    // so the unroll depth is EVIDENCE-CARRIED: the output's
    // `converged` column compares round-4 and round-5 survivor
    // counts — a non-converged run is visible in the result, not a
    // silent approximation. All rounds are exact set logic on the
    // bounded graph. Scale shape: corpus → edge list once; five
    // dimension-frame join rounds.
    "q373_kcore" -> ((s, d) => {
      val e0 = thresholdedUndirected(s, d)
      // collect the bounded edge list and peel driver-side (q154
      // pattern — a 5-deep DataFrame unroll re-derives the 4-table
      // edge join 2⁵ times; measured as a planner hang)
      val edgeRows = e0.collect()
        .map(r => (r.getAs[Number]("u").intValue,
          r.getAs[Number]("v").intValue))
      def peel(nodes: Set[Int]): Set[Int] = {
        val live = edgeRows.filter(p =>
          nodes(p._1) && nodes(p._2))
        val deg = (live.map(_._1) ++ live.map(_._2))
          .groupBy(identity).map { case (k, vs) => k -> vs.length }
        deg.filter(_._2 >= 3).keySet.toSet
      }
      val all = (edgeRows.map(_._1) ++ edgeRows.map(_._2)).toSet
      val r4 = peel(peel(peel(peel(all))))
      val r5 = peel(r4)
      val nations = Tables.nation(s, d).select(col("n_nationkey"))
        .collect().map(_.getAs[Number](0).intValue).sorted
      import s.implicits._
      nations.toSeq
        .map(n => (n, r5(n), r5.size.toLong, r4.size == r5.size))
        .toDF("node", "in_3core", "core_size", "converged")
        .orderBy(col("node"))
    }),

    // HITS hubs & authorities on the DIRECTED customer-nation →
    // supplier-nation trade graph (Kleinberg) — who CONSUMES from the
    // good producers (hubs) vs who PRODUCES for the good consumers
    // (authorities), the two-sided ranking q154's PageRank (one
    // score) collapses: 8 mutual-reinforcement rounds, driver-side
    // on the collected bounded graph (q154/q280 pattern). Cross-
    // engine exactness without float order: scores live in exact
    // MICRO-LONGS, each half-round is an integer sum over edges
    // followed by x·10⁶ DIV max(x) renormalization — per-step
    // integer truncation, order-free sums; the oracle unrolls the
    // same 8 rounds as MATERIALIZED CTEs. Scale shape: corpus → the
    // bounded directed edge list once.
    "q375_hits" -> ((s, d) => {
      // directed variant: the shared frame filtered of self-loops,
      // thresholded on the DIRECTED pair counts (hub/authority need
      // edge direction, so no least/greatest fold here).
      val pairs = Tables.nationEdges(s, d)
        .filter(col("src") =!= col("dst"))
      val bound = pairs.agg(
        round(percentile(col("cnt"), lit(0.75)), 6).as("thr"))
      val e = pairs.crossJoin(broadcast(bound))
        .filter(col("cnt") >= col("thr"))
        .select(col("src"), col("dst"))
      val edges = e.collect().map(r =>
        (r.getAs[Number]("src").intValue, r.getAs[Number]("dst").intValue))
      val nodes = Tables.nation(s, d).select(col("n_nationkey"))
        .collect().map(_.getAs[Number](0).intValue).sorted
      var hub = nodes.map(_ -> 1000000L).toMap
      var auth = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to 8) {
        val a0 = nodes.map(n =>
          n -> edges.filter(_._2 == n).map(p => hub(p._1)).sum).toMap
        // maxOption: a zero-node corpus must fall through to the empty
        // frame, not throw empty.max (empty-corpus probe)
        val aMax = math.max(a0.values.maxOption.getOrElse(0L), 1L)
        auth = a0.map { case (k, v) => k -> v * 1000000L / aMax }
        val h0 = nodes.map(n =>
          n -> edges.filter(_._1 == n).map(p => auth(p._2)).sum).toMap
        val hMax = math.max(h0.values.maxOption.getOrElse(0L), 1L)
        hub = h0.map { case (k, v) => k -> v * 1000000L / hMax }
      }
      import s.implicits._
      nodes.toSeq.map(n => (n,
          math.floor(hub(n).toDouble / 1e6 * 1e6 + 0.5) / 1e6,
          math.floor(auth(n).toDouble / 1e6 * 1e6 + 0.5) / 1e6))
        .toDF("node", "hub_score", "authority_score")
        .orderBy(col("node"))
    })
  )

  def oracle: Map[String, String] = Map(
    // the 10 iterations are UNROLLED as chained CTEs (recursive terms
    // with aggregation are non-standard); each mirrors the Spark
    // iteration including the 10-decimal aggregate rounding.
    "q154_pagerank" -> {
      val iters = (1 to Iters).map { k =>
        s"""r$k AS (SELECT n.n_nationkey AS node,
           |    0.15::DOUBLE / CAST(nn.n_nodes AS DOUBLE)
           |      + 0.85::DOUBLE * round(coalesce(t.acc, 0.0::DOUBLE), 10)
           |      AS rank
           |  FROM nation n CROSS JOIN nn LEFT JOIN
           |    (SELECT e.dst AS node, sum(r${k - 1}.rank * e.w) AS acc
           |     FROM r${k - 1} JOIN e ON r${k - 1}.node = e.src
           |     GROUP BY 1) t
           |    ON n.n_nationkey = t.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         |    count(*) AS cnt
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  GROUP BY 1, 2),
         |od AS (SELECT src, sum(cnt) AS outw FROM e0 GROUP BY 1),
         |e AS (SELECT e0.src, e0.dst,
         |    CAST(e0.cnt AS DOUBLE) / CAST(od.outw AS DOUBLE) AS w
         |  FROM e0 JOIN od USING (src)),
         |nn AS (SELECT count(*) AS n_nodes FROM nation),
         |r0 AS (SELECT n_nationkey AS node,
         |    1.0::DOUBLE / CAST(nn.n_nodes AS DOUBLE) AS rank
         |  FROM nation, nn),
         |$iters
         |SELECT node, rank FROM r$Iters ORDER BY node""".stripMargin
    },

    // same unrolled-CTE recipe as q154, in exact integer arithmetic:
    // each step's term is (pm·n) // r — per-term truncation, so the
    // GROUP BY sum is order-free longs, bit-equal to the driver loop.
    "q280_markov_stationary" -> {
      val steps = (1 to 12).map { k =>
        s"""it$k AS (SELECT tc.to_type AS t,
           |    CAST(sum((p.pm * tc.n) // rs.r) AS BIGINT) AS pm
           |  FROM it${k - 1} p JOIN tc ON tc.from_type = p.t
           |    JOIN rs ON rs.from_type = tc.from_type
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH tr AS (SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |tc AS (SELECT from_type, to_type, count(*) AS n FROM tr
         |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |rs AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS r
         |  FROM tc GROUP BY 1),
         |types AS (SELECT DISTINCT from_type AS t FROM tc
         |  UNION SELECT DISTINCT to_type FROM tc),
         |kk AS (SELECT count(*) AS k FROM types),
         |it0 AS (SELECT t, CAST(1000000 // k AS BIGINT) AS pm
         |  FROM types, kk),
         |$steps,
         |emp AS (SELECT to_type AS event_type,
         |    CAST(sum(n) AS BIGINT) AS n_steps FROM tc GROUP BY 1),
         |fin AS (SELECT it12.t AS event_type, it12.pm AS pm_micro,
         |    emp.n_steps
         |  FROM it12 JOIN emp ON emp.event_type = it12.t),
         |tot AS (SELECT CAST(sum(pm_micro) AS BIGINT) AS pm_tot,
         |    CAST(sum(n_steps) AS BIGINT) AS n_all FROM fin)
         |SELECT event_type, pm_micro,
         |  CAST(pm_micro AS DOUBLE) / CAST(pm_tot AS DOUBLE)
         |    AS stationary_share,
         |  CAST(n_steps AS DOUBLE) / CAST(n_all AS DOUBLE)
         |    AS empirical_share,
         |  abs(CAST(pm_micro AS DOUBLE) / CAST(pm_tot AS DOUBLE)
         |    - CAST(n_steps AS DOUBLE) / CAST(n_all AS DOUBLE))
         |    AS abs_gap
         |FROM fin, tot ORDER BY event_type""".stripMargin
    },

    "q166_triangles" ->
      """WITH p AS (SELECT least(c.c_nationkey, s.s_nationkey) AS u,
        |    greatest(c.c_nationkey, s.s_nationkey) AS v, count(*) AS cnt
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2),
        |b AS (SELECT round(quantile_cont(cnt, 0.75), 6) AS thr FROM p),
        |e AS (SELECT u, v FROM p, b WHERE cnt >= thr),
        |tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
        |  FROM e ab JOIN e bc ON ab.v = bc.u
        |  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
        |tn AS (SELECT node, count(*) AS n_triangles FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri) GROUP BY node),
        |deg AS (SELECT node, count(*) AS degree FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY node)
        |SELECT n.n_nationkey AS node,
        |  coalesce(deg.degree, 0) AS degree,
        |  coalesce(tn.n_triangles, 0) AS n_triangles,
        |  CASE WHEN coalesce(deg.degree, 0) >= 2
        |    THEN CAST(coalesce(tn.n_triangles, 0) * 2 AS DOUBLE)
        |      / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
        |    ELSE 0.0::DOUBLE END AS clustering
        |FROM nation n
        |LEFT JOIN deg ON n.n_nationkey = deg.node
        |LEFT JOIN tn ON n.n_nationkey = tn.node
        |ORDER BY node""".stripMargin,

    "q175_link_prediction" ->
      """WITH p AS (SELECT least(c.c_nationkey, s.s_nationkey) AS u,
        |    greatest(c.c_nationkey, s.s_nationkey) AS v, count(*) AS cnt
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2),
        |b AS (SELECT round(quantile_cont(cnt, 0.75), 6) AS thr FROM p),
        |e AS (SELECT u, v FROM p, b WHERE cnt >= thr),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY 1),
        |cm AS (SELECT az.u AS a, bz.u AS b, az.v AS z
        |  FROM sym az JOIN sym bz ON az.v = bz.v AND az.u < bz.u),
        |sc AS (SELECT cm.a, cm.b, count(*) AS n_common,
        |    sum(CAST(floor(1e9 / (floor(ln(CAST(deg.deg AS DOUBLE))
        |      * 1e6 + 0.5) / 1e6) + 0.5) AS BIGINT)) AS aa_u
        |  FROM cm JOIN deg ON cm.z = deg.node
        |  WHERE deg.deg >= 2
        |  GROUP BY 1, 2)
        |SELECT sc.a, sc.b, sc.n_common,
        |  CAST(sc.aa_u AS DOUBLE) / 1e9 AS aa_score
        |FROM sc ANTI JOIN e ON sc.a = e.u AND sc.b = e.v
        |ORDER BY sc.a, sc.b""".stripMargin,

    "q298_degree_assortativity" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS u, l_suppkey AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |dg AS (SELECT u, v,
        |    CAST(count(*) OVER (PARTITION BY u) AS BIGINT) AS du,
        |    CAST(count(*) OVER (PARTITION BY v) AS BIGINT) AS dv
        |  FROM e),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS e,
        |    sum(CAST(du AS HUGEINT)) AS su,
        |    sum(CAST(dv AS HUGEINT)) AS sv,
        |    sum(CAST(du AS HUGEINT) * CAST(du AS HUGEINT)) AS suu,
        |    sum(CAST(dv AS HUGEINT) * CAST(dv AS HUGEINT)) AS svv,
        |    sum(CAST(du AS HUGEINT) * CAST(dv AS HUGEINT)) AS suv
        |  FROM dg)
        |SELECT e AS n_edges,
        |  floor(CAST(su AS DOUBLE) / CAST(e AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS mean_cust_degree,
        |  floor(CAST(sv AS DOUBLE) / CAST(e AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS mean_supp_degree,
        |  CASE WHEN e * suu - su * su > 0 AND e * svv - sv * sv > 0 THEN
        |    floor(CAST(e * suv - su * sv AS DOUBLE)
        |      / (sqrt(CAST(e * suu - su * su AS DOUBLE))
        |        * sqrt(CAST(e * svv - sv * sv AS DOUBLE))) * 1e6 + 0.5)
        |      / 1e6 END AS assortativity
        |FROM m""".stripMargin,

    "q342_rich_club" ->
      """WITH p AS (SELECT least(c.c_nationkey, s.s_nationkey) AS u,
        |    greatest(c.c_nationkey, s.s_nationkey) AS v, count(*) AS cnt
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2),
        |b AS (SELECT round(quantile_cont(cnt, 0.75), 6) AS thr FROM p),
        |e AS (SELECT u, v FROM p, b WHERE cnt >= thr),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY node),
        |ks AS (SELECT CAST(k AS BIGINT) AS k
        |  FROM (VALUES (0), (2), (4), (6), (8), (10)) t(k)),
        |nr AS (SELECT k, CAST(count(*) AS BIGINT) AS n_rich
        |  FROM ks, deg WHERE degree > k GROUP BY 1),
        |er AS (SELECT k, CAST(count(*) AS BIGINT) AS e_rich
        |  FROM ks, (SELECT e.u, e.v, du.degree AS du, dv.degree AS dv
        |    FROM e JOIN deg du ON e.u = du.node
        |    JOIN deg dv ON e.v = dv.node) x
        |  WHERE x.du > k AND x.dv > k GROUP BY 1)
        |SELECT ks.k, coalesce(nr.n_rich, 0) AS n_rich,
        |  coalesce(er.e_rich, 0) AS e_rich,
        |  CASE WHEN coalesce(nr.n_rich, 0) >= 2 THEN
        |    floor(CAST(coalesce(er.e_rich, 0) * 2 AS DOUBLE)
        |      / CAST(nr.n_rich * (nr.n_rich - 1) AS DOUBLE)
        |      * 1e6 + 0.5) / 1e6 END AS phi
        |FROM ks LEFT JOIN nr ON ks.k = nr.k
        |LEFT JOIN er ON ks.k = er.k
        |ORDER BY ks.k""".stripMargin,

    "q350_modularity" ->
      """WITH p AS (SELECT least(c.c_nationkey, s.s_nationkey) AS u,
        |    greatest(c.c_nationkey, s.s_nationkey) AS v, count(*) AS cnt
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2),
        |b AS (SELECT round(quantile_cont(cnt, 0.75), 6) AS thr FROM p),
        |e0 AS (SELECT u, v FROM p, b WHERE cnt >= thr),
        |e AS (SELECT e0.u, e0.v, nu.n_regionkey AS reg_u,
        |    nv.n_regionkey AS reg_v
        |  FROM e0 JOIN nation nu ON e0.u = nu.n_nationkey
        |  JOIN nation nv ON e0.v = nv.n_nationkey),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS mm FROM e),
        |wi AS (SELECT reg_u AS reg, CAST(count(*) AS BIGINT) AS ec
        |  FROM e WHERE reg_u = reg_v GROUP BY 1),
        |ks AS (SELECT reg, CAST(count(*) AS BIGINT) AS kc FROM (
        |    SELECT reg_u AS reg FROM e
        |    UNION ALL SELECT reg_v FROM e) GROUP BY 1),
        |f AS (SELECT r.r_regionkey, r.r_name,
        |    coalesce(wi.ec, 0) AS e_within,
        |    coalesce(ks.kc, 0) AS degree_sum, m.mm,
        |    CAST(4 * m.mm AS HUGEINT) * coalesce(wi.ec, 0)
        |      - CAST(coalesce(ks.kc, 0) AS HUGEINT)
        |        * coalesce(ks.kc, 0) AS tnum
        |  FROM region r
        |  LEFT JOIN ks ON r.r_regionkey = ks.reg
        |  LEFT JOIN wi ON r.r_regionkey = wi.reg
        |  CROSS JOIN m)
        |SELECT r_regionkey, r_name,
        |  CAST(e_within AS BIGINT) AS e_within,
        |  CAST(degree_sum AS BIGINT) AS degree_sum,
        |  mm AS n_edges,
        |  CASE WHEN mm > 0 THEN
        |    floor(CAST(tnum AS DOUBLE) / CAST(CAST(4 * mm AS HUGEINT)
        |    * mm AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS q_term,
        |  CASE WHEN mm > 0 THEN
        |    floor(CAST(sum(tnum) OVER () AS DOUBLE)
        |    / CAST(CAST(4 * mm AS HUGEINT) * mm AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 END AS q_total
        |FROM f ORDER BY r_regionkey""".stripMargin,

    "q371_weak_ties" ->
      """WITH p AS (SELECT least(c.c_nationkey, s.s_nationkey) AS u,
        |    greatest(c.c_nationkey, s.s_nationkey) AS v, count(*) AS cnt
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2),
        |b AS (SELECT round(quantile_cont(cnt, 0.75), 6) AS thr FROM p),
        |e AS (SELECT u, v FROM p, b WHERE cnt >= thr),
        |adj AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |sup AS (SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS sup
        |  FROM e JOIN adj a1 ON a1.u = e.u
        |  JOIN adj a2 ON a2.u = e.v AND a2.v = a1.v
        |  GROUP BY 1, 2)
        |SELECT e.u, e.v, coalesce(sup.sup, 0) AS support,
        |  coalesce(sup.sup, 0) = 0 AS is_weak_tie
        |FROM e LEFT JOIN sup ON e.u = sup.u AND e.v = sup.v
        |ORDER BY e.u, e.v""".stripMargin,

    // the three min-plus rounds are unrolled (same convention as the
    // q154 oracle's unrolled iterations); CTEs MATERIALIZED so each
    // round's double self-reference doesn't re-expand the 4-table
    // scan exponentially (measured as a multi-minute stall at sf0.1)
    "q372_harmonic_centrality" -> (
      """WITH p AS MATERIALIZED (
        |  SELECT least(c.c_nationkey, s.s_nationkey) AS u,
        |    greatest(c.c_nationkey, s.s_nationkey) AS v, count(*) AS cnt
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2),
        |b AS (SELECT round(quantile_cont(cnt, 0.75), 6) AS thr FROM p),
        |e AS MATERIALIZED (SELECT u, v FROM p, b WHERE cnt >= thr),
        |adj AS MATERIALIZED (SELECT u, v, CAST(1 AS BIGINT) AS d
        |  FROM e UNION ALL SELECT v, u, 1 FROM e),
        |r0 AS MATERIALIZED (SELECT u, v, CAST(min(d) AS BIGINT) AS d
        |  FROM adj GROUP BY 1, 2),
        |""".stripMargin
      + (1 to 3).map { i =>
          s"""r$i AS MATERIALIZED (
             |  SELECT u, v, CAST(min(d) AS BIGINT) AS d FROM (
             |    SELECT u, v, d FROM r${i - 1}
             |    UNION ALL SELECT a.u, bb.v, a.d + bb.d
             |    FROM r${i - 1} a JOIN adj bb ON a.v = bb.u
             |    WHERE a.u <> bb.v) GROUP BY 1, 2),
             |""".stripMargin
        }.mkString
      + """h AS (SELECT n.n_nationkey AS node,
        |    CAST(count(r3.v) AS BIGINT) AS n_reached,
        |    CAST(sum(1000000 // r3.d) AS BIGINT) AS h6
        |  FROM nation n LEFT JOIN r3 ON n.n_nationkey = r3.u
        |  GROUP BY 1)
        |SELECT node, n_reached,
        |  floor(CAST(coalesce(h6, 0) AS DOUBLE) / 1e6 * 1e6 + 0.5)
        |    / 1e6 AS harmonic_4hop
        |FROM h ORDER BY node""".stripMargin),

    // five peel rounds unrolled; convergence is carried in the
    // output. CTEs are MATERIALIZED: inlined, each round re-expands
    // e0's 4-table scan 2× per reference and the unroll exhausts
    // file handles (measured: "Too many open files" at round 5).
    "q373_kcore" -> (
      """WITH p AS MATERIALIZED (
        |  SELECT least(c.c_nationkey, s.s_nationkey) AS u,
        |    greatest(c.c_nationkey, s.s_nationkey) AS v, count(*) AS cnt
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2),
        |b AS (SELECT round(quantile_cont(cnt, 0.75), 6) AS thr FROM p),
        |e0 AS MATERIALIZED (SELECT u, v FROM p, b WHERE cnt >= thr),
        |p0 AS MATERIALIZED (SELECT DISTINCT node FROM (
        |  SELECT u AS node FROM e0
        |  UNION ALL SELECT v FROM e0)),
        |""".stripMargin
      + (1 to 5).map { i =>
          s"""p$i AS MATERIALIZED (SELECT node FROM (
             |  SELECT node, count(*) AS deg
             |  FROM (SELECT e0.u AS node FROM e0
             |      JOIN p${i - 1} a ON e0.u = a.node
             |      JOIN p${i - 1} bb ON e0.v = bb.node
             |    UNION ALL SELECT e0.v FROM e0
             |      JOIN p${i - 1} a ON e0.u = a.node
             |      JOIN p${i - 1} bb ON e0.v = bb.node)
             |  GROUP BY 1) WHERE deg >= 3),
             |""".stripMargin
        }.mkString
      + """cts AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM p4)
        |    AS n4,
        |  (SELECT CAST(count(*) AS BIGINT) FROM p5) AS n5)
        |SELECT n.n_nationkey AS node,
        |  p5.node IS NOT NULL AS in_3core,
        |  n5 AS core_size, n4 = n5 AS converged
        |FROM nation n LEFT JOIN p5 ON n.n_nationkey = p5.node
        |CROSS JOIN cts ORDER BY node""".stripMargin),

    // eight HITS rounds unrolled as MATERIALIZED CTEs, mirroring the
    // driver-side micro-long integer arithmetic step for step
    "q375_hits" -> (
      """WITH p AS MATERIALIZED (SELECT c.c_nationkey AS src,
        |    s.s_nationkey AS dst, count(*) AS cnt
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2),
        |b AS (SELECT round(quantile_cont(cnt, 0.75), 6) AS thr FROM p),
        |e AS MATERIALIZED (SELECT src, dst FROM p, b
        |  WHERE cnt >= thr),
        |n0 AS MATERIALIZED (SELECT n_nationkey AS node FROM nation),
        |h0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT)
        |  AS sc FROM n0),
        |""".stripMargin
      + (1 to 8).map { i =>
          s"""ar$i AS MATERIALIZED (SELECT n0.node,
             |    CAST(coalesce(sum(h${i - 1}.sc), 0) AS BIGINT) AS sc
             |  FROM n0 LEFT JOIN e ON e.dst = n0.node
             |  LEFT JOIN h${i - 1} ON h${i - 1}.node = e.src
             |  GROUP BY 1),
             |am$i AS (SELECT CASE WHEN max(sc) > 0 THEN max(sc)
             |  ELSE 1 END AS m FROM ar$i),
             |a$i AS MATERIALIZED (SELECT node, sc * 1000000 // m AS sc
             |  FROM ar$i, am$i),
             |hr$i AS MATERIALIZED (SELECT n0.node,
             |    CAST(coalesce(sum(a$i.sc), 0) AS BIGINT) AS sc
             |  FROM n0 LEFT JOIN e ON e.src = n0.node
             |  LEFT JOIN a$i ON a$i.node = e.dst
             |  GROUP BY 1),
             |hm$i AS (SELECT CASE WHEN max(sc) > 0 THEN max(sc)
             |  ELSE 1 END AS m FROM hr$i),
             |h$i AS MATERIALIZED (SELECT node, sc * 1000000 // m AS sc
             |  FROM hr$i, hm$i),
             |""".stripMargin
        }.mkString
      + """f AS (SELECT h8.node, h8.sc AS hs, a8.sc AS asc_
        |  FROM h8 JOIN a8 ON h8.node = a8.node)
        |SELECT node, CAST(hs AS DOUBLE) / 1e6 AS hub_score,
        |  CAST(asc_ AS DOUBLE) / 1e6 AS authority_score
        |FROM f ORDER BY node""".stripMargin)
  )
}
