package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the corpus-curation operators that the oracle
  * hash-match alone doesn't spell out: split totality, packing
  * conservation laws, guaranteed contamination detection, and redaction
  * completeness — plus the broadcast shape of the decontamination join.
  */
class CurationSpec extends AnyFunSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import SparkTestSession._

  test("q100 split is total, disjoint, and train-dominated") {
    val rows = Curation.queries("q100_hash_split")(spark, sf).collect()
    val n = rows.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    val corpus = Tables.documents(spark, sf).count()
    assert(n.values.sum === corpus, "every doc lands in exactly one split")
    assert(n("train") > n.getOrElse("valid", 0L) + n.getOrElse("test", 0L),
      s"train must dominate: $n")
  }

  test("q101 packing conserves tokens and respects chunk geometry") {
    val rows = Curation.queries("q101_seq_pack")(spark, sf)
      .orderBy("doc_id").collect()
    assert(rows.head.getAs[Long]("chunk_id") === 0L)
    assert(rows.head.getAs[Long]("chunk_offset") === 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("chunk_offset") >= 0L
        && r.getAs[Long]("chunk_offset") < 2048L)
    }
    // chunk ids are non-decreasing in doc order, with no skipped chunk
    // longer than one doc can span.
    val chunks = rows.map(_.getAs[Long]("chunk_id"))
    assert(chunks.zip(chunks.tail).forall { case (a, b) => b >= a })
    // conservation: the last doc's start equals the sum of all prior
    // token counts (reconstructed from chunk geometry).
    val last = rows.last
    val lastStart = last.getAs[Long]("chunk_id") * 2048L +
      last.getAs[Long]("chunk_offset")
    assert(lastStart === rows.init.map(_.getAs[Long]("n_tok")).sum)
  }

  test("q101 three-level prefix sum equals the naive single-window cumsum") {
    // cross-implementation pin: the distributed decomposition (bucket +
    // super-bucket partials, within-group windows) must reproduce the
    // mathematically-obvious formulation — one unpartitioned running
    // sum over the whole corpus — row for row. The naive form is the
    // spec; the shipped form is the one that scales.
    import org.apache.spark.sql.expressions.{Window => W}
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.ops.Text.words(col("text"))).cast("long").as("n_tok"))
    val naive = toks
      .withColumn("start", coalesce(sum(col("n_tok")).over(
        W.orderBy(col("doc_id"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tok"),
        expr("start DIV 2048").as("chunk_id"),
        pmod(col("start"), lit(2048L)).as("chunk_offset"))
      .orderBy(col("doc_id")).collect().toSeq
    val shipped = Curation.queries("q101_seq_pack")(spark, sf)
      .collect().toSeq
    assert(shipped === naive)
  }

  test("q101 runs no unpartitioned window over corpus-scaled rows") {
    // the three-level prefix sum's contract: the ONLY window with an
    // empty partition spec is the super-bucket running offset, whose
    // input frame is corpus/10^6 rows — it must never see doc-level
    // (doc_id) or bucket-level (bkt) rows, or a 100 TB corpus funnels
    // through one partition's sort.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    val df = Curation.queries("q101_seq_pack")(spark, sf)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LogicalWindow => w }
    // the LOGICAL tree repeats the shared-scan subtree once per
    // consumer (its single physical materialization is PlanShapeSpec's
    // pin), so assert on window SHAPES, not node counts.
    val unpart = wins.filter(_.partitionSpec.isEmpty)
    assert(unpart.nonEmpty, s"expected the top-level running offset: $wins")
    for (w <- unpart) {
      val in = w.child.output.map(_.name)
      assert(in.contains("sbkt") && !in.contains("doc_id") && !in.contains("bkt"),
        s"top-level window must run over the super-bucket frame only, saw: $in")
    }
    // every partitioned window runs within a bucket or super-bucket
    // group (≤1024 rows per sort group at any corpus size).
    for (w <- wins.filterNot(_.partitionSpec.isEmpty)) {
      val keys = w.partitionSpec.flatMap(_.references.map(_.name))
      assert(keys.forall(k => k == "bkt" || k == "sbkt"),
        s"windows must partition on bucket keys only, saw: $keys")
    }
  }

  test("q102 broadcasts the eval side at any eval size; train never reshuffles") {
    // size independence: grow the eval set ~14x (every 7th doc instead
    // of every 97th) and the plan must not change shape — eval is the
    // build/broadcast side because benchmarks are bounded by nature,
    // and the train corpus reaches the join straight from the scan
    // with no shuffle, whatever the corpus size.
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    for (evalMod <- Seq(97L, 7L)) {
      val df = Curation.decontaminate(Tables.documents(spark, sf), evalMod)
      val plan = stripAQEPlan(df.queryExecution.executedPlan)
      val bhj = collect(plan) { case b: BroadcastHashJoinExec => b }
      assert(bhj.size === 1, s"evalMod=$evalMod: expected one BHJ:\n$plan")
      val streamed = bhj.head.buildSide match {
        case BuildLeft => bhj.head.right
        case BuildRight => bhj.head.left
      }
      val build = bhj.head.buildSide match {
        case BuildLeft => bhj.head.left
        case BuildRight => bhj.head.right
      }
      assert(build.output.map(_.name).contains("eval_doc"),
        s"evalMod=$evalMod: the EVAL side must be the broadcast side:\n$plan")
      val shuffles = collect(streamed) { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"evalMod=$evalMod: train side must not shuffle before the join:\n$plan")
    }
  }

  test("q102 flags every benchmark item inside its own source document") {
    val df = Curation.queries("q102_decontaminate")(spark, sf)
    val rows = df.collect()
    val evalDocs = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(97L)) === 0).collect().map(_.getAs[Long]("doc_id"))
    assert(evalDocs.nonEmpty, "test corpus must contain eval docs")
    for (e <- evalDocs) {
      val self = rows.find(r => r.getAs[Long]("train_doc") == e
        && r.getAs[Long]("eval_doc") == e)
      assert(self.exists(_.getAs[Boolean]("contaminated")),
        s"source doc $e must flag its own snippet")
    }
    // the tiny eval side must broadcast — the train corpus is never
    // shuffled before the join.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q104 mix repeats every doc 1-4 times per its tier, epochs contiguous") {
    val rows = Curation.queries("q104_weighted_mix")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size === Tables.documents(spark, sf).count(),
      "every doc must appear in the mix")
    byDoc.foreach { case (id, rs) =>
      val epochs = rs.map(_.getAs[Long]("epoch")).sorted
      val n = rs.head.getAs[Long]("n_epochs")
      assert(epochs === (1L to n), s"doc $id epochs not contiguous: ${epochs.toSeq}")
      val src = rs.head.getAs[String]("source")
      val tier =
        if (Seq("src0", "src1", "src2", "src3", "src4").contains(src)) (3L, 3L)
        else if (Seq("src5", "src6", "src7", "src8", "src9").contains(src)) (2L, 2L)
        else if (Seq("src10", "src11", "src12", "src13", "src14").contains(src)) (1L, 2L)
        else (1L, 1L)
      assert(n >= tier._1 && n <= tier._2, s"doc $id ($src) repeated $n times")
    }
  }

  test("q105 sample is deterministic and downsamples the dominant language") {
    val df = Curation.queries("q105_stratified_sample")(spark, sf)
    val a = df.collect().toSeq
    assert(a === Curation.queries("q105_stratified_sample")(spark, sf)
      .collect().toSeq, "sampling must be reproducible")
    val keptEn = a.count(_.getAs[String]("lang") == "en")
    val totalEn = Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(keptEn < totalEn / 4,
      s"en must downsample hard: kept $keptEn of $totalEn")
    assert(a.nonEmpty && a.size < Tables.documents(spark, sf).count())
  }

  test("q103 redaction is complete: counts positive, head fully scrubbed") {
    val rows = Curation.queries("q103_redact")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") >= 1L)
      assert(r.getAs[Long]("n_phones") >= 1L)
      assert(r.getAs[String]("redacted_head")
        .startsWith("Contact <EMAIL> or call <PHONE> now."),
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[String]("redacted_head")}")
    }
  }
}
