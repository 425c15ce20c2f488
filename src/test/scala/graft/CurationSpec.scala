package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the corpus-curation operators that the oracle
  * hash-match alone doesn't spell out: split totality, packing
  * conservation laws, guaranteed contamination detection, and redaction
  * completeness — plus the broadcast shape of the decontamination join.
  */
class CurationSpec extends AnyFunSuite {
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
