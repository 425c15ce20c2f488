package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins MERGEABLE distinct-count sketches (hll_sketch_agg /
  * hll_union_agg, Apache DataSketches): the 100 TB pattern is to keep
  * one small binary sketch per segment (day / source / partition) and
  * union sketches at query time — never re-scanning raw keys. The
  * bitmap query (q31b) is the exact counterpart; HLL trades exactness
  * for fixed tiny size. Pinned here: sketches are binary artifacts,
  * merging them equals sketching the union, and the estimate lands
  * within HLL's error envelope of the exact count.
  */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("per-source HLL sketches merge to the global estimate within 5%") {
    val docs = Tables.documents(spark, sf)

    val perSource = docs.groupBy(col("source"))
      .agg(expr("hll_sketch_agg(doc_id)").as("sk"))
    assert(perSource.schema("sk").dataType ==
      org.apache.spark.sql.types.BinaryType,
      "sketches must be storable binary artifacts")

    val merged = perSource
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect()(0).getLong(0)

    // NOTE: merging per-segment sketches is NOT bit-identical to one
    // global sketch (union estimation differs in sparse/dense mode) —
    // the contract is that BOTH land inside the error envelope.
    val direct = docs
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id))").as("est"))
      .collect()(0).getLong(0)
    val exact = docs.select(col("doc_id")).distinct().count()
    for ((name, est) <- Seq("merged" -> merged, "direct" -> direct))
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"$name estimate $est vs exact $exact outside 5%")
  }

  test("rows-only queries are deterministic run-to-run (q39, q56)") {
    // these two have no DuckDB twin (engine-specific sketch/digest
    // internals), so the driver's check is rows-only; what CAN be
    // pinned is that re-executing yields byte-identical results —
    // estimates and digests are pure functions of the input.
    for (q <- Seq("q39_approx_sketch", "q56_hash_sketch")) {
      val run1 = SparkEntry.queries(q)(spark, sf).collect().toSeq
      val run2 = SparkEntry.queries(q)(spark, sf).collect().toSeq
      assert(run1 === run2, s"$q is not deterministic across runs")
    }
  }
}
