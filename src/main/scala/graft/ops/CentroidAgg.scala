package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (SURVEY §2.12 — the reference has no UDAF
  * mechanism at all; this is the Spark-idiomatic `Aggregator[IN,BUF,OUT]`
  * surface): element-wise centroid of embedding vectors, the reduction
  * an IVF index build or k-means step runs per cluster.
  *
  * The buffer is (running sum per dimension, count); merge is
  * element-wise — associative and commutative, so Spark can combine
  * map-side partials in any order. That also means the floating-point
  * summation order is partition-dependent: centroids are deterministic
  * only up to ulp-level reordering noise, which is why this ships as a
  * library aggregator pinned by OpsSpec (tolerance compare vs a
  * single-threaded reference) rather than a hash-compared oracle query.
  *
  * Dimensionality contract: all non-empty input vectors must share one
  * fixed dimension (the first non-empty vector seen fixes it); a ragged
  * vector raises IllegalArgumentException rather than silently averaging
  * a common prefix.
  */
object CentroidAgg extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  /** Null/empty vectors carry no dimensional information and are
    * ignored — so `sum.isEmpty ⟺ n == 0` is an invariant, which is what
    * makes the empty-buffer branches in merge() count-correct.
    */
  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val (sum, n) = b
    if (v == null || v.isEmpty) b
    else if (sum.isEmpty) (v.toArray, n + 1)
    else {
      require(v.length == sum.length,
        s"CentroidAgg: vector dimension ${v.length} != expected ${sum.length}")
      var i = 0
      while (i < sum.length) { sum(i) += v(i); i += 1 }
      (sum, n + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"CentroidAgg: partial dimensions differ (${a._1.length} vs ${b._1.length})")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.toSeq.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.kryo[Array[Double]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
