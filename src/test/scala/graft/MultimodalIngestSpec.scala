package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the multimodal INGESTION path: media lands as loose files, and
  * Spark's `binaryFile` source turns a directory of them into the
  * (path, length, content) DataFrame the decode/feature stages consume
  * (ops/Multimodal.decodeStub). Files are written from EXECUTORS via
  * foreachPartition — the distributed landing shape, no driver funnel —
  * then read back with a pathGlobFilter and identity-joined against the
  * in-plan payloads to prove byte-for-byte agreement.
  */
class MultimodalIngestSpec extends AnyFunSuite {
  import SparkTestSession._

  test("binaryFile reads executor-written payload files byte-for-byte") {
    val dir = "target/tmp/ingest/payloads"
    Files.createDirectories(Paths.get(dir))
    val abs = Paths.get(dir).toAbsolutePath.toString

    val payloads = ops.Multimodal.withPayload(spark, sf)
      .select(col("doc_id"), col("payload"))
    payloads.foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          Files.write(Paths.get(abs, s"doc_${r.getLong(0)}.bin"),
            r.getAs[Array[Byte]](1))
        }
    }

    val read = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1)
          .cast("long").as("doc_id"),
        col("length"), col("content"))

    val n = payloads.count()
    assert(read.count() == n, "every written file must be ingested")

    val mismatches = read.as("r")
      .join(payloads.as("p"), col("r.doc_id") === col("p.doc_id"))
      .filter(col("r.content") =!= col("p.payload") ||
        col("r.length") =!= length(col("p.payload")).cast("long"))
      .count()
    assert(mismatches == 0, "ingested bytes must equal the source payloads")
  }
}
