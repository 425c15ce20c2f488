package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-row handling at ingest: at 100 TB some rows WILL be
  * garbage, and the parse-mode contract decides whether the pipeline
  * quarantines them (PERMISSIVE + columnNameOfCorruptRecord), silently
  * sheds them (DROPMALFORMED), or halts (FAILFAST). All three modes are
  * pinned against the same file so an option regression can't silently
  * change which rows survive.
  */
class MalformedInputSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val dir = {
    val d = Paths.get("target/tmp/malformed")
    Files.createDirectories(d)
    val f = d.resolve("rows.csv")
    Files.write(f, java.util.Arrays.asList(
      "id,qty,price",
      "1,10,5.50",
      "2,notanumber,6.25", // qty unparseable
      "3,30,7.75",
      "4,40,oops"));       // price unparseable
    d.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("qty", IntegerType),
    StructField("price", DoubleType),
    StructField("_corrupt", StringType)))

  test("PERMISSIVE quarantines bad rows into the corrupt-record column") {
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(dir)
      .cache()
    assert(df.count() == 4, "PERMISSIVE keeps every row")
    assert(df.filter(col("_corrupt").isNotNull).count() == 2)
    // bad field is null, the rest of the row survives
    val r2 = df.filter(col("id") === 2).collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("qty")) &&
      r2.getDouble(r2.fieldIndex("price")) == 6.25)
    df.unpersist()
  }

  test("DROPMALFORMED sheds exactly the bad rows — IF their columns are read") {
    val df = spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(StructType(schema.dropRight(1)))
      .csv(dir)
    // the subtlety worth pinning: with CSV column pruning, malformed-ness
    // is judged only on the columns the query actually reads — an
    // id-only projection parses nothing else and keeps all 4 rows.
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // a full-row read parses every field and drops the two bad rows.
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("FAILFAST halts the job on the first bad row (full-row read)") {
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read
        .option("header", "true")
        .option("mode", "FAILFAST")
        .schema(StructType(schema.dropRight(1)))
        .csv(dir)
        .collect()
    }
    assert(ex.getMessage.contains("Malformed") || ex.getCause != null,
      s"unexpected failure shape: ${ex.getMessage}")
  }

  test("corpus signals shed null/empty-text documents, never crash") {
    // a dirty feed will carry null and empty text; the word-level
    // operators must drop those documents (size(null words) = -1 fails
    // every >= threshold; null terms never match an inner-join key)
    // rather than throw — and must keep every well-formed neighbor.
    import graft.ops.CorpusSignals
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha beta gamma", "en", "src0", 27L),
      (2L, null.asInstanceOf[String], "en", "src0", 0L),
      (3L, "", "en", "src0", 0L),
      (4L, "   ", "en", "src0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rep = CorpusSignals.repetition(docs).collect()
    assert(rep.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L),
      "only the well-formed doc has 2-grams")
    val dup = CorpusSignals.dupSubstrings(docs).collect()
    assert(dup.isEmpty, "no doc reaches 20 words")
    // tf-idf: null text yields a null term and empty/whitespace text
    // normalizes to the single '' token — the term filter sheds both
    // the same way, so no degenerate doc ranks a meaningless top-term
    // row or inflates '' df corpus-wide (round-7 advisor item).
    val tfidf = CorpusSignals.tfidfTopK(docs).collect()
    assert(tfidf.map(_.getAs[Long]("doc_id")).distinct.toSeq === Seq(1L),
      "null/empty/whitespace docs must all be shed")
    assert(tfidf.count(_.getAs[Long]("doc_id") === 1L) === 3)
    assert(tfidf.forall { r =>
      val t = r.getAs[String]("term"); t != null && t.nonEmpty
    })
  }

  test("corrupt parquet FILES: default halts, ignoreCorruptFiles sheds") {
    // row-level quarantine (above) is not the whole story: at 100 TB a
    // feed directory occasionally carries a truncated or garbage FILE
    // (killed writer, partial upload). Default reads must FAIL — silent
    // data loss is worse than a halt — and flipping
    // spark.sql.files.ignoreCorruptFiles=true must shed exactly the bad
    // file and keep every healthy row, so an operator can quarantine
    // and continue deliberately, never accidentally.
    val d = Paths.get("target/tmp/corruptdir")
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
    Files.createDirectories(d)
    spark.range(0, 100).selectExpr("id", "id * 2 AS v")
      .coalesce(1).write.mode("overwrite").parquet(d.toString)
    Files.write(d.resolve("part-junk.parquet"),
      "this is not a parquet file".getBytes)
    // explicit schema so the failure always lands at scan time inside
    // the intercepted collect() — inference could sample the junk file's
    // footer first and throw a different exception type at read() time.
    val thrown = intercept[org.apache.spark.SparkException] {
      spark.read.schema("id BIGINT, v BIGINT").parquet(d.toString)
        .agg(sum(col("v"))).collect()
    }
    assert(thrown.getMessage != null)
    val lenient = spark.newSession()
    lenient.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    val rows = lenient.read.parquet(d.toString)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s")).collect()(0)
    assert(rows.getLong(0) === 100L && rows.getLong(1) === 9900L,
      "every healthy row survives; only the corrupt file is shed")
  }
}
