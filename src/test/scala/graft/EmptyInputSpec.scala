package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zero-row robustness: at 100 TB a filter, a partition, or a day's
  * delta is routinely EMPTY, and every operator must pass empties
  * through with schema intact instead of throwing — an empty-input
  * crash in one stage kills the whole pipeline run.
  */
class EmptyInputSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val empty = Tables.lineitem(spark, sf).filter(lit(false))
  private lazy val li = Tables.lineitem(spark, sf)

  // round 14: the whole catalog must survive a ZERO-ROW corpus (every
  // table schema-complete but empty). The first full-catalog probe
  // (graft.DegenProbe --empty) caught 9 crashes: schema inference over
  // empty round-trip writes (q81/q84/q123/q142 — now read back with
  // the writer's explicit schema), a non-nullable encoder on a NULL
  // global max (q119), driver-side empty.max (q375), and 3 more ÷0
  // denominators (q176/q180/q210).
  test("full-catalog sweep: empty corpus yields no crash and no NaN/Inf") {
    val dir = DegenCorpus.write(spark,
      java.nio.file.Paths.get("target/tmp/empty_corpus")
        .toAbsolutePath.toString, empty = true)
    val names = SparkEntry.queries.keys.toSeq.sorted
    assert(names.size >= 400)
    val problems = names.flatMap { q =>
      try {
        val df = SparkEntry.queries(q)(spark, dir)
        val doubleIdx = df.schema.fields.zipWithIndex.collect {
          case (f, i) if f.dataType ==
            org.apache.spark.sql.types.DoubleType => (f.name, i)
        }
        df.collect().flatMap { r =>
          doubleIdx.collect {
            case (fn, i) if !r.isNullAt(i) &&
                (r.getDouble(i).isNaN || r.getDouble(i).isInfinite) =>
              s"$q: $fn = ${r.getDouble(i)} (must be NULL or finite)"
          }
        }.headOption
      } catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        Some(s"$q: ${msg.linesIterator.take(2).mkString(" ")}")
      }
    }
    assert(problems.isEmpty,
      s"empty-corpus failures:\n${problems.mkString("\n")}")
  }

  test("grouped agg on empty input yields zero groups; global agg one row") {
    assert(empty.groupBy("l_returnflag").agg(sum("l_quantity")).count() == 0)
    val g = empty.agg(count(lit(1)).as("n"), sum("l_quantity").as("s")).collect()
    assert(g.length == 1 && g(0).getLong(0) == 0L && g(0).isNullAt(1))
  }

  test("sort/limit/distinct/window pass empties through with schema intact") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("l_orderkey")
    val out = empty
      .orderBy("l_orderkey").limit(10).distinct()
      .withColumn("rn", row_number().over(w))
    assert(out.count() == 0)
    assert(out.schema.fieldNames.contains("rn"))
  }

  test("joins with an empty side keep outer semantics") {
    val dim = li.select("l_orderkey").distinct().limit(5)
    assert(empty.join(dim, Seq("l_orderkey")).count() == 0)
    assert(empty.join(dim, Seq("l_orderkey"), "right").count() == 5)
    assert(dim.join(empty.select("l_orderkey"),
      Seq("l_orderkey"), "left_anti").count() == 5)
  }

  test("native per-key top-k returns empty on empty input") {
    val out = api.Frame(empty)
      .topK(Seq("l_returnflag"), Seq(("l_quantity", false)), 3)
    assert(out.count() == 0)
  }

  test("Frame.hist and uniques tolerate empty input") {
    assert(api.Frame(empty).uniques("l_returnflag").count() == 0)
    assert(api.Frame(empty).hist("l_quantity", 5).count() == 0)
  }

  test("set ops with one empty side") {
    val keys = li.select("l_orderkey").limit(3)
    val none = empty.select("l_orderkey")
    assert(keys.union(none).count() == 3)
    assert(keys.intersect(none).count() == 0)
    assert(keys.except(none).count() == 3)
  }

  test("curation operators pass an empty corpus through with schema intact") {
    // a stratified filter or a day's delta over documents is routinely
    // empty; the whole curation tier must pass it through — zero rows,
    // schema identical to the populated run, no throw.
    import graft.ops.{Curation, CorpusSignals}
    val docs = Tables.documents(spark, sf)
    val none = docs.filter(lit(false))
    val ops: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] =
      Seq(
        "hashSplit" -> (Curation.hashSplit(_)),
        "seqPack" -> (Curation.seqPack(_)),
        "decontaminate" -> (Curation.decontaminate(_, 97L)),
        "weightedMix" -> (Curation.weightedMix(_)),
        "stratifiedSample" -> (Curation.stratifiedSample(_)),
        "redact" -> (Curation.redact(_)),
        "repetition" -> (CorpusSignals.repetition(_)),
        "dupSubstrings" -> (CorpusSignals.dupSubstrings(_)),
        "tfidfTopK" -> (CorpusSignals.tfidfTopK(_)),
        "lmPerplexity" -> (CorpusSignals.lmPerplexity(_)),
        "chunkDocs" -> (graft.ops.TextAnalysis.chunkDocs(_)))
    for ((name, op) <- ops) {
      val out = op(none)
      assert(out.count() === 0L, s"$name must yield zero rows on an empty corpus")
      assert(out.schema === op(docs).schema,
        s"$name schema must not depend on the data")
    }
  }

  test("XML/VARIANT parsers degrade to null on null or malformed input") {
    // a 100 TB feed WILL contain truncated/garbage documents; the parse
    // step must null them out (to be quarantined downstream), never
    // throw and kill the stage. from_xml (PERMISSIVE default) and
    // try_parse_json null out unparseable rows. The Hive-derived
    // xpath_* family does NOT — it throws on malformed XML (pinned
    // below), so on a dirty feed xpath must ride behind a from_xml
    // validity guard (when() branches evaluate lazily per row).
    import spark.implicits._
    val docs = Seq(
      ("ok", "<doc><id>7</id></doc>", """{"k":7}"""),
      ("truncated", "<doc><id>7", """{"k":7"""),
      ("garbage", "not xml at all", "not json"),
      ("empty", "", ""),
      ("nul", null, null)).toDF("tag", "xml", "js")
    val xid = expr("from_xml(xml, 'id BIGINT')").getField("id")
    val out = docs.select(
      col("tag"),
      xid.as("x_id"),
      when(xid.isNotNull, expr("xpath_long(xml, '/doc/id')")).as("xp_id"),
      expr("variant_get(try_parse_json(js), '$.k', 'bigint')").as("v_k"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
         if (r.isNullAt(2)) None else Some(r.getLong(2)),
         if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(out("ok") === ((Some(7L), Some(7L), Some(7L))))
    for (bad <- Seq("truncated", "garbage", "empty", "nul")) {
      val (x, xp, v) = out(bad)
      assert(x.isEmpty, s"$bad: from_xml should null out")
      assert(xp.isEmpty, s"$bad: guarded xpath should null out")
      assert(v.isEmpty, s"$bad: try_parse_json should null out")
    }
    // unguarded xpath on malformed XML kills the task — the reason the
    // guard above (and q58b's from_xml-first shape) exists.
    val ex = intercept[Exception] {
      docs.select(expr("xpath_long(xml, '/doc/id')")).collect()
    }
    assert(ex.getMessage.contains("/doc/id"), ex.getMessage)
  }
}
