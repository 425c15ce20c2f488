package graft.ops

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): media as opaque `binary`
  * columns + typed metadata, flowing through real Spark schemas and
  * partitioning. The container has no image/audio codecs, so the decode
  * kernel is a clearly-marked deterministic STUB — everything around it
  * (binary columns, metadata structs, batch iteration via mapPartitions,
  * schema of the decoded output) is real and tested.
  *
  * The synthetic payload is derived from the documents table
  * (sha256(normalized text) → 32 bytes) so payload bytes are
  * deterministic and the SQL-expressible parts oracle-check in DuckDB
  * (which, at v1.0, can unhex/octet_length a BLOB but not slice or
  * digest one — those parts run on the hex string in both engines).
  */
object Multimodal extends QueryModule {

  /** Decoded-frame schema produced by [[decodeStub]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", LongType),
    StructField("mean_byte", DoubleType)))

  /** STUB decode kernel — stands in for an image/audio codec. Runs
    * per-partition over the binary payload (the exact shape a JNI or
    * Python-batch decoder plugs into: one iterator in, one iterator out,
    * no driver collect). The "decode" is a deterministic fake: dimensions
    * from the first two payload bytes, "pixel mean" = mean of payload
    * bytes. Replace the body to integrate a real codec.
    */
  def decodeStub(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val rdd = payloads.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val w = (bytes(0) & 0xff) + 1
        val h = (bytes(1) & 0xff) + 1
        val mean = bytes.map(_ & 0xff).sum.toDouble / bytes.length
        Row(id, w, h, w.toLong * h, mean)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** documents + deterministic 32-byte binary payload and its hex twin. */
  def withPayload(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload_hex", sha2(Text.norm(col("text")).cast("binary"), 256))
      .withColumn("payload", unhex(col("payload_hex")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column + typed metadata extraction; magic/width/height come
    // off the hex twin because DuckDB 1.0 cannot slice a BLOB.
    "q72_multimodal_meta" -> ((s, d) =>
      withPayload(s, d)
        .select(
          col("doc_id"),
          length(col("payload")).cast("long").as("payload_len"),
          substring(col("payload_hex"), 1, 4).as("magic"),
          (ascii(substring(col("payload_hex"), 1, 1)) * 2).as("width"),
          (ascii(substring(col("payload_hex"), 2, 1)) * 2).as("height"),
          (ascii(substring(col("payload_hex"), 1, 1)).cast("long") * 2 *
            (ascii(substring(col("payload_hex"), 2, 1)) * 2)).as("n_pixels"),
          struct(
            lit("image/fake").as("mime"),
            length(col("payload")).cast("long").as("n_bytes")).as("meta"))
        .select(col("doc_id"), col("payload_len"), col("magic"),
          col("width"), col("height"), col("n_pixels"),
          col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"))
        .orderBy(col("doc_id"))),

    // audio frame windows: the stub "PCM track" is the 64 hex chars of
    // the payload digest read as samples (ascii - 80, so values are
    // small signed ints). Frames are the classic windowed analysis
    // shape — window 16, hop 8, 7 overlapping frames per doc — with
    // per-frame energy (sum of squares) and peak, all computed inside
    // codegen'd higher-order array functions (no UDF, no shuffle until
    // the final order). A real PCM decoder slots in by replacing the
    // sample expression; the doc × frame fan-out and windowing algebra
    // are what a 100 TB audio pipeline actually exercises.
    "q96_audio_frames" -> ((s, d) =>
      withPayload(s, d)
        .select(col("doc_id"), col("payload_hex"),
          posexplode(sequence(lit(0), lit(6))).as(Seq("pos", "frame_idx")))
        .select(
          col("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          expr("""cast(aggregate(
              transform(sequence(0, 15),
                j -> (ascii(substr(payload_hex, frame_idx*8 + j + 1, 1)) - 80)
                   * (ascii(substr(payload_hex, frame_idx*8 + j + 1, 1)) - 80)),
              0L, (acc, x) -> acc + x) as bigint)""").as("energy"),
          expr("""cast(array_max(
              transform(sequence(0, 15),
                j -> ascii(substr(payload_hex, frame_idx*8 + j + 1, 1)) - 80))
            as bigint)""").as("peak"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // frame sampling plan: every k-th "frame offset" into the payload —
    // the batch shape a video pipeline fans out on (doc × frame rows).
    "q73_multimodal_frames" -> ((s, d) =>
      withPayload(s, d)
        .select(col("doc_id"),
          posexplode(sequence(lit(0L), lit(28L), lit(7L)))
            .as(Seq("frame_idx", "byte_offset")))
        .withColumn("frame_tag",
          concat_ws(":", col("doc_id"), col("frame_idx")))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("byte_offset"), col("frame_tag"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // ViT-style 2D patch grid — the image analogue of q96's 1D audio
    // frames: the 64-hex digest read as an 8×8 sample "image", cut
    // into four 4×4 patches (2×2 grid), per-patch sum/min/max/mean
    // over the 16 cells via codegen'd HOFs with explicit 2D index
    // arithmetic (y = py·4 + j÷4, x = px·4 + j mod 4 — exactly the
    // gather a real patch-embedding kernel does over decoded pixels;
    // a codec slots in by replacing the sample expression). Zero
    // shuffles: the doc × patch fan-out folds back in-stage and only
    // the presentation sort exchanges. Exact integer stats, one
    // division for the mean.
    "q259_image_patches" -> ((s, d) =>
      withPayload(s, d)
        .select(col("doc_id"), col("payload_hex"),
          posexplode(sequence(lit(0), lit(3)))
            .as(Seq("pos", "patch_idx")))
        .select(col("doc_id"),
          col("patch_idx").cast("long").as("patch_idx"),
          (col("patch_idx") % 2).cast("long").as("px"),
          expr("CAST(patch_idx DIV 2 AS BIGINT)").as("py"),
          expr("""cast(aggregate(transform(sequence(0, 15),
              j -> ascii(substr(payload_hex,
                ((patch_idx DIV 2) * 4 + j DIV 4) * 8
                  + (patch_idx % 2) * 4 + (j % 4) + 1, 1))),
            0L, (acc, x) -> acc + x) as bigint)""").as("byte_sum"),
          expr("""cast(array_min(transform(sequence(0, 15),
              j -> ascii(substr(payload_hex,
                ((patch_idx DIV 2) * 4 + j DIV 4) * 8
                  + (patch_idx % 2) * 4 + (j % 4) + 1, 1))))
            as bigint)""").as("byte_min"),
          expr("""cast(array_max(transform(sequence(0, 15),
              j -> ascii(substr(payload_hex,
                ((patch_idx DIV 2) * 4 + j DIV 4) * 8
                  + (patch_idx % 2) * 4 + (j % 4) + 1, 1))))
            as bigint)""").as("byte_max"))
        .withColumn("byte_mean",
          col("byte_sum").cast("double") / 16.0)
        .orderBy(col("doc_id"), col("patch_idx")))
  )

  def oracle: Map[String, String] = Map(
    "q259_image_patches" ->
      """WITH p AS (SELECT doc_id,
        |    sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        |      AS hex
        |  FROM documents)
        |SELECT doc_id, CAST(g.i AS BIGINT) AS patch_idx,
        |  CAST(g.i % 2 AS BIGINT) AS px,
        |  CAST(g.i // 2 AS BIGINT) AS py,
        |  CAST(sum(ascii(substr(hex,
        |      ((g.i // 2) * 4 + j.j // 4) * 8
        |        + (g.i % 2) * 4 + (j.j % 4) + 1, 1))) AS BIGINT)
        |    AS byte_sum,
        |  CAST(min(ascii(substr(hex,
        |      ((g.i // 2) * 4 + j.j // 4) * 8
        |        + (g.i % 2) * 4 + (j.j % 4) + 1, 1))) AS BIGINT)
        |    AS byte_min,
        |  CAST(max(ascii(substr(hex,
        |      ((g.i // 2) * 4 + j.j // 4) * 8
        |        + (g.i % 2) * 4 + (j.j % 4) + 1, 1))) AS BIGINT)
        |    AS byte_max,
        |  CAST(sum(ascii(substr(hex,
        |      ((g.i // 2) * 4 + j.j // 4) * 8
        |        + (g.i % 2) * 4 + (j.j % 4) + 1, 1))) AS DOUBLE) / 16.0
        |    AS byte_mean
        |FROM p, range(0, 4) g(i), range(0, 16) j(j)
        |GROUP BY doc_id, g.i ORDER BY doc_id, patch_idx""".stripMargin,

    "q72_multimodal_meta" ->
      """WITH p AS (SELECT doc_id,
        |    sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS payload_hex
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(octet_length(unhex(payload_hex)) AS BIGINT) AS payload_len,
        |  substr(payload_hex, 1, 4) AS magic,
        |  ascii(substr(payload_hex, 1, 1)) * 2 AS width,
        |  ascii(substr(payload_hex, 2, 1)) * 2 AS height,
        |  CAST(ascii(substr(payload_hex, 1, 1)) AS BIGINT) * 2
        |    * (ascii(substr(payload_hex, 2, 1)) * 2) AS n_pixels,
        |  'image/fake' AS mime,
        |  CAST(octet_length(unhex(payload_hex)) AS BIGINT) AS n_bytes
        |FROM p ORDER BY doc_id""".stripMargin,

    "q96_audio_frames" ->
      """WITH p AS (SELECT doc_id,
        |    sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS hex
        |  FROM documents)
        |SELECT doc_id, CAST(f.frame_idx AS BIGINT) AS frame_idx,
        |  CAST(sum((ascii(substr(hex, f.frame_idx*8 + j.j + 1, 1)) - 80)
        |         * (ascii(substr(hex, f.frame_idx*8 + j.j + 1, 1)) - 80))
        |    AS BIGINT) AS energy,
        |  CAST(max(ascii(substr(hex, f.frame_idx*8 + j.j + 1, 1)) - 80)
        |    AS BIGINT) AS peak
        |FROM p, range(0,7) f(frame_idx), range(0,16) j(j)
        |GROUP BY doc_id, f.frame_idx ORDER BY doc_id, frame_idx""".stripMargin,

    "q73_multimodal_frames" ->
      """SELECT doc_id,
        |  CAST(g.i AS BIGINT) AS frame_idx,
        |  g.i * 7 AS byte_offset,
        |  doc_id || ':' || g.i AS frame_tag
        |FROM documents, (SELECT unnest(range(0, 5)) AS i) g
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
