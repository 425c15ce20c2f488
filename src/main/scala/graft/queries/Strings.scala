package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** String / regex / hash / encode / JSON scalar functions (SURVEY.md §2.9).
  * Reference-implemented: lower, ltrim, rtrim, trim, upper, substring
  * (0-based there, 1-based here — we pin Spark semantics per §7.3).
  * Declared stubs covered: concat, concat_ws, initcap, instr/locate,
  * lpad/rpad, repeat, reverse, translate, replace, levenshtein,
  * substring_index, split, regexp_extract, regexp_replace, md5, sha1,
  * sha2, crc32, hash, base64/unbase64, hex/unhex, get_json_object,
  * from_json, to_json, soundex, format_number.
  *
  * Murmur3 hash / xxhash64 / crc32 / sha1 / soundex / format_number have
  * no DuckDB equivalent → grouped in q56 (rows-only check); everything
  * else is oracle-verified.
  */
object Strings extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_string" -> ((s, d) =>
      Tables.part(s, d)
        .withColumn("padded", concat(lit("  "), col("p_name"), lit("  ")))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("s_upper"),
          lower(col("p_type")).as("s_lower"),
          trim(col("padded")).as("s_trim"),
          ltrim(col("padded")).as("s_ltrim"),
          rtrim(col("padded")).as("s_rtrim"),
          trim(col("p_brand"), "Brand#").as("s_trimchars"),
          substring(col("p_name"), 2, 3).as("s_substr"),
          length(col("p_name")).as("s_len"),
          concat(col("p_brand"), lit(":"), col("p_name")).as("s_concat"),
          concat_ws("-", col("p_brand"), col("p_type"), col("p_name")).as("s_concat_ws"),
          lpad(col("p_brand"), 12, "*").as("s_lpad"),
          rpad(col("p_brand"), 12, "*").as("s_rpad"),
          reverse(col("p_name")).as("s_reverse"),
          repeat(col("p_brand"), 2).as("s_repeat"),
          translate(col("p_name"), "aeiou", "AEIOU").as("s_translate"),
          regexp_replace(col("p_name"), lit("widget"), lit("gadget")).as("s_replace"),
          instr(col("p_name"), "widget").as("s_instr"),
          substring(col("p_name"), 1, 4).as("s_left"),
          substring(col("p_name"), -4, 4).as("s_right"),
          ascii(col("p_name")).as("s_ascii"),
          chr(ascii(col("p_name")) + 1).as("s_chr"),
          initcap(col("p_name")).as("s_initcap"),
          substring_index(col("p_name"), " ", 1).as("s_substr_idx"),
          levenshtein(col("p_brand"), lit("Brand#13")).as("s_leven"),
          col("p_name").startsWith("cold").as("s_starts"),
          col("p_name").endsWith("bolt").as("s_ends"),
          col("p_name").contains("wid").as("s_contains"))
        .orderBy(col("p_partkey"))),

    // base-conversion and formatting stragglers from the §2.9 stub
    // catalogue (conv, format_number, format_string, overlay, elt,
    // find_in_set, space, positional locate). DuckDB has no conv /
    // format_number / find_in_set — the oracle composes them from
    // to_hex/bin, printf + thousand-grouped format, and list_position.
    "q52b_string_fmt" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          conv(col("p_partkey").cast("string"), 10, 16).as("f_conv16"),
          conv(col("p_partkey").cast("string"), 10, 2).as("f_conv2"),
          conv(conv(col("p_partkey").cast("string"), 10, 16), 16, 10).as("f_conv_rt"),
          format_number(col("p_partkey") * 1000.5, 2).as("f_fmtnum"),
          format_string("%s/%04d", col("p_brand"), col("p_partkey")).as("f_printf"),
          overlay(col("p_name"), lit("XX"), lit(2), lit(3)).as("f_overlay"),
          substring_index(col("p_name"), " ", -1).as("f_sidx_neg"),
          concat(lit("a"), expr("space(3)"), lit("b")).as("f_space"),
          elt(pmod(col("p_partkey"), lit(2L)) + 1, lit("first"), lit("second"))
            .as("f_elt"),
          expr("find_in_set(p_type, 'ECONOMY,SMALL,STANDARD')").as("f_find"),
          locate("e", col("p_name"), 3).as("f_locate3"))
        .orderBy(col("p_partkey"))),

    // last §2.9 stragglers: split_part, str_to_map (emitted as sorted
    // entries), mask (default X/x/n classes), the length triple, btrim.
    "q52c_string_more" -> ((s, d) =>
      Tables.part(s, d)
        .withColumn("kv",
          concat(lit("size:"), col("p_size").cast("string"),
            lit(",key:"), col("p_partkey").cast("string")))
        .select(
          col("p_partkey"),
          expr("split_part(p_name, ' ', 2)").as("m_split_part"),
          array_join(array_sort(transform(
            map_entries(expr("str_to_map(kv, ',', ':')")),
            e => concat_ws("=", e.getField("key"), e.getField("value")))), "|")
            .as("m_strmap"),
          expr("mask(p_brand)").as("m_mask"),
          char_length(col("p_name")).as("m_chars"),
          octet_length(col("p_name")).as("m_octets"),
          bit_length(col("p_name")).as("m_bits"),
          expr("btrim(p_brand, 'B#0123456789')").as("m_btrim"))
        .orderBy(col("p_partkey"))),

    // URL function family over URLs CONSTRUCTED from columns, so the
    // oracle emits the components directly instead of re-parsing;
    // url_encode is exercised on a space-bearing value (the only
    // non-identity charset in this corpus → '+').
    "q52d_url" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("url", concat(lit("https://docs.example.com/"),
          col("lang"), lit("/"), col("doc_id"),
          lit("?src="), col("source")))
        .withColumn("raw", concat(col("source"), lit(" "), col("lang")))
        .select(
          col("doc_id"),
          expr("parse_url(url, 'HOST')").as("u_host"),
          expr("parse_url(url, 'PATH')").as("u_path"),
          expr("parse_url(url, 'QUERY')").as("u_query"),
          expr("parse_url(url, 'QUERY', 'src')").as("u_src"),
          expr("parse_url(url, 'PROTOCOL')").as("u_proto"),
          expr("url_encode(raw)").as("u_enc"),
          expr("url_decode(url_encode(raw))").as("u_roundtrip"))
        .orderBy(col("doc_id"))),

    "q53_regex" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("r_extract"),
          regexp_extract(col("p_brand"), "(\\d+)", 1).as("r_digits"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("r_replace"),
          col("p_name").rlike("^[cs]").as("r_rlike"),
          // arrays are serialized to '|'-joined strings: the driver's
          // pandas comparator cannot hash ndarray cells.
          array_join(regexp_extract_all(col("p_brand"), lit("\\d"), lit(0)), "|").as("r_all"),
          array_join(split(col("p_name"), " "), "|").as("r_split"),
          // get(), not getItem: a '#'-less brand has no element 1 and
          // getItem ANSI-throws INVALID_ARRAY_INDEX (degenerate probe)
          expr("get(split(p_brand, '#'), 1)").as("r_split_item"))
        .orderBy(col("p_partkey"))),

    "q55_hash_encode" -> ((s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          md5(col("c_name").cast("binary")).as("h_md5"),
          sha2(col("c_name").cast("binary"), 256).as("h_sha256"),
          hex(col("c_name")).as("h_hex"),
          unhex(hex(col("c_name"))).cast("string").as("h_unhex_rt"),
          base64(col("c_name").cast("binary")).as("h_b64"),
          unbase64(base64(col("c_name").cast("binary"))).cast("string").as("h_b64_rt"),
          bin(col("c_custkey")).as("h_bin"))
        .orderBy(col("c_custkey"))),

    // Spark-specific digests/formatters (murmur3 seed-42, xxhash64,
    // crc32, sha1, soundex, format_*) — DuckDB 1.0 implements none of
    // them, so raw values cannot cross engines. SELF-VERIFYING (the
    // q39/q63 recipe): every digest is still computed, then folded
    // into a structural property both engines CAN agree on — range /
    // hex-shape / soundex-shape predicates and exact or tolerance
    // round-trips through the formatters — so the oracle emits
    // constants and a green row proves each function ran per-row and
    // produced well-formed output. Raw digest values are pinned
    // against published/captured constants in SketchSpec, so a digest
    // regression cannot hide behind the booleans.
    "q56_hash_sketch" -> ((s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"),
          hash(col("c_name")).as("h_murmur3"),
          xxhash64(col("c_name")).as("h_xx64"),
          crc32(col("c_name").cast("binary")).as("h_crc32"),
          sha1(col("c_name").cast("binary")).as("h_sha1"),
          soundex(col("c_mktsegment")).as("h_soundex"),
          format_number(col("c_acctbal"), 2).as("h_fmtnum"),
          format_string("cust-%d:%s", col("c_custkey"), col("c_mktsegment")).as("h_fmtstr"))
        .select(
          col("c_custkey"),
          (col("h_murmur3").isNotNull && col("h_xx64").isNotNull)
            .as("digests_defined"),
          col("h_crc32").between(0L, 4294967295L).as("crc32_in_range"),
          col("h_sha1").rlike("^[0-9a-f]{40}$").as("sha1_hex40"),
          col("h_soundex").rlike("^[A-Z][0-9]{3}$").as("soundex_shape"),
          // c_acctbal is cents-valued, so the 2-decimal format is a
          // near-exact round-trip; 0.0051 absorbs the formatter's
          // HALF_EVEN boundary plus double-repr dust.
          (abs(regexp_replace(col("h_fmtnum"), ",", "").cast("double")
            - col("c_acctbal")) <= 0.0051).as("fmtnum_roundtrip"),
          (col("h_fmtstr") === concat(lit("cust-"),
            col("c_custkey").cast("string"), lit(":"), col("c_mktsegment")))
            .as("fmtstr_exact"))
        .orderBy(col("c_custkey"))),

    "q58_json" -> ((s, d) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("j_k"),
          from_json(col("props"), schema).getField("k").as("j_k2"),
          to_json(struct(col("event_id").as("id"))).as("j_obj"),
          isnotnull(get_json_object(col("props"), "$.missing")).as("j_missing"))
        .orderBy(col("event_id"))
    }),

    // XML parsing (from_xml/xpath, Spark 4): documents CONSTRUCTED from
    // columns so the oracle emits the fields directly — the pattern for
    // feeds that land as XML at ingest.
    // from_xml is parsed ONCE into a struct column and fields are
    // extracted via getField — XmlToStructs is non-codegen (no
    // subexpression elimination), so repeating the call would re-parse
    // the DOM per reference. One xpath call stays for API coverage.
    // CollapseProject keeps the multiply-referenced alias un-inlined
    // because from_xml is not a cheap expression (guarded in
    // PlanShapeSpec: exactly one from_xml in the optimized plan).
    "q58b_xml" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("xml", concat(
          lit("<doc><id>"), col("doc_id"), lit("</id><lang>"), col("lang"),
          lit("</lang><n>"), col("n_chars"), lit("</n></doc>")))
        .withColumn("x", expr("from_xml(xml, 'id BIGINT, lang STRING, n BIGINT')"))
        .select(
          col("doc_id"),
          col("x").getField("lang").as("x_lang"),
          col("x").getField("n").as("x_n"),
          expr("xpath_string(xml, '/doc/lang')").as("x_xpath"),
          col("x").getField("id").as("x_id"))
        .orderBy(col("doc_id"))),

    // VARIANT (Spark 4 semi-structured type): parse_json → typed
    // variant_get extraction — schema-on-read without a declared
    // struct, the open-schema column shape for heterogeneous metadata
    // at 100 TB. Constructed input, so the oracle emits fields.
    "q58c_variant" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("vj", concat(
          lit("{\"lang\":\""), col("lang"), lit("\",\"n\":"), col("n_chars"),
          lit(",\"nested\":{\"src\":\""), col("source"), lit("\"}}")))
        .select(
          col("doc_id"),
          expr("variant_get(parse_json(vj), '$.lang', 'string')").as("v_lang"),
          expr("variant_get(parse_json(vj), '$.n', 'bigint')").as("v_n"),
          expr("variant_get(parse_json(vj), '$.nested.src', 'string')")
            .as("v_src"),
          expr("variant_get(parse_json(vj), '$.absent', 'string')").as("v_absent"))
        .orderBy(col("doc_id")))
  )

  def oracle: Map[String, String] = Map(
    "q58b_xml" ->
      """SELECT doc_id,
        |  lang AS x_lang,
        |  n_chars AS x_n,
        |  lang AS x_xpath,
        |  doc_id AS x_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q58c_variant" ->
      """SELECT doc_id,
        |  lang AS v_lang,
        |  n_chars AS v_n,
        |  source AS v_src,
        |  CAST(NULL AS VARCHAR) AS v_absent
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q52d_url" ->
      """SELECT doc_id,
        |  'docs.example.com' AS u_host,
        |  '/' || lang || '/' || doc_id AS u_path,
        |  'src=' || source AS u_query,
        |  source AS u_src,
        |  'https' AS u_proto,
        |  replace(source || ' ' || lang, ' ', '+') AS u_enc,
        |  source || ' ' || lang AS u_roundtrip
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q52_string" ->
      """SELECT p_partkey,
        |  upper(p_name) AS s_upper,
        |  lower(p_type) AS s_lower,
        |  trim(padded) AS s_trim,
        |  ltrim(padded) AS s_ltrim,
        |  rtrim(padded) AS s_rtrim,
        |  trim(p_brand, 'Brand#') AS s_trimchars,
        |  substring(p_name, 2, 3) AS s_substr,
        |  length(p_name) AS s_len,
        |  p_brand || ':' || p_name AS s_concat,
        |  concat_ws('-', p_brand, p_type, p_name) AS s_concat_ws,
        |  lpad(p_brand, 12, '*') AS s_lpad,
        |  rpad(p_brand, 12, '*') AS s_rpad,
        |  reverse(p_name) AS s_reverse,
        |  repeat(p_brand, 2) AS s_repeat,
        |  translate(p_name, 'aeiou', 'AEIOU') AS s_translate,
        |  regexp_replace(p_name, 'widget', 'gadget', 'g') AS s_replace,
        |  strpos(p_name, 'widget') AS s_instr,
        |  p_name[1:4] AS s_left,
        |  CASE WHEN length(p_name) >= 4
        |    THEN p_name[-4:] ELSE p_name END AS s_right,
        |  ascii(p_name) AS s_ascii,
        |  chr(ascii(p_name) + 1) AS s_chr,
        |  array_to_string(list_transform(str_split(p_name, ' '),
        |    w -> upper(w[1:1]) || w[2:]), ' ') AS s_initcap,
        |  split_part(p_name, ' ', 1) AS s_substr_idx,
        |  levenshtein(p_brand, 'Brand#13') AS s_leven,
        |  starts_with(p_name, 'cold') AS s_starts,
        |  ends_with(p_name, 'bolt') AS s_ends,
        |  contains(p_name, 'wid') AS s_contains
        |FROM (SELECT *, '  ' || p_name || '  ' AS padded FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "q52b_string_fmt" ->
      """SELECT p_partkey,
        |  to_hex(p_partkey) AS f_conv16,
        |  bin(p_partkey) AS f_conv2,
        |  CAST(p_partkey AS VARCHAR) AS f_conv_rt,
        |  format('{:,}', CAST(split_part(printf('%.2f', p_partkey * 1000.5), '.', 1)
        |      AS BIGINT)) || '.'
        |    || split_part(printf('%.2f', p_partkey * 1000.5), '.', 2) AS f_fmtnum,
        |  printf('%s/%04d', p_brand, p_partkey) AS f_printf,
        |  substr(p_name, 1, 1) || 'XX' || substr(p_name, 5) AS f_overlay,
        |  str_split(p_name, ' ')[-1] AS f_sidx_neg,
        |  'a' || repeat(' ', 3) || 'b' AS f_space,
        |  CASE WHEN p_partkey % 2 = 0 THEN 'first' ELSE 'second' END AS f_elt,
        |  CAST(list_position(str_split('ECONOMY,SMALL,STANDARD', ','), p_type)
        |    AS INT) AS f_find,
        |  CAST(CASE WHEN strpos(substr(p_name, 3), 'e') = 0 THEN 0
        |       ELSE strpos(substr(p_name, 3), 'e') + 2 END AS INT) AS f_locate3
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q52c_string_more" ->
      """SELECT p_partkey,
        |  split_part(p_name, ' ', 2) AS m_split_part,
        |  array_to_string(list_sort(
        |    ['key=' || CAST(p_partkey AS VARCHAR),
        |     'size=' || CAST(p_size AS VARCHAR)]), '|') AS m_strmap,
        |  regexp_replace(regexp_replace(regexp_replace(p_brand,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS m_mask,
        |  CAST(length(p_name) AS INT) AS m_chars,
        |  CAST(strlen(p_name) AS INT) AS m_octets,
        |  CAST(bit_length(p_name) AS INT) AS m_bits,
        |  trim(p_brand, 'B#0123456789') AS m_btrim
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q53_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS r_extract,
        |  regexp_extract(p_brand, '(\d+)', 1) AS r_digits,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS r_replace,
        |  regexp_matches(p_name, '^[cs]') AS r_rlike,
        |  coalesce(array_to_string(regexp_extract_all(p_brand, '\d'), '|'), '') AS r_all,
        |  coalesce(array_to_string(str_split(p_name, ' '), '|'), '') AS r_split,
        |  split_part(p_brand, '#', 2) AS r_split_item
        |FROM part ORDER BY p_partkey""".stripMargin,

    // the digest estimates are folded into structural booleans on the
    // Spark side (none of these functions exist in DuckDB 1.0), so the
    // exact engine's answer is all-TRUE per customer row.
    "q56_hash_sketch" ->
      """SELECT c_custkey,
        |  TRUE AS digests_defined,
        |  TRUE AS crc32_in_range,
        |  TRUE AS sha1_hex40,
        |  TRUE AS soundex_shape,
        |  TRUE AS fmtnum_roundtrip,
        |  TRUE AS fmtstr_exact
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q55_hash_encode" ->
      """SELECT c_custkey,
        |  md5(c_name) AS h_md5,
        |  sha256(c_name) AS h_sha256,
        |  hex(c_name) AS h_hex,
        |  decode(unhex(hex(c_name))) AS h_unhex_rt,
        |  to_base64(encode(c_name)) AS h_b64,
        |  decode(from_base64(to_base64(encode(c_name)))) AS h_b64_rt,
        |  bin(c_custkey) AS h_bin
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q58_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS j_k,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS j_k2,
        |  CAST(to_json({'id': event_id}) AS VARCHAR) AS j_obj,
        |  json_extract_string(props, '$.missing') IS NOT NULL AS j_missing
        |FROM events ORDER BY event_id""".stripMargin
  )
}
