package graft

import graft.sources.{ArrowIpcSource, Jdbc, RangeSource}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural tests for the IO layer: JDBC option/partition plumbing
  * (no database exists in the sandbox — predicates and options are
  * pinned exactly) and the DataSource V2 range connector (partition
  * fan-out + column pruning reach the physical scan).
  */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("maxPartitionBytes governs scan split count (the 100 TB parallelism knob)") {
    // one parquet file still splits into many input partitions when
    // maxPartitionBytes shrinks — this is what sizes scan tasks to
    // executor memory at real scale (brief: "size maxPartitionBytes so
    // partitions fit in executor memory").
    val conf = spark.conf
    val key = "spark.sql.files.maxPartitionBytes"
    val saved = conf.getOption(key)
    def scanPartitions(): Int =
      Tables.lineitem(spark, sf).rdd.getNumPartitions
    try {
      conf.set(key, "128MB")
      val coarse = scanPartitions()
      conf.set(key, "16KB")
      val fine = scanPartitions()
      assert(fine > coarse,
        s"16KB split should yield more scan partitions ($fine vs $coarse)")
      conf.set(key, "16KB")
      assert(Tables.lineitem(spark, sf).count() ==
        { conf.set(key, "128MB"); Tables.lineitem(spark, sf).count() },
        "split granularity must not change results")
    } finally saved.fold(conf.unset(key))(conf.set(key, _))
  }

  test("z-order layout co-locates a 2-D box into fewer files than arrival order") {
    // q114's oracle proves the rewrite is lossless; this proves the
    // POINT of the rewrite — per-file (min,max) rectangles on BOTH
    // columns shrink, so a box predicate touches a strict subset of
    // files, where the arrival layout's every file spans the box. At
    // 100 TB the same footprints drive parquet row-group/file skipping.
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_returnflag"))
    val zdir = s"target/tmp/io/spec/zorder_z"
    val adir = s"target/tmp/io/spec/zorder_arrival"
    graft.sources.IOQueries.zordered(li, "l_orderkey", "l_partkey", 8)
      .write.mode("overwrite").parquet(zdir)
    // arrival order: round-robin over 8 files, each spanning ~the full
    // range of both keys (what un-curated ingest produces).
    li.repartition(8).write.mode("overwrite").parquet(adir)

    // sf0.001 box: ~10% of each dimension => ~1% of the z-plane.
    val (okLo, okHi, pkLo, pkHi) = (1L, 600L, 1L, 20L)
    def filesOverlappingBox(dir: String): (Long, Long) = {
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_orderkey").as("okMin"), max("l_orderkey").as("okMax"),
          min("l_partkey").as("pkMin"), max("l_partkey").as("pkMax"))
      val hit = perFile.filter(col("okMin") <= okHi && col("okMax") >= okLo
        && col("pkMin") <= pkHi && col("pkMax") >= pkLo).count()
      (hit, perFile.count())
    }
    val (zHit, zTotal) = filesOverlappingBox(zdir)
    val (aHit, aTotal) = filesOverlappingBox(adir)
    assert(aHit === aTotal,
      s"arrival layout should be unprunable for the box ($aHit of $aTotal)")
    assert(zHit < aHit,
      s"z-order must touch strictly fewer files ($zHit of $zTotal vs $aHit)")
    assert(spark.read.parquet(zdir).count() === li.count(),
      "layout rewrite must be lossless")
  }

  test("q116 bucketed join plans ZERO exchanges on the join inputs") {
    // the POINT of bucketing: the write pays the shuffle once, every
    // later join on the bucket key reads co-located buckets. Broadcast
    // is disabled so the planner can't sidestep the question — the
    // surviving join must be exchange-free on both scan sides.
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      keys.foreach(conf.set(_, "-1"))
      // run once so the bucketed tables exist in the session catalog.
      SparkEntry.queries("q116_bucketed_join")(spark, sf).collect()
      val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
      val j = spark.table(s"q116_orders_$tag")
        .join(spark.table(s"q116_cust_$tag"),
          col("o_custkey") === col("c_custkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"both scans should report a bucketed read:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q117 writes parquet bloom filters on doc_id and only doc_id") {
    SparkEntry.queries("q117_bloom_layout")(spark, sf).collect()
    val dir = new java.io.File(
      s"target/tmp/io/${sf.replaceAll("[^A-Za-z0-9.]", "_")}/bloom")
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty, s"no parquet files under $dir")
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val hconf = spark.sessionState.newHadoopConf()
    parts.foreach { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), hconf)
      val reader = ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.foreach { block =>
          block.getColumns.asScala.foreach { cc =>
            val col0 = cc.getPath.toDotString
            if (col0 == "doc_id")
              assert(cc.getBloomFilterOffset >= 0,
                s"doc_id chunk in ${f.getName} lacks a bloom filter")
            else
              assert(cc.getBloomFilterOffset < 0,
                s"$col0 in ${f.getName} should not carry a bloom filter")
          }
        }
      } finally reader.close()
    }
  }

  test("q118 compaction: 64 fragment files in, few capped files out") {
    SparkEntry.queries("q118_compaction")(spark, sf).collect()
    val base = s"target/tmp/io/${sf.replaceAll("[^A-Za-z0-9.]", "_")}"
    def files(name: String) =
      Option(new java.io.File(s"$base/$name").listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
    assert(files("frag").length === 64,
      "fragmented input should be one file per shard")
    val out = files("compact")
    assert(out.nonEmpty && out.length <= 8,
      s"rebalance should coalesce 64 shards to a few files, got ${out.length}")
    // the per-file row cap must hold on every output file.
    val perFile = spark.read.parquet(s"$base/compact")
      .groupBy(input_file_name()).count().collect()
    assert(perFile.forall(_.getLong(1) <= 2000L),
      "maxRecordsPerFile cap breached")
    assert(perFile.map(_.getLong(1)).sum ===
      Tables.documents(spark, sf).count())
  }

  test("q124 merged read unifies two genuinely different file schemas") {
    SparkEntry.queries("q124_schema_evolution")(spark, sf).collect()
    val dir = s"target/tmp/io/${sf.replaceAll("[^A-Za-z0-9.]", "_")}/evolve"
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ===
      Set("doc_id", "lang", "generation", "n_chars"))
    // the evolution is real: generation-1 files physically lack the
    // n_chars column; generation-2 files carry it.
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
    val (withCol, withoutCol) = files.partition(f =>
      spark.read.parquet(f.getAbsolutePath).columns.contains("n_chars"))
    assert(withCol.nonEmpty && withoutCol.nonEmpty,
      s"expected both schema generations on disk, got " +
        s"${withCol.length} with / ${withoutCol.length} without")
    // NULL-fill semantics: no generation-1 row acquires a value.
    assert(merged.filter(col("generation") === 1L
      && col("n_chars").isNotNull).count() === 0L)
  }

  test("jdbc partition predicates tile the range with NULL absorption") {
    val p = Jdbc.PartitionSpec("id", 0L, 100L, 4)
    assert(Jdbc.partitionPredicates(p) === Seq(
      "id < 25 OR id IS NULL",
      "id >= 25 AND id < 50",
      "id >= 50 AND id < 75",
      "id >= 75"))
    // single partition: full scan, no predicate games.
    assert(Jdbc.partitionPredicates(Jdbc.PartitionSpec("id", 0, 10, 1)) === Seq("1=1"))
    // more partitions than values: clamps to the value range.
    assert(Jdbc.partitionPredicates(Jdbc.PartitionSpec("id", 0, 3, 8)).size === 3)
    // clamped all the way to ONE partition must also be the full scan —
    // a ranged first clause here would silently drop rows >= lo+stride.
    assert(Jdbc.partitionPredicates(Jdbc.PartitionSpec("id", 0, 1, 4)) === Seq("1=1"))
  }

  test("jdbc reader options carry table/query and partitioning through") {
    val opts = Jdbc.readerOptions(
      "jdbc:postgresql://db:5432/x", Left("public.t"), "u", "pw",
      Some(Jdbc.PartitionSpec("id", 1, 1000001, 32)))
    assert(opts("dbtable") === "public.t")
    assert(opts("partitionColumn") === "id")
    assert(opts("lowerBound") === "1")
    assert(opts("upperBound") === "1000001")
    assert(opts("numPartitions") === "32")
    val q = Jdbc.readerOptions("jdbc:postgresql://db/x",
      Right("SELECT a FROM t WHERE b > 0"), "u", "pw")
    assert(q("query").startsWith("SELECT"))
    assertThrows[IllegalArgumentException] {
      Jdbc.readerOptions("jdbc:x", Right("SELECT 1"), "u", "pw",
        Some(Jdbc.PartitionSpec("id", 0, 10, 2)))
    }
  }

  test("q84 read-back plan prunes partitions on the partition column") {
    // run once so the partitioned layout exists, then inspect the scan.
    val df = SparkEntry.queries("q84_partitioned_write")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"expected partition pruning in:\n$plan")
  }

  test("range source: values, partition fan-out, column pruning") {
    val df = spark.read.format("graft.sources.RangeSource")
      .option("rows", "1000").option("slices", "8").load()
    assert(df.schema === RangeSource.fullSchema)
    assert(df.count() === 1000)
    assert(df.rdd.getNumPartitions === 8)
    val r = df.filter(col("id") === 123).collect().head
    assert(r.getLong(0) === 123L)
    assert(r.getInt(1) === (123 % 97))
    assert(r.getString(2) === "r123")
    // pruning: the physical BatchScan's output is just the id column.
    val plan = df.select(sum(col("id"))).queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan graft_range(1000)[id#"),
      s"expected pruned BatchScan output in:\n$plan")
  }

  test("range source columnar path: batches, ColumnarToRow boundary, parity") {
    def read(columnar: Boolean) = spark.read.format("graft.sources.RangeSource")
      .option("rows", "10000").option("slices", "3")
      .option("columnar", columnar.toString).load()
    val col_ = read(columnar = true)
    val row_ = read(columnar = false)
    assert(col_.orderBy("id").collect().toSeq === row_.orderBy("id").collect().toSeq)
    val agg = col_.agg(sum(col("id")))
    assert(agg.collect().head.getLong(0) === (0L until 10000L).sum)
    // AQE-final plan: the vectorized scan feeds a ColumnarToRow boundary
    // and column pruning reaches the columnar factory.
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"columnar scan should feed a ColumnarToRow boundary:\n$plan")
    assert(plan.contains("BatchScan graft_range(10000)[id#"),
      s"expected pruned columnar BatchScan in:\n$plan")
  }

  test("mem sink: overwrite truncates, append accumulates, read-back matches") {
    import spark.implicits._
    graft.sources.MemStore.drop("spec_t")
    def write(rows: Seq[(Long, String)], mode: String): Unit =
      rows.toDF("k", "v").write.format("graft.sources.MemTableSource")
        .option("name", "spec_t").mode(mode).save()
    def readBack() = spark.read.format("graft.sources.MemTableSource")
      .option("name", "spec_t").load()

    write(Seq((1L, "a"), (2L, "b")), "overwrite")
    assert(readBack().orderBy("k").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b")))
    write(Seq((3L, "c")), "append")
    assert(readBack().count() === 3)
    write(Seq((9L, "z")), "overwrite")
    assert(readBack().as[(Long, String)].collect().toSeq === Seq((9L, "z")))
    graft.sources.MemStore.drop("spec_t")
  }

  test("mem sink survives multi-partition writes and prunes columns on read") {
    import spark.implicits._
    graft.sources.MemStore.drop("spec_big")
    spark.range(0, 10000, 1, 8)
      .select(col("id"), (col("id") % 7).as("m"), concat(lit("s"), col("id")).as("s"))
      .write.format("graft.sources.MemTableSource")
      .option("name", "spec_big").mode("overwrite").save()
    val back = spark.read.format("graft.sources.MemTableSource")
      .option("name", "spec_big").option("slices", "6").load()
    assert(back.count() === 10000)
    assert(back.rdd.getNumPartitions === 6)
    assert(back.agg(sum("id")).as[Long].head() === (0L until 10000L).sum)
    val plan = back.select(sum(col("m"))).queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan graft_mem(spec_big)[m#"),
      s"expected pruned BatchScan output in:\n$plan")
    graft.sources.MemStore.drop("spec_big")
  }

  test("range source pushes id-range filters and limit into the scan") {
    def load() = spark.read.format("graft.sources.RangeSource")
      .option("rows", "20000").option("slices", "8").load()

    // conjunct range predicates narrow the generated interval at plan
    // time: the scan description carries the residual-free range and the
    // plan needs no Filter re-check for the pushed conjuncts.
    val ranged = load().filter(col("id") >= 19990L && col("id") < 19995L)
    val rplan = ranged.queryExecution.executedPlan.toString
    assert(rplan.contains("graft_range[19990,19995)"),
      s"expected narrowed scan range in:\n$rplan")
    assert(ranged.count() === 5)
    assert(ranged.agg(min("id"), max("id")).collect().head.toSeq
      === Seq(19990L, 19994L))

    // a pushed limit caps the interval; Spark keeps the global limit
    // (partial push), so the result is still exactly n rows.
    val limited = load().limit(7)
    val lplan = limited.queryExecution.executedPlan.toString
    assert(lplan.contains("graft_range[0,7)"),
      s"expected limit-capped scan range in:\n$lplan")
    assert(limited.count() === 7)

    // non-range predicates stay post-scan and still evaluate correctly.
    val residual = load().filter(pmod(col("id"), lit(7L)) === 0)
    assert(residual.queryExecution.executedPlan.toString.contains("graft_range[0,20000)"))
    assert(residual.count() === 2858)

    // pushdown composes with the columnar read path.
    val colRanged = spark.read.format("graft.sources.RangeSource")
      .option("rows", "20000").option("slices", "8").option("columnar", "true")
      .load().filter(col("id") >= 100L).limit(5)
    assert(colRanged.collect().map(_.getLong(0)).toSeq === (100L to 104L))
  }

  test("range source answers count/min/max in closed form (aggregate pushdown)") {
    def load() = spark.read.format("graft.sources.RangeSource")
      .option("rows", "1000000000").option("slices", "8").load()

    // a BILLION logical rows: only a metadata-only answer returns fast.
    // Composes with filter pushdown — the agg sees the narrowed range.
    val t0 = System.nanoTime()
    val r = load().filter(col("id") >= 100L && col("id") < 2000L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"))
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("agg="), s"expected pushed aggregate scan in:\n$plan")
    assert(r.collect().head.toSeq === Seq(1900L, 100L, 1999L))
    assert((System.nanoTime() - t0) / 1e9 < 30.0,
      "a metadata answer must not scan a billion rows")

    // empty range: count 0, min/max null.
    val e = load().filter(col("id") < 0L)
      .agg(count(lit(1)), min(col("id")), max(col("id"))).collect().head
    assert(e.getLong(0) === 0L && e.isNullAt(1) && e.isNullAt(2))

    // grouped aggregates are declined and still compute correctly.
    val g = spark.read.format("graft.sources.RangeSource")
      .option("rows", "1000").option("slices", "4").load()
      .groupBy(col("id_mod")).agg(count(lit(1)).as("n"))
    assert(!g.queryExecution.executedPlan.toString.contains("agg="))
    assert(g.count() === 97)
  }

  test("key-grouped layout: group-by and self-join plan ZERO exchanges") {
    // storage-partitioned execution: the scan reports
    // KeyGroupedPartitioning(identity(id_mod)) with one HasPartitionKey
    // partition per value, so under v2.bucketing Spark needs no shuffle
    // for either the aggregation or the co-partitioned join — the
    // execution shape a bucketed/Iceberg 100 TB table gets.
    val conf = spark.conf
    val key = "spark.sql.sources.v2.bucketing.enabled"
    val saved = conf.getOption(key)
    try {
      conf.set(key, "true")
      def kg() = spark.read.format("graft.sources.RangeSource")
        .option("rows", "2000").option("keyGrouped", "true").load()

      val agg = kg().groupBy(col("id_mod"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      val aggRows = agg.collect()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "key-grouped aggregation must not shuffle")
      // parity with the plain range layout on the same logical table.
      val plain = spark.read.format("graft.sources.RangeSource")
        .option("rows", "2000").load()
        .groupBy(col("id_mod")).agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      assert(aggRows.sortBy(_.getInt(0)).toSeq
        === plain.collect().sortBy(_.getInt(0)).toSeq)

      val j = kg().select(col("id_mod"), col("id"))
        .join(kg().select(col("id_mod").as("m2"), col("id").as("id2")),
          col("id_mod") === col("m2"))
      assert(j.count() === 41260L) // sum over mods of group-size^2
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        "co-partitioned join must not shuffle")
    } finally saved.fold(conf.unset(key))(conf.set(key, _))
  }

  test("range source reports statistics: a small range broadcasts unhinted") {
    // no broadcast() hint anywhere: the planner must pick BHJ from the
    // source's reported size alone (a stats-less V2 source defaults to
    // defaultSizeInBytes-huge and would sort-merge here).
    val small = spark.read.format("graft.sources.RangeSource")
      .option("rows", "100").option("slices", "2").load()
      .select(col("id"), col("tag"))
    val fact = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val j = fact.join(small, col("l_orderkey") === col("id"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small stats-reporting source should broadcast:\n$plan")
    assert(j.count() > 0)
  }

  test("range source narrows to the joined key range at RUNTIME (V2 dynamic pruning)") {
    // dim must live on disk and be filtered on an INDEPENDENT column
    // (a join-key filter constraint-propagates statically; a filtered
    // LocalRelation constant-folds — same trap as DppSpec), and the
    // filter must be a LITERAL comparison: a bare boolean column does
    // not count as "likely selective", so PartitionPruning declines.
    val dir = "target/tmp/rtfilter/dim"
    spark.range(500, 520).select(col("id").as("id_key"),
        (col("id") % 2).cast("int").as("cat"))
      .write.mode("overwrite").parquet(dir)
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set(keys(0), "false")
      conf.set(keys(1), "false")
      sources.RangeSource.lastRuntimeRange = None
      val fact = spark.read.format("graft.sources.RangeSource")
        .option("rows", "1000000").option("slices", "8").load()
      val dim = spark.read.parquet(dir).filter(col("cat") === 0)
      val joined = fact.join(dim, col("id") === col("id_key"))
        .agg(count(lit(1)).as("n"), min(col("id")).as("mn"), max(col("id")).as("mx"))
        .collect().head
      assert(joined.toSeq === Seq(10L, 500L, 518L))
      val narrowed = sources.RangeSource.lastRuntimeRange
      assert(narrowed.contains((500L, 519L)),
        s"scan should narrow to the runtime key range, got $narrowed")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("live Derby JDBC: write, stride-partitioned read-back, both paths agree") {
    val url = Jdbc.derbyUrl(sf + "/spec")
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    Jdbc.write(cust, url, "spec_customer", "app", "app", overwrite = true)
    // overwrite must be DROP+CREATE, not append — write twice, count once.
    Jdbc.write(cust, url, "spec_customer", "app", "app", overwrite = true)

    val spec = Jdbc.PartitionSpec("\"c_custkey\"", 1L, 101L, 4)
    val byPredicates = Jdbc.readPartitioned(spark, url, "spec_customer", spec)
    // one input partition per stride predicate = one connection per range.
    assert(byPredicates.rdd.getNumPartitions === 4)

    val byOptions = Jdbc.read(spark,
      Jdbc.readerOptions(url, Left("spec_customer"), "app", "app", Some(spec))
        + ("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    assert(byOptions.rdd.getNumPartitions === 4)

    val original = cust.orderBy("c_custkey").collect().toSeq
    assert(byPredicates.orderBy("c_custkey").collect().toSeq === original,
      "predicate-array round-trip must be lossless")
    assert(byOptions.orderBy("c_custkey").collect().toSeq === original,
      "stride-options round-trip must be lossless")
  }

  test("Derby JDBC round-trips the full scalar type lattice losslessly") {
    // the reference's writer maps Arrow types to Postgres column types
    // (writer.rs:15-159); the Spark equivalent is the dialect's type
    // mapping, exercised here across boolean/short/int/long/float/
    // double/decimal/date/timestamp/binary/string. Values must survive
    // byte-for-byte; widened read-back types (e.g. SMALLINT) must cast
    // back without loss.
    import spark.implicits._
    val url = Jdbc.derbyUrl(sf + "/types")
    val df = spark.range(1, 51).select(
      col("id"),
      (col("id") % 2 === 0).as("b"),
      col("id").cast("smallint").as("s"),
      col("id").cast("int").as("i"),
      (col("id") * 1000000007L).as("l"),
      (col("id") / 4.0).cast("float").as("f"),
      (col("id") / 8.0).as("d"),
      (col("id").cast("decimal(10,0)") * lit(1.01).cast("decimal(4,2)"))
        .cast("decimal(12,2)").as("dec"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("id").cast("int"))
        .as("dt"),
      expr("timestamp'2024-01-01 12:00:00' + make_interval(0,0,0,0,0,0, id + 0.123456)")
        .as("ts"),
      col("id").cast("string").cast("binary").as("bin"),
      concat(lit("str"), col("id")).as("str"))
    Jdbc.write(df, url, "spec_types", "app", "app", overwrite = true)
    val back = Jdbc.read(spark,
      Jdbc.readerOptions(url, Left("spec_types"), "app", "app")
        + ("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))

    // exact logical types where the dialect has a 1:1 column type
    val bt = back.schema.fields.map(f => f.name -> f.dataType).toMap
    import org.apache.spark.sql.types._
    assert(bt("b") === BooleanType)
    assert(bt("dec") === DecimalType(12, 2))
    assert(bt("dt") === DateType)
    assert(bt("bin") === BinaryType)

    def norm(x: org.apache.spark.sql.DataFrame) = x.select(
        col("id").cast("long"), col("b"), col("s").cast("short"),
        col("i").cast("int"), col("l").cast("long"), col("f").cast("float"),
        col("d").cast("double"), col("dec").cast("decimal(12,2)"),
        col("dt"), col("ts"), base64(col("bin")).as("bin"), col("str"))
      .orderBy("id").collect().toSeq
    assert(norm(back) === norm(df), "typed round-trip must be lossless")
  }

  test("PostgresDialect DDL type map matches the reference's Postgres writer") {
    // The reference's SQL subsystem targets Postgres specifically; its
    // writer maps Arrow types to PG column types at
    // io/sql/postgres/writer.rs:62-159. No PG server exists in the
    // sandbox (the live execution path is exercised on Derby above),
    // so this pins the PG-specific half — Spark's PostgresDialect DDL
    // types — against that table:
    //   boolean→boolean, Int16→smallint, Int32→integer, Int64→bigint,
    //   Float32→real (FLOAT4), Float64→double precision (FLOAT8),
    //   Timestamp(tz)→timestamp with time zone, Timestamp→timestamp,
    //   Date→date, Binary→bytea, Utf8→text.
    // Divergences by design, Spark widening where the reference
    // returns an error: Int8→SMALLINT (writer.rs errors on Int8),
    // Decimal→NUMERIC(p,s) and Array→element[] (unsupported there).
    // The reference's unsigned rows (UInt16/32/64→bigint,
    // writer.rs:79-81; SURVEY §1.2) have no Spark twin: Catalyst has
    // no unsigned types — they widen to the next signed type at READ
    // time, so the writer can never see one.
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    val pg = JdbcDialects.get("jdbc:postgresql://localhost/db")
    def ddl(t: DataType): String =
      pg.getJDBCType(t).orElse(JdbcUtils.getCommonJDBCType(t))
        .map(_.databaseTypeDefinition)
        .getOrElse(fail(s"no PG mapping for $t"))
    assert(ddl(BooleanType) === "BOOLEAN")
    assert(ddl(ShortType) === "SMALLINT")
    assert(ddl(IntegerType) === "INTEGER")
    assert(ddl(LongType) === "BIGINT")
    assert(ddl(FloatType) === "FLOAT4")   // PG alias: real
    assert(ddl(DoubleType) === "FLOAT8")  // PG alias: double precision
    assert(ddl(TimestampType) === "TIMESTAMP WITH TIME ZONE")
    assert(ddl(TimestampNTZType) === "TIMESTAMP")
    assert(ddl(DateType) === "DATE")
    assert(ddl(BinaryType) === "BYTEA")
    assert(ddl(StringType) === "TEXT")
    // widenings/extensions beyond the reference
    assert(ddl(ByteType) === "SMALLINT")
    assert(ddl(DecimalType(12, 2)) === "NUMERIC(12,2)")
    assert(ddl(ArrayType(LongType)) === "BIGINT[]")

    // the CREATE TABLE the customer table would get on PG — column
    // names quoted by the dialect, exactly what Jdbc.write emits.
    val cust = Tables.customer(spark, sf).schema
    val colsDdl = cust.fields
      .map(f => s"${pg.quoteIdentifier(f.name)} ${ddl(f.dataType)}")
      .mkString(", ")
    assert(colsDdl ===
      """"c_custkey" BIGINT, "c_name" TEXT, "c_nationkey" INTEGER, """ +
        """"c_acctbal" FLOAT8, "c_mktsegment" TEXT""")
  }

  test("Arrow IPC round-trips the full scalar type lattice losslessly") {
    // the reference's from_arrow/to_arrow surface (dataframe.rs:391-407,
    // 515-525) — unlike the Derby JDBC round-trip above, Arrow IPC has a
    // 1:1 type lattice, so the round-trip must preserve the SCHEMA
    // exactly, not just the values.
    val dir = "target/tmp/arrow-lattice"
    val df = spark.range(1, 51).select(
      col("id"),
      (col("id") % 2 === 0).as("b"),
      col("id").cast("tinyint").as("y"),
      col("id").cast("smallint").as("s"),
      col("id").cast("int").as("i"),
      (col("id") * 1000000007L).as("l"),
      (col("id") / 4.0).cast("float").as("f"),
      (col("id") / 8.0).as("d"),
      (col("id").cast("decimal(10,0)") * lit(1.01).cast("decimal(4,2)"))
        .cast("decimal(12,2)").as("dec"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("id").cast("int"))
        .as("dt"),
      expr("timestamp'2024-01-01 12:00:00' + make_interval(0,0,0,0,0,0, id + 0.123456)")
        .as("ts"),
      expr("timestamp_ntz'2024-06-01 08:30:00' + make_interval(0,0,0,0,0,0, id)")
        .as("tsn"),
      col("id").cast("string").cast("binary").as("bin"),
      concat(lit("str"), col("id")).as("str"),
      // a fully-null column and per-row nulls pin the validity bitmap
      when(col("id") % 7 === 0, col("id")).as("holes"),
      lit(null).cast("string").as("all_null"))
    df.write.format("graft.sources.ArrowIpcSource").mode("overwrite").save(dir)
    val back = spark.read.format("graft.sources.ArrowIpcSource").load(dir)
    assert(back.schema === df.schema, "Arrow IPC must preserve schema 1:1")
    def norm(x: org.apache.spark.sql.DataFrame) = x
      .withColumn("bin", base64(col("bin"))).orderBy("id").collect().toSeq
    assert(norm(back) === norm(df), "typed round-trip must be lossless")
  }

  test("Arrow IPC reads files written by an independent Arrow implementation") {
    // src/test/resources/fixtures/nation_py.arrow was written by pyarrow
    // (two record batches, one null per nullable lane at n_nationkey=13),
    // derived deterministically from the sf0.001 nation table — reading
    // it pins cross-implementation IPC compatibility, not just
    // our-writer/our-reader closure.
    import org.apache.spark.sql.types._
    val f = "src/test/resources/fixtures/nation_py.arrow"
    val df = spark.read.format("graft.sources.ArrowIpcSource").load(f)
    val bt = df.schema.fields.map(x => x.name -> x.dataType).toMap
    assert(bt("n_nationkey") === IntegerType)
    assert(bt("n_name") === StringType)
    assert(bt("key_long") === LongType)
    assert(bt("key_double") === DoubleType)
    assert(bt("even") === BooleanType)
    assert(bt("dt") === DateType)
    assert(bt("ts") === TimestampNTZType) // pyarrow timestamp('us'), no tz
    assert(bt("dec") === DecimalType(12, 2))
    assert(bt("bin") === BinaryType)
    assert(df.count() === 25)
    val r13 = df.filter(col("n_nationkey") === 13).collect()(0)
    for (c <- Seq("key_long", "key_double", "even", "dt", "ts", "dec", "bin"))
      assert(r13.isNullAt(r13.fieldIndex(c)), s"$c must be null at key 13")
    // values must agree with the same formulas computed from the parquet
    // nation table Spark-side.
    val expected = Tables.nation(spark, "/root/testdata/sf0.001")
      .filter(col("n_nationkey") =!= 13)
      .select(col("n_nationkey"),
        (col("n_nationkey").cast("long") * 1000000007L).as("key_long"),
        (col("n_nationkey") * 101).cast("double").as("cents"))
      .orderBy("n_nationkey").collect().toSeq
    val got = df.filter(col("n_nationkey") =!= 13)
      .select(col("n_nationkey"), col("key_long"),
        (col("dec") * 100).cast("double").as("cents"))
      .orderBy("n_nationkey").collect().toSeq
    assert(got.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))) ===
      expected.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))))
  }

  test("Arrow IPC write commit is atomic; overwrite truncates; scan prunes") {
    val dir = "target/tmp/arrow-commit"
    val big = spark.range(0, 1000).select(col("id"), (col("id") * 3).as("v"))
      .repartition(4)
    big.write.format("graft.sources.ArrowIpcSource").mode("overwrite").save(dir)
    val afterBig = ArrowIpcSource.listArrowFiles(dir)
    assert(afterBig.size === 4, "one .arrow file per write task")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_staging")),
      "staging dir must be gone after commit")
    // overwrite with a smaller frame truncates the old files
    val small = spark.range(0, 10).select(col("id"), (col("id") * 5).as("v"))
      .coalesce(1)
    small.write.format("graft.sources.ArrowIpcSource").mode("overwrite").save(dir)
    val back = spark.read.format("graft.sources.ArrowIpcSource").load(dir)
    assert(back.count() === 10)
    assert(back.agg(sum(col("v"))).collect()(0).getLong(0) === 225L)
    // append adds rows without clearing
    small.write.format("graft.sources.ArrowIpcSource").mode("append").save(dir)
    assert(spark.read.format("graft.sources.ArrowIpcSource").load(dir)
      .count() === 20)
    // column pruning reaches the scan: the V2 BatchScan's output must be
    // only the selected column.
    val pruned = spark.read.format("graft.sources.ArrowIpcSource").load(dir)
      .select("v")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) === Seq("v"),
      s"scan must prune to the required column, got ${scan.output}")
  }

  test("MsSqlServer/MySQL dialect DDL type maps are pinned") {
    // The reference declares MsSql and MySql protocol members alongside
    // Postgres (expression.rs:388-392) but rejects them at runtime
    // ("only Postgres supported"). Here generic JDBC covers both by
    // driver swap; this pins the dialect-specific DDL halves — Spark's
    // MsSqlServerDialect / MySQLDialect type maps — the same way the
    // Postgres pin above does, so the claim is testable without a
    // server. Notable dialect divergences pinned on purpose:
    // MSSQL has no BOOLEAN column type (BIT), no tz-aware timestamp
    // mapping (DATETIME both ways), NVARCHAR(MAX) text;
    // MySQL booleans are BIT(1), strings LONGTEXT, binary BLOB, and
    // session-tz TIMESTAMP vs wall-clock DATETIME split by NTZ-ness.
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    def ddlFor(url: String)(t: DataType): String =
      JdbcDialects.get(url).getJDBCType(t)
        .orElse(JdbcUtils.getCommonJDBCType(t))
        .map(_.databaseTypeDefinition)
        .getOrElse(fail(s"no mapping for $t at $url"))

    val ms = ddlFor("jdbc:sqlserver://localhost;databaseName=db") _
    assert(ms(BooleanType) === "BIT")
    assert(ms(ByteType) === "SMALLINT")
    assert(ms(ShortType) === "SMALLINT")
    assert(ms(IntegerType) === "INTEGER")
    assert(ms(LongType) === "BIGINT")
    assert(ms(FloatType) === "REAL")
    assert(ms(DoubleType) === "DOUBLE PRECISION")
    assert(ms(TimestampType) === "DATETIME")
    assert(ms(TimestampNTZType) === "DATETIME")
    assert(ms(DateType) === "DATE")
    assert(ms(BinaryType) === "VARBINARY(MAX)")
    assert(ms(StringType) === "NVARCHAR(MAX)")
    assert(ms(DecimalType(12, 2)) === "DECIMAL(12,2)")

    val my = ddlFor("jdbc:mysql://localhost/db") _
    assert(my(BooleanType) === "BIT(1)")
    assert(my(ByteType) === "TINYINT")
    assert(my(ShortType) === "SMALLINT")
    assert(my(IntegerType) === "INTEGER")
    assert(my(LongType) === "BIGINT")
    assert(my(FloatType) === "FLOAT")
    assert(my(DoubleType) === "DOUBLE PRECISION")
    assert(my(TimestampType) === "TIMESTAMP")
    assert(my(TimestampNTZType) === "DATETIME")
    assert(my(DateType) === "DATE")
    assert(my(BinaryType) === "BLOB")
    assert(my(StringType) === "LONGTEXT")
    assert(my(DecimalType(12, 2)) === "DECIMAL(12,2)")

    // the CREATE TABLE column list the customer table would get under
    // each dialect — identifier quoting differs ("..." vs `...`).
    val cust = Tables.customer(spark, sf).schema
    def colsDdl(url: String): String = {
      val d = JdbcDialects.get(url)
      cust.fields
        .map(f => s"${d.quoteIdentifier(f.name)} ${ddlFor(url)(f.dataType)}")
        .mkString(", ")
    }
    assert(colsDdl("jdbc:sqlserver://localhost;databaseName=db") ===
      """"c_custkey" BIGINT, "c_name" NVARCHAR(MAX), """ +
        """"c_nationkey" INTEGER, "c_acctbal" DOUBLE PRECISION, """ +
        """"c_mktsegment" NVARCHAR(MAX)""")
    assert(colsDdl("jdbc:mysql://localhost/db") ===
      "`c_custkey` BIGINT, `c_name` LONGTEXT, `c_nationkey` INTEGER, " +
        "`c_acctbal` DOUBLE PRECISION, `c_mktsegment` LONGTEXT")
  }

  test("xml source escapes markup characters through the round-trip") {
    import spark.implicits._
    val dir = "target/tmp/io/spec/xmlesc"
    val rows = Seq((1L, "a & b <tag> \"quoted\" 'single'"),
      (2L, "plain"), (3L, "]]> and &amp; raw"))
    rows.toDF("id", "s").write.mode("overwrite")
      .option("rowTag", "r").format("xml").save(dir)
    val back = spark.read.format("xml").option("rowTag", "r")
      .schema("id BIGINT, s STRING").load(dir)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back === rows)
  }
}
