package graft

/** Dev utility: print executed-plan shape stats (corpus scan count,
  * exchange count, exchange reuse) for a comma-separated query list —
  * the numbers PlanShapeSpec pins. Usage:
  * `sbt "runMain graft.PlanProbe q252_bootstrap_ci,q253_cdc_chunks"`.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    for (q <- args(0).split(",")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      println(s"== $q scans=${"FileScan parquet".r.findAllIn(p).length}" +
        s" reuse=${p.contains("ReusedExchange")}" +
        s" exchanges=${"Exchange ".r.findAllIn(p).length}")
    }
    spark.stop()
  }
}

/** Dev utility: list every catalog query whose OPTIMIZED plan contains
  * an empty-partitionSpec (global) Window node, with the count — the
  * numbers PlanShapeSpec's bounded-frame window sweep pins. Usage:
  * `sbt "runMain graft.WindowProbe [sfDir]"`.
  */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val globals = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }.length
      if (globals > 0) println(s"GLOBALWIN $name $globals")
    }
    spark.stop()
  }
}

/** Dev utility: list every catalog query with a PARTITIONED Window
  * node whose input is un-aggregated corpus rows — the candidate set
  * for the "few partitions × entity-scale rows each" funnel (the
  * q344-per-source family). Prints the partition exprs and the leaf
  * relations below the window; cardinality of the partition keys must
  * be adjudicated by eye (doc_id/user_id/orderkey partitions are
  * fine, lang/source/event_type over raw corpus rows are not).
  * Usage: `sbt "runMain graft.PartWindowProbe [sfDir]"`.
  */
object PartWindowProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical
    val spark = Session.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      fn(spark, sfDir).queryExecution.optimizedPlan.foreach {
        case w: logical.Window if w.partitionSpec.nonEmpty =>
          val aggBelow = w.child.collectFirst {
            case a: logical.Aggregate => a
            case g: logical.GlobalLimit => g
          }.isDefined
          // agg-below windows print too (round 14): an aggregate
          // bounds the SHUFFLE, not the window's sort task — a
          // (group, value) count frame is still value-scale, and the
          // q341 cumle funnel hid behind exactly this exemption.
          // Adjudicate the AGGWIN rows by the aggregate's grouping
          // keys: value/entity-keyed frames are funnels, bounded
          // domains (calendar, vocab, |groups|) are fine.
          val tag = if (aggBelow) "AGGWIN" else "PARTWIN"
          val parts = w.partitionSpec.map(_.sql).mkString(", ")
          val leaves = w.child.collectLeaves().map {
            case r: logical.LogicalPlan => r.nodeName
          }.mkString("+")
          println(s"$tag $name [$parts] over $leaves")
        case _ =>
      }
    }
    spark.stop()
  }
}
