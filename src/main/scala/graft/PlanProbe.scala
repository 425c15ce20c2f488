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
