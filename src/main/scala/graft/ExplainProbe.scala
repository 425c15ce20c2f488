package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Dev utility: dump `explain("formatted")` for a comma-separated query
  * list into `<outDir>/<query>_<suffix>.txt` — the plan evidence files
  * the optimization rounds commit under `plans/`. Usage:
  * `sbt "runMain graft.ExplainProbe q263_simhash_eval,q363_novelty_curve plans/r14 after [sfDir]"`.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(args(1))
    Files.createDirectories(outDir)
    val suffix = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    for (q <- args(0).split(",")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${q}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"wrote ${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
