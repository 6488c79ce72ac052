package graft.tools

import java.nio.file.{Files, Paths}

/** Writes `explain("formatted")` for each named query to
  * `<outDir>/<query>_<suffix>.txt` — the judge-checkable plan artifacts
  * for optimization rounds. Uses the production SparkConfig session so
  * the plans match what Bench/Verify run (AQE initial plans;
  * `isFinalPlan=false` — the shape fields that matter here are join
  * strategy, Exchange count, PushedFilters/ReadSchema).
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val spark = graft.SparkConfig.builder("graft-plandump",
      graft.SparkConfig.cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    args.drop(3).foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), txt)
      println(s"wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
