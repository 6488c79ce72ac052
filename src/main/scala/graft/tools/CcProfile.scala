package graft.tools

import org.apache.spark.scheduler._

/** Where does q_graph_cc's unloaded wall actually go? (round-13 verdict
  * #1: the star-contraction rework left the wall flat at ~6.6 s while
  * round count and CPU are already minimal — so measure BEFORE touching
  * anything else.) One unloaded run of the query with a stage listener:
  * prints per-stage (submit→complete) wall and task-time sums, plus the
  * driver-side gaps between stages — the split between "executors were
  * busy" and "the driver was analyzing/planning/codegen-ing between
  * jobs", which is exactly the ambiguity the verdict asked to resolve.
  *
  * Usage: CcProfile <sfDir> [queryName]
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = if (args.length > 1) args(1) else "q_graph_cc"
    // SparkConfig.cpus (SPARK_GRAFT_CPUS, default 4) — profile under
    // the SAME width Bench/Verify run at, or parallelism findings here
    // won't reproduce there
    val spark = graft.SparkConfig
      .builder("graft-ccprofile", graft.SparkConfig.cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session the way Bench's unloaded column is warm: JVM up,
    // codegen caches hot for OTHER plans, data read once
    spark.read.parquet(s"$sfDir/customer.parquet").count()

    final case class St(id: Int, name: String, submit: Long, done: Long,
                        taskMs: Long, nTasks: Int)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = Option(t.taskMetrics).map(_.executorRunTime).getOrElse(0L)
        taskMs.merge(t.stageId, (m, 1),
          (a, b) => (a._1 + b._1, a._2 + b._2)); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val (tm, nt) = taskMs.getOrDefault(i.stageId, (0L, 0))
        stages.add(St(i.stageId, i.name.takeWhile(_ != '\n').take(60),
          i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L),
          tm, nt)); ()
      }
    }
    // run once COLD (not measured) so scratch/FS caches settle, then
    // the measured run — mirrors Bench's unloaded protocol (fresh plan,
    // warm JVM)
    graft.SparkEntry.queries(qname)(spark, sfDir).count()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.queries(qname)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val ss = stages.asScala.toSeq.sortBy(_.submit)
    val t0ms = ss.headOption.map(_.submit).getOrElse(0L)
    println(f"== $qname%s: wall $wall%.2f s, $rows rows, ${ss.size} stages ==")
    var prevDone = t0ms
    var gapTotal = 0L
    var stageTotal = 0L
    ss.foreach { s =>
      val gap = math.max(0L, s.submit - prevDone)
      gapTotal += gap
      stageTotal += (s.done - s.submit)
      println(f"  +${(s.submit - t0ms) / 1000.0}%7.2f  gap ${gap / 1000.0}%5.2f  " +
        f"stage ${(s.done - s.submit) / 1000.0}%5.2f s  tasks ${s.nTasks}%3d  " +
        f"taskSum ${s.taskMs / 1000.0}%6.2f s  ${s.name}%s")
      prevDone = math.max(prevDone, s.done)
    }
    println(f"== stage wall (union approx) ${stageTotal / 1000.0}%.2f s, " +
      f"driver gaps ${gapTotal / 1000.0}%.2f s, measured wall $wall%.2f s ==")
    spark.stop()
  }
}
