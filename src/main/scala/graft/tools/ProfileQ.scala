package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution for one query: runs a query twice (cold, then
  * warm/timed) and prints every stage of the warm run with task count,
  * summed executor run/CPU time, GC, and shuffle bytes — the local
  * stand-in for the Spark UI's stage table (UI is disabled in this
  * environment). Usage: ProfileQ <sfDir> <query> [query...]
  */
object ProfileQ {
  private final case class Row(id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, gcMs: Long, inB: Long, srB: Long, swB: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = graft.SparkConfig.cpus
    val spark = graft.SparkConfig.builder("graft-profile", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          val scopes = si.rddInfos.sortBy(_.id).flatMap(r =>
            r.scope.map(_.name)).distinct.mkString(">")
          rows.add(Row(si.stageId,
            scopes.take(150), si.numTasks,
            tm.executorRunTime, tm.executorCpuTime / 1000000L,
            tm.jvmGCTime, tm.inputMetrics.bytesRead,
            tm.shuffleReadMetrics.remoteBytesRead + tm.shuffleReadMetrics.localBytesRead,
            tm.shuffleWriteMetrics.bytesWritten))
        }
    })

    // GRAFT_PROFILE_COLD: attribute the COLD pass (includes pin builds —
    // the honest from-parquet compute the bench's unloaded column times)
    // instead of the warm pass.
    val profileCold = sys.env.contains("GRAFT_PROFILE_COLD")
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (profileCold) { rows.clear(); record = true }
      val t0 = System.nanoTime(); fn(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      if (profileCold) {
        record = false
        Thread.sleep(600)
        import scala.jdk.CollectionConverters._
        val rs = rows.asScala.toSeq.sortBy(-_.runMs)
        println(f"\n==== $name COLD=$cold%6.2f stages=${rs.size} " +
          f"taskSum=${rs.map(_.tasks).sum} runSum=${rs.map(_.runMs).sum / 1e3}%6.2f " +
          f"cpuSum=${rs.map(_.cpuMs).sum / 1e3}%6.2f ====")
        rs.take(24).foreach { r =>
          println(f"  s${r.id}%-5d tasks=${r.tasks}%-4d run=${r.runMs / 1e3}%7.2f " +
            f"cpu=${r.cpuMs / 1e3}%7.2f gc=${r.gcMs}%-5d in=${r.inB / 1024}%-8d " +
            f"sr=${r.srB / 1024}%-8d sw=${r.swB / 1024}%-8d ${r.name}")
        }
      }
      rows.clear(); record = true
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime(); val n = df.count()
      val warm = (System.nanoTime() - t1) / 1e9
      record = false
      if (sys.env.contains("GRAFT_PROFILE_RECOUNT")) {
        val t2 = System.nanoTime(); df.count()
        println(f"  recount(same df)=${(System.nanoTime() - t2) / 1e9}%6.2f")
        val t3 = System.nanoTime(); fn(spark, sfDir).count()
        println(f"  fresh-fn rerun =${(System.nanoTime() - t3) / 1e9}%6.2f")
      }
      if (sys.env.contains("GRAFT_PROFILE_PLAN")) {
        println(s"---- $name final adaptive plan ----")
        println(df.queryExecution.executedPlan.toString.take(12000))
      }
      // listener bus is async; give it a beat to drain
      Thread.sleep(600)
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq.sortBy(-_.runMs)
      println(f"\n==== $name cold=$cold%6.2f warm=$warm%6.2f rows=$n " +
        f"stages=${rs.size} taskSum=${rs.map(_.tasks).sum} " +
        f"runSum=${rs.map(_.runMs).sum / 1e3}%6.2f cpuSum=${rs.map(_.cpuMs).sum / 1e3}%6.2f ====")
      rs.take(24).foreach { r =>
        println(f"  s${r.id}%-5d tasks=${r.tasks}%-4d run=${r.runMs / 1e3}%7.2f " +
          f"cpu=${r.cpuMs / 1e3}%7.2f gc=${r.gcMs}%-5d in=${r.inB / 1024}%-8d " +
          f"sr=${r.srB / 1024}%-8d sw=${r.swB / 1024}%-8d ${r.name}")
      }
    }
    spark.stop()
  }
}
