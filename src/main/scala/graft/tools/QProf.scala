package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Driver-phase + job-count attribution for NAMED queries (DriverProf
  * profiles the whole suite; this drills into a few). For each query,
  * two rounds (cold, warm): DataFrame construction / analyze /
  * optimize / plan / execute wall, plus the number of Spark JOBS the
  * round submitted — the driver-action count VERDICT r21 asks to cut
  * on the tx walks. Usage: QProf <sfDir> <query> [query...]
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.SparkConfig.builder("graft-qprof",
      graft.SparkConfig.cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().count()

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { round =>
        // listener bus is async; let it drain before sampling
        Thread.sleep(400)
        val j0 = jobs.get()
        val (df, tc) = time(fn(spark, sfDir))
        val qe = df.queryExecution
        val (_, ta) = time(qe.analyzed)
        val (_, to) = time(qe.optimizedPlan)
        val (_, tp) = time(qe.executedPlan)
        val (n, te) = time(df.count())
        Thread.sleep(400)
        val nj = jobs.get() - j0
        val tag = if (round == 1) "cold" else "warm"
        println(f"$name%-24s $tag jobs=$nj%-3d construct=$tc%6.3f " +
          f"analyze=$ta%5.3f optimize=$to%6.3f plan=$tp%6.3f " +
          f"exec=$te%6.3f rows=$n")
      }
    }
    spark.stop()
  }
}
