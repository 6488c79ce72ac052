package graft.tools

/** Driver-side attribution for the loaded-phase latency question: for
  * every registered query, time the phases that run ON THE DRIVER —
  * DataFrame construction (includes any eager work an operator does),
  * analysis, optimization, physical planning — separately from
  * execution. Two serial passes (cold then warm) so one-time costs
  * (footer-schema jobs, codegen compiles, JIT) separate from steady
  * state. Usage: DriverProf <sfDir> [concurrency]
  *
  * With a concurrency argument > 1 it instead replays the bench's
  * loaded shape (N submitter threads, full execution) and prints the
  * makespan — for A/B-ing driver-contention fixes without the full
  * bench harness.
  */
object DriverProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val conc = if (args.length > 1) args(1).toInt else 1
    val spark = graft.SparkConfig.builder("graft-driverprof",
      graft.SparkConfig.cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().count()

    if (conc > 1) {
      // bench-shaped loaded replay: warm the builds first (like the
      // bench build phase), then fan out with N submitters
      graft.ops.Sources.prewriteAll(spark, sfDir)
      Seq("shingles", "corpus_bands", "near_pairs", "dup_clusters",
        "segment_index", "span_cut").foreach {
        case "shingles" => graft.ops.Pipeline.shingled(spark, sfDir).count()
        case "corpus_bands" => graft.ops.Pipeline.corpusBands(spark, sfDir).rows.count()
        case "near_pairs" => graft.ops.Pipeline.nearPairs(spark, sfDir).count()
        case "dup_clusters" => graft.ops.Pipeline.corpusClusters(spark, sfDir).count()
        case "segment_index" => graft.ops.Pipeline.corpusSegIndex(spark, sfDir).count()
        case "span_cut" => graft.ops.Pipeline.spanCut(spark, sfDir).count()
      }
      import java.util.concurrent.Executors
      import scala.concurrent._
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(conc)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val names = graft.SparkEntry.queries.toSeq
        .filterNot(q => graft.Bench.memoizedQueries.contains(q._1))
      (1 to 2).foreach { round =>
        val t0 = System.nanoTime()
        val fs = names.map { case (name, fn) => Future {
          val q0 = System.nanoTime()
          try fn(spark, sfDir).count() catch { case t: Throwable =>
            System.err.println(s"$name FAILED: ${t.getMessage}") }
          name -> (System.nanoTime() - q0) / 1e9
        } }
        val rs = Await.result(Future.sequence(fs), Duration(20, "min"))
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"\n== pass $round: makespan $wall%6.2f s, " +
          f"sumwall ${rs.map(_._2).sum}%7.1f s, n=${rs.size} ==")
        rs.sortBy(-_._2).take(20).foreach { case (n, w) =>
          println(f"  $n%-30s $w%6.2f") }
      }
      pool.shutdown()
      spark.stop()
      return
    }

    final case class Phases(construct: Double, analyze: Double,
        optimize: Double, plan: Double, exec: Double) {
      def driver: Double = construct + analyze + optimize + plan
      def +(o: Phases) = Phases(construct + o.construct,
        analyze + o.analyze, optimize + o.optimize, plan + o.plan,
        exec + o.exec)
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def once(name: String,
             fn: (org.apache.spark.sql.SparkSession, String) =>
               org.apache.spark.sql.DataFrame): Phases = {
      val (df, tc) = time(fn(spark, sfDir))
      val qe = df.queryExecution
      val (_, ta) = time(qe.analyzed)
      val (_, to) = time(qe.optimizedPlan)
      val (_, tp) = time(qe.executedPlan)
      val (_, te) = time(df.count())
      Phases(tc, ta, to, tp, te)
    }
    (1 to 2).foreach { round =>
      var tot = Phases(0, 0, 0, 0, 0)
      val rows = graft.SparkEntry.queries.toSeq
        .filterNot(q => graft.Bench.memoizedQueries.contains(q._1))
        .map { case (name, fn) =>
          val p = once(name, fn); tot = tot + p; name -> p
        }
      println(f"\n==== pass $round: driver=${tot.driver}%7.2f s " +
        f"(construct=${tot.construct}%6.2f analyze=${tot.analyze}%6.2f " +
        f"optimize=${tot.optimize}%6.2f plan=${tot.plan}%6.2f) " +
        f"exec=${tot.exec}%7.2f s ====")
      println("slowest by driver time:")
      rows.sortBy(-_._2.driver).take(25).foreach { case (n, p) =>
        println(f"  $n%-30s driver=${p.driver}%6.3f " +
          f"(c=${p.construct}%6.3f a=${p.analyze}%5.3f o=${p.optimize}%6.3f " +
          f"p=${p.plan}%6.3f) exec=${p.exec}%6.3f")
      }
    }
    spark.stop()
  }
}
