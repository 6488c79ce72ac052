package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // two runs: cold then warm
      val t0 = System.nanoTime(); fn(spark, sfDir).count(); val c = (System.nanoTime()-t0)/1e9
      val t1 = System.nanoTime(); val n = fn(spark, sfDir).count(); val w = (System.nanoTime()-t1)/1e9
      println(f"$name%-22s cold=$c%6.2f warm=$w%6.2f rows=$n")
    }
    spark.stop()
  }
}
