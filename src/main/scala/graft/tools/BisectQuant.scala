package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
object BisectQuant {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.SparkConfig.builder("bisect", graft.SparkConfig.cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long)]()
    @volatile var rec = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (rec && te.taskMetrics != null)
          tasks.add((te.stageId, te.taskMetrics.executorRunTime,
            te.taskMetrics.executorCpuTime / 1000000L,
            te.taskMetrics.executorDeserializeTime))
    })
    val e = graft.ops.H.t(spark, sfDir, "embeddings")
    def q() = graft.api.Similarity.ivfQuantizedTopK(e, e.filter(col("vec_id") < 16),
      "vec_id", "embedding", 1, 10, 4)
    sys.env.get("BQ_CONF").foreach { kv =>
      val Array(k, v) = kv.split('='); spark.conf.set(k, v) }
    q().count() // run 1
    rec = true
    q().count() // measure run 2 (the bench's unloaded shape)
    rec = false
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val byStage = tasks.asScala.toSeq.groupBy(_._1).toSeq.sortBy(-_._2.map(_._3).sum)
    byStage.take(3).foreach { case (sid, ts) =>
      val cpus = ts.map(_._3).sorted
      println(s"stage $sid tasks=${ts.size} cpuSum=${cpus.sum}ms " +
        s"min=${cpus.head} p50=${cpus(cpus.size/2)} max=${cpus.last} " +
        s"deserSum=${ts.map(_._4).sum}ms runSum=${ts.map(_._2).sum}ms")
    }
    spark.stop()
  }
}
