package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused near-dup scale probe: pairs / wall / shuffle bytes at 1x and
  * Nx under the same bijective word-renaming replication as ScaleProbe,
  * plus a content checksum over the pair set so any plan change can
  * prove byte-identical output, not just equal counts.
  * Usage: NearDupProbe [sfDir] [mult]
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.api.Dedup

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val b = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          shuffleBytes.addAndGet(b)
          if (b > 2000000 && sys.env.contains("NDP_STAGES"))
            println(f"    stage ${sc.stageInfo.stageId}%4d " +
              f"${b / 1e6}%8.1f MB  ${sc.stageInfo.name.take(90)}")
        }
      })
    def shufSnap(): Long = { Thread.sleep(500); shuffleBytes.get }

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    def docsFor(m: Int) = docs0
      .crossJoin(spark.range(m).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * lit(1000000)).as("doc_id"),
        expr("array_join(transform(split(text, ' '), " +
          "w -> concat(w, 'zz', CAST(rep AS STRING))), ' ')").as("text"))

    // order-free content checksum: XOR of per-row hashes
    def checksum(p: org.apache.spark.sql.DataFrame): Long =
      p.agg(expr("bit_xor(xxhash64(doc_a, doc_b, CAST(jaccard AS STRING)))"))
        .collect()(0).getLong(0)

    if (sys.env.contains("NDP_EXPLAIN")) {
      val sh = Dedup.shingles(docsFor(1), "doc_id", "text")
      Dedup.nearDuplicatePairs(sh, 0.5).explain("formatted")
      spark.stop(); return
    }

    // `hot` mode: plant a boilerplate 4-gram with df just under maxDf
    // (the worst legal skew) and compare the salted hot-tok join
    // (default hotDf) against the unsalted shape (hotDf = maxDf): the
    // straggler bound is the max-task / median-task ratio of the
    // heaviest stage. The planted gram adds NO output pairs (its docs
    // share only boilerplate, jaccard ≪ threshold) — it exists purely
    // to blow up one join group.
    if (args.contains("hot")) {
      val taskTimes = scala.collection.concurrent
        .TrieMap[Int, scala.collection.mutable.ArrayBuffer[Long]]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            taskTimes.getOrElseUpdate(te.stageId,
              scala.collection.mutable.ArrayBuffer.empty[Long])
              .synchronized { taskTimes(te.stageId) += te.taskInfo.duration }
        })
      // Derive the plant rate from the df cap, not a fixed fraction of
      // the corpus: a fixed modulus makes df scale with `mult`, so
      // outside one narrow corpus-size band the planted gram would be
      // silently df-capped away (or land cold) in BOTH runs and the
      // probe would print a "validated" ratio while exercising no skew.
      val maxDfCap = 10000
      val total = docsFor(mult).count()
      val modK = math.max(1L, total / (maxDfCap * 9L / 10)) // df ~= 0.9*maxDf
      val planted = docsFor(mult).withColumn("text",
        when(pmod(col("doc_id"), lit(modK)) === 0,
          concat(col("text"), lit(" hotw0 hotw1 hotw2 hotw3")))
          .otherwise(col("text")))
      val nHot = planted.filter(col("text").contains(" hotw0")).count()
      require(nHot > 1000 && nHot <= maxDfCap,
        s"hot probe invalid: planted df=$nHot outside (hotDf=1000, " +
          s"maxDf=$maxDfCap] — corpus too small/large for a hot plant; " +
          s"nothing skewed would be measured")
      for ((hd, label) <- Seq(1000 -> "salted(hotDf=1000)",
                              maxDfCap -> "unsalted(hotDf=maxDf)")) {
        taskTimes.clear()
        val sh = Dedup.shingles(planted, "doc_id", "text")
        val t0 = System.nanoTime()
        val pr = Dedup.nearDuplicatePairs(sh, 0.5, maxDf = maxDfCap, hotDf = hd)
        val n = pr.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val ck = checksum(pr)
        Thread.sleep(500)
        // straggler metric: the stage whose max task is globally worst
        val (sid, ds) = taskTimes.toSeq.filter(_._2.nonEmpty)
          .maxBy(_._2.max)
        val sorted = ds.sorted
        val med = math.max(1L, sorted(sorted.size / 2))
        println(f"hot-tok $label%-22s df=$nHot pairs=$n wall=$wall%7.2f s  " +
          f"ck=$ck  worst-stage=$sid max-task=${sorted.last / 1e3}%.1f s " +
          f"median-task=${med / 1e3}%.3f s ratio=${sorted.last.toDouble / med}%.1fx")
        sh.unpersist()
      }
      spark.stop(); return
    }

    for ((m, label) <- Seq(1 -> "1x", mult -> s"${mult}x")) {
      val sh = Dedup.shingles(docsFor(m), "doc_id", "text")
      val s0 = shufSnap()
      val t0 = System.nanoTime()
      val pr = Dedup.nearDuplicatePairs(sh, 0.5)
      val n = pr.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val s1 = shufSnap()
      val ck = checksum(pr)
      println(f"near-dup $label%-5s pairs=$n%-8d wall=$wall%7.2f s  " +
        f"shuffle=${(s1 - s0) / 1e6}%9.1f MB  checksum=$ck")
      sh.unpersist()
    }
    spark.stop()
  }
}
