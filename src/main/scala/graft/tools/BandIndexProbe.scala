package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-session probe for the persisted dedup band index: run once with
  * `build` (wipes the scratch index, signs the corpus, saves) and again
  * in a NEW process with `load` (attaches the files) — the load run must
  * produce the identical pair set without re-shingling the corpus, and
  * its wall shows what the persisted index saves a cold session.
  * Usage: BandIndexProbe [sfDir] [build|load]
  */
object BandIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("build")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the ONE path definition the pipeline itself uses — a second copy
    // of the derivation is how the build-mode wipe silently stopped
    // hitting the real index once already
    val path = graft.ops.Pipeline.bandsPath(dir)
    if (mode == "build") {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(path))
    }

    // corpus-shingle records read: in load mode the corpus side comes
    // from the attached shingle table, so documents.parquet is read
    // ONLY for the 10% increment (filter pushed below the shingle
    // transform) — visible as ~10x fewer document rows scanned
    val docRows = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          docRows.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
      })

    // warm the session machinery outside the timed phases so the
    // build-vs-attach delta isn't buried under first-query codegen
    spark.read.parquet(s"$dir/region.parquet").count()

    val t0 = System.nanoTime()
    val (index, corpusSh) = graft.ops.Pipeline.corpusBandsSh(spark, dir)
    val nBands = index.rows.count() // forces the attach/materialization
    val indexWall = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val pairs = graft.api.Dedup.incrementalMinhashPairsIndexed(corpusSh,
      index, graft.ops.Pipeline.incrShingled(spark, dir), threshold = 0.5)
    val ck = pairs
      .agg(expr("bit_xor(xxhash64(doc_a, doc_b, CAST(jaccard AS STRING)))"))
      .collect()(0).getLong(0)
    val n = pairs.count()
    val qWall = (System.nanoTime() - t1) / 1e9
    Thread.sleep(500)
    println(f"band-index $mode%-5s index=$indexWall%6.2f s ($nBands band rows)  " +
      f"query=$qWall%6.2f s  pairs=$n  input-records=${docRows.get}  checksum=$ck")
    graft.Graft.clear(spark)
    spark.stop()
  }
}
