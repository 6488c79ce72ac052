package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused scale probe for the round-7 curation operators (repetition
  * metrics, shared-segment coverage, length percentiles) — same
  * bijective word-renaming replication as ScaleProbe, without paying
  * for the full suite. Usage: NewOpsProbe [sfDir] [mult]
  */
object NewOpsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.api.{Dedup, TextAnalysis}

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    def docsFor(m: Int) = docs0
      .crossJoin(spark.range(m).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * lit(1000000)).as("doc_id"),
        expr("array_join(transform(split(text, ' '), " +
          "w -> concat(w, 'zz', CAST(rep AS STRING))), ' ')").as("text"))
    def docsFullFor(m: Int) = docs0
      .crossJoin(spark.range(m).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * lit(1000000)).as("doc_id"),
        col("source"), col("n_chars"))
    def tm(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }

    // warm the session machinery outside the timed probes
    spark.read.parquet(s"$dir/region.parquet").count()
    // an aggregate over every metric column: a bare count() would let
    // Catalyst ELIMINATE the unique-key left joins (and with them the
    // whole n-gram aggregation) from the plan
    def forceRep(m: Int): Long = TextAnalysis
      .repetitionMetrics(docsFor(m), "doc_id", "text")
      .agg(sum(col("dup_word_ppm") + col("top2_ppm") + col("top3_ppm"))
        .cast("long")).collect()(0).getLong(0)
    val (rm1, drm1) = tm(forceRep(1))
    val (rmN, drmN) = tm(forceRep(mult))
    println(f"repetition metrics (${mult}x corpus): 1x ppm-sum=$rm1 ${drm1}%.2f s  " +
      f"${mult}x ppm-sum=$rmN ${drmN}%.2f s  time-growth=${drmN / drm1}%.1fx  " +
      f"ppm-sum-growth=${rmN.toDouble / rm1}%.1fx")

    val (sg1, dsg1) = tm(Dedup.sharedSegmentCoverage(docsFor(1), "doc_id", "text").count())
    val (sgN, dsgN) = tm(Dedup.sharedSegmentCoverage(docsFor(mult), "doc_id", "text").count())
    println(f"shared segments (${mult}x corpus): 1x=$sg1 docs ${dsg1}%.2f s  " +
      f"${mult}x=$sgN docs ${dsgN}%.2f s  time-growth=${dsgN / dsg1}%.1fx " +
      f"covered-doc-growth=${sgN.toDouble / sg1}%.1fx")

    def pct(m: Int) = TextAnalysis.lengthPercentiles(docsFullFor(m), "source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val t1 = System.nanoTime(); val lp1 = pct(1)
    val dlp1 = (System.nanoTime() - t1) / 1e9
    val tN = System.nanoTime(); val lpN = pct(mult)
    val dlpN = (System.nanoTime() - tN) / 1e9
    println(f"length percentiles (${mult}x corpus): 1x ${dlp1}%.2f s  " +
      f"${mult}x ${dlpN}%.2f s  time-growth=${dlpN / dlp1}%.1fx  " +
      f"percentiles-invariant=${lp1 == lpN}")
    spark.stop()
  }
}
