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

    // ---- round-10 operators ----

    // span removal: disjoint-gram replication => removed mass exactly mult x
    val (sr1, dsr1) = tm(Dedup.removeSharedSegments(docsFor(1),
      "doc_id", "text", 8, 3).agg(sum("n_removed")).collect()(0).getLong(0))
    val (srN, dsrN) = tm(Dedup.removeSharedSegments(docsFor(mult),
      "doc_id", "text", 8, 3).agg(sum("n_removed")).collect()(0).getLong(0))
    println(f"span-removal (${mult}x corpus): 1x=$sr1 cut ${dsr1}%.2f s  " +
      f"${mult}x=$srN cut ${dsrN}%.2f s  time-growth=${dsrN / dsr1}%.1fx  " +
      f"cut-growth=${srN.toDouble / sr1}%.1fx")

    // per-gram span removal: same disjoint-gram argument — each
    // replica reproduces the 1x keeper/run structure, cut mass exactly
    // mult x
    val (sg1c, dsg1c) = tm(Dedup.removeSharedSegmentsByGram(docsFor(1),
      "doc_id", "text", 8, 3).agg(sum("n_removed")).collect()(0).getLong(0))
    val (sgNc, dsgNc) = tm(Dedup.removeSharedSegmentsByGram(docsFor(mult),
      "doc_id", "text", 8, 3).agg(sum("n_removed")).collect()(0).getLong(0))
    println(f"span-removal-gram (${mult}x corpus): 1x=$sg1c cut ${dsg1c}%.2f s  " +
      f"${mult}x=$sgNc cut ${dsgNc}%.2f s  time-growth=${dsgNc / dsg1c}%.1fx  " +
      f"cut-growth=${sgNc.toDouble / sg1c}%.1fx")

    // BPE token counts: fixed merges (trained on the 1x vocab, plain
    // replication keeps the word set), totals exactly mult x
    def docsSrcFor(m: Int) = docs0
      .crossJoin(spark.range(m).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * lit(1000000)).as("doc_id"),
        col("text"))
    val wc = docsSrcFor(1)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val bpeM = graft.api.Bpe.train(wc, 200)
    def bpeSum(m: Int): Long = TextAnalysis
      .bpeTokenCounts(docsSrcFor(m), "doc_id", "text", bpeM)
      .agg(sum("n_bpe_tokens")).collect()(0).getLong(0)
    val (bp1, dbp1) = tm(bpeSum(1))
    val (bpN, dbpN) = tm(bpeSum(mult))
    println(f"bpe-tokens (${mult}x corpus): 1x=$bp1 ${dbp1}%.2f s  " +
      f"${mult}x=$bpN ${dbpN}%.2f s  time-growth=${dbpN / dbp1}%.1fx  " +
      f"token-growth=${bpN.toDouble / bp1}%.1fx")

    // BPE encode-to-ids: row count == token count, ids invariant per
    // word, so the exploded id stream is exactly mult x rows
    def encCount(m: Int): Long = TextAnalysis
      .bpeEncode(docsSrcFor(m), "doc_id", "text", bpeM).count()
    val (en1, den1) = tm(encCount(1))
    val (enN, denN) = tm(encCount(mult))
    println(f"bpe-encode (${mult}x corpus): 1x=$en1 ids ${den1}%.2f s  " +
      f"${mult}x=$enN ids ${denN}%.2f s  time-growth=${denN / den1}%.1fx  " +
      f"id-growth=${enN.toDouble / en1}%.1fx")

    // packed token stream: a GLOBAL-order construct — the digest set
    // must be invariant to input partitioning (the two-phase offset
    // prefix cannot depend on physical layout), and totals exactly
    // mult x under replication
    // the invariance check compares the FULL per-sequence digest row
    // set, not corpus-wide sums — a partitioning bug that permutes
    // tokens between sequences while preserving global totals must
    // fail this, not slip through an aggregate
    def streamDigest(df: org.apache.spark.sql.DataFrame)
        : (Long, Set[(Long, Long, Long, Long, Long, Long)]) = {
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      (rows.toSeq.map(_._2).sum, rows)
    }
    def packed(m: Int, parts: Int) = graft.api.Packing.packTokenStream(
      if (parts > 0) docsSrcFor(m).repartition(parts) else docsSrcFor(m),
      "doc_id", "text", bpeM, seqLen = 128)
    val tps1 = System.nanoTime()
    val (pt1, _) = streamDigest(packed(1, 0))
    val dps1 = (System.nanoTime() - tps1) / 1e9
    val tpsN = System.nanoTime()
    val (ptN, pdN) = streamDigest(packed(mult, 0))
    val dpsN = (System.nanoTime() - tpsN) / 1e9
    val (_, pdR) = streamDigest(packed(mult, 7))
    println(f"pack-token-stream (${mult}x corpus): 1x=$pt1 toks ${dps1}%.2f s  " +
      f"${mult}x=$ptN toks ${dpsN}%.2f s  time-growth=${dpsN / dps1}%.1fx  " +
      f"tok-growth=${ptN.toDouble / pt1}%.1fx  " +
      f"repartition-invariant=${pdR == pdN}")

    // streaming semantic incremental: fixed 3-file increment against a
    // mult x corpus index — stream union == one-shot batch, invariant
    // to corpus replication, per-run cost never a corpus re-shuffle
    import graft.api.Similarity
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
    def embFor(m: Int) = emb0
      .crossJoin(spark.range(m).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * lit(1000000)).as("vec_id"),
        col("embedding"))
    val semCents = Similarity.kmeansCentroids(emb0, "vec_id", "embedding",
        k = 16, iters = 2)
      .select(col("cent_id").as("vec_id"), col("cv").as("embedding"))
      .localCheckpoint()
    val incBase = 50000000L
    val nEmb = emb0.count()
    val incVecs = emb0.select((col("vec_id") + lit(incBase)).as("vec_id"),
      expr("IF(vec_id % 2 = 0, embedding, reverse(embedding))")
        .as("embedding"))
    val incDir = s"${sys.props("java.io.tmpdir")}/graft-newops-semincr"
    (0 until 3).foreach { i =>
      val lo = incBase + i * nEmb / 3
      val hi = if (i == 2) Long.MaxValue else incBase + (i + 1) * nEmb / 3
      incVecs.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(s"$incDir/s$i")
    }
    val vecSchema = spark.read.parquet(s"$incDir/s0").schema
    val incAll = spark.read.parquet(s"$incDir/s*")
    def semRun(m: Int): (Set[Long], Set[Long], Double, Double) = {
      val idx = Similarity.ivfIndex(embFor(m), semCents,
        "vec_id", "embedding").persist()
      idx.count()
      val t0 = System.nanoTime()
      val st = graft.streaming.Streams.semanticDedupReplay(spark,
          s"$incDir/s*", vecSchema, "vec_id", "embedding", idx, semCents, 0.9)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val d0 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val ba = graft.api.Dedup.semanticDedupIncrement(idx, semCents, incAll,
          "vec_id", "embedding", 0.9)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val d1 = (System.nanoTime() - t1) / 1e9
      idx.unpersist()
      (st, ba, d0, d1)
    }
    val (st1, ba1, dst1, dba1) = semRun(1)
    val (stN, baN, dstN, dbaN) = semRun(mult)
    println(f"stream semantic-incr (${mult}x corpus): " +
      f"1x survivors=${st1.size} parity=${st1 == ba1} " +
      f"stream ${dst1}%.2f s / batch ${dba1}%.2f s  " +
      f"${mult}x survivors=${stN.size} parity=${stN == baN} " +
      f"invariant=${st1 == stN} stream ${dstN}%.2f s / batch ${dbaN}%.2f s")
    spark.stop()
  }
}
