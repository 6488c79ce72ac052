package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Streaming semantics pinned against their batch twins. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("tumbling stream counts equal the batch window aggregation") {
    val streamed = Streams.tumblingCounts(spark, sfDir)
      .select("ws", "n").collect().map(r => (r.get(0).toString, r.getLong(1))).toMap
    val batch = SparkEntry.queries("q_window_tumble")(spark, sfDir)
      .select("ws", "n").collect().map(r => (r.get(0).toString, r.getLong(1))).toMap
    assert(streamed === batch)
  }

  test("session stream: session counts sum to per-user event counts") {
    val sess = Streams.sessionCounts(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val events = graft.ops.H.t(spark, sfDir, "events")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess === events)
  }

  test("streamed incremental dedup equals the batch incremental pair set") {
    import graft.ops.Pipeline
    val glob = graft.ops.Sources.ensureStreamIncr(spark, sfDir) + "/s*"
    val sh = Pipeline.shingled(spark, sfDir)
    val docs = graft.ops.H.t(spark, sfDir, "documents")
    val streamed = Streams.incrementalDedupReplay(spark, glob, docs.schema,
        "doc_id", "text",
        corpusSh = sh.filter(col("doc_id") % 10 =!= 0),
        corpusBands = Pipeline.corpusBands(spark, sfDir), threshold = 0.5)
    // the replay really ran as MULTIPLE micro-batches (one per arrival
    // file), not one big batch — the thing this operator exists to show
    val nBatches = streamed.inputFiles
      .map(_.replaceAll(".*batch_id=([0-9]+).*", "$1")).distinct.length
    assert(nBatches >= 2, s"expected >=2 micro-batch partitions, got $nBatches")
    val got = streamed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.api.Dedup.incrementalMinhashPairsIndexed(
        sh.filter(col("doc_id") % 10 =!= 0),
        Pipeline.corpusBands(spark, sfDir),
        sh.filter(col("doc_id") % 10 === 0), threshold = 0.5)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("jaccard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === batch)
  }

  test("streamed semantic incremental dedup equals the one-shot increment") {
    import graft.api.{Dedup, Similarity}
    val emb = graft.ops.H.t(spark, sfDir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
    val corpus = Similarity.ivfIndex(emb, cents, "vec_id", "embedding")
    // 3 arrival files with ids ASCENDING by batch order (the parity
    // precondition): half exact copies (corpus-dominated), half
    // reversed vectors
    val base = 90000L
    val n = emb.count()
    val inc = emb.select((col("vec_id") + lit(base)).as("vec_id"),
      expr("IF(vec_id % 2 = 0, embedding, reverse(embedding))")
        .as("embedding"))
    val incDir = s"${sys.props("java.io.tmpdir")}/graft-test-semincr"
    (0 until 3).foreach { i =>
      val lo = base + i * n / 3
      val hi = if (i == 2) Long.MaxValue else base + (i + 1) * n / 3
      inc.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(s"$incDir/s$i")
    }
    val glob = s"$incDir/s*"
    val streamed = Streams.semanticDedupReplay(spark, glob,
      spark.read.parquet(s"$incDir/s0").schema, "vec_id", "embedding",
      corpus, cents, threshold = 0.2)
    val nBatches = streamed.inputFiles
      .map(_.replaceAll(".*batch_id=([0-9]+).*", "$1")).distinct.length
    assert(nBatches >= 2, s"expected >=2 micro-batch partitions, got $nBatches")
    val got = streamed.select("vec_id").collect().map(_.getLong(0)).toSet
    val oneShot = Dedup.semanticDedupIncrement(corpus, cents,
        spark.read.parquet(glob), "vec_id", "embedding", threshold = 0.2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got === oneShot)
    // exact copies of corpus vectors must all be dominated away
    assert(got.forall(_ % 2 === 1), s"an exact copy survived: $got")
  }

  test("streamed paragraph incremental dedup equals the one-shot increment") {
    import graft.api.Dedup
    val docs = graft.ops.H.t(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val glob = graft.ops.Sources.ensureStreamParIncr(spark, sfDir) + "/s*"
    val streamed = Streams.segmentDedupReplay(spark, glob,
      docs.select("doc_id", "text").schema, "doc_id", "text",
      Dedup.segmentHashes(corpus, "doc_id", "text", 15), segTokens = 15)
    val nBatches = streamed.inputFiles
      .map(_.replaceAll(".*batch_id=([0-9]+).*", "$1")).distinct.length
    assert(nBatches >= 2, s"expected >=2 micro-batch partitions, got $nBatches")
    val got = streamed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val oneShot = Dedup.incrementalParagraphDedup(corpus,
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 15)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(got === oneShot)
  }

  test("streamed cms sketch equals the batch sketch over the same slice") {
    import graft.api.Sketches
    import graft.ops.{Pipeline, Sources}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val glob = Sources.ensureStreamIncr(spark, sfDir) + "/s*"
    val streamed = Streams.cmsSketchStream(spark, glob, docs.schema, "text",
        Pipeline.CmsDepth, Pipeline.CmsWidth)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketches.cmsSketch(docs.filter(col("doc_id") % 10 === 0),
        "text", Pipeline.CmsDepth, Pipeline.CmsWidth)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch,
      "counter addition must commute with micro-batching")
    assert(streamed.size <= Pipeline.CmsDepth * Pipeline.CmsWidth)
  }

  test("foreachBatch parquet sink is idempotent under batch redelivery") {
    val out = java.nio.file.Files.createTempDirectory("fb").toString
    val n1 = Streams.replayToParquet(spark, sfDir, out)
    // fresh checkpoint, same deterministic source → the same batches
    // are REDELIVERED; per-batch partition overwrite must not duplicate
    val n2 = Streams.replayToParquet(spark, sfDir, out)
    assert(n1 === n2)
    assert(n1 === graft.ops.H.t(spark, sfDir, "events").count())
  }

  test("rate source smoke: unbounded synthetic stream plans and runs") {
    // The rate source is wall-clock driven (nondeterministic values), so
    // this is a plumbing smoke: one micro-batch through the same
    // windowed-aggregation shape used by the file-replay queries.
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .withWatermark("timestamp", "1 second")
      .groupBy(window(col("timestamp"), "1 second"))
      .count()
    val q = stream.writeStream.format("memory")
      .queryName("rate_smoke").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200))
      .start()
    try {
      q.awaitTermination(4000)
      assert(q.isActive, "stream stays up")
    } finally q.stop()
    assert(spark.table("rate_smoke").columns.toSeq === Seq("window", "count"))
  }
}
