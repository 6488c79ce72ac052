package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.shelf._

/** End-to-end: the shelf ETL layer driving the training-data pipeline
  * operators — snapshot a raw corpus, quality-filter it, near-dup-dedup
  * it, all as incremental Merkle DAG steps built by Spark.
  */
class IntegrationSpec extends AnyFunSuite {

  test("documents corpus: snapshot -> quality -> dedup -> decontaminate" +
      " -> perplexity -> pack DAG") {
    val root = Files.createTempDirectory("intshelf")
    val cache = Files.createTempDirectory("intcache")
    val store = new Store(
      root.resolve("data/store").toUri.toString.stripSuffix("/"), cache)
    val shelf = new Shelf(root, () => SparkTestSession.spark, Some(store))
    val today = java.time.LocalDate.of(2026, 8, 12)

    // 1. ingest the raw corpus (single parquet file snapshot)
    val snap = shelf.snapshot(
      java.nio.file.Paths.get(SparkTestSession.sfDir, "documents.parquet"),
      "corpus/raw", today = today)

    // 2. quality gate as a registered Scala step: docs with 20..90 tokens
    StepRegistry.register("corpus/clean/2026-08-12", version = "v1") {
      (spark, deps, dest) =>
        val docs = spark.read.parquet(deps.head.toString)
          .withColumn("n_tokens", size(split(col("text"), " ")))
          .filter(col("n_tokens").between(20, 90))
        Tables.writeSingleParquet(docs, dest)
    }
    val clean = StepURI.table("corpus/clean/2026-08-12")

    // 3. near-dup removal: keep the lowest doc_id of every jaccard>=0.5
    //    pair (the library's dedup operator driving a build step)
    StepRegistry.register("corpus/dedup/2026-08-12", version = "v1") {
      (spark, deps, dest) =>
        val docs = spark.read.parquet(deps.head.toString)
        docs.createOrReplaceTempView("documents_clean")
        val pairs = graft.ops.Registry.byName("q_dedup_near")
          .fn(spark, SparkTestSession.sfDir)
        val losers = pairs.select(col("doc_b").as("doc_id")).distinct()
        val kept = docs.join(losers, Seq("doc_id"), "left_anti")
        Tables.writeSingleParquet(kept, dest)
    }
    val dedup = StepURI.table("corpus/dedup/2026-08-12")

    // 4. benchmark decontamination via the public API: the doc_id%97
    //    slice plays the eval set, contaminated survivors are dropped
    StepRegistry.register("corpus/decon/2026-08-12", version = "v1") {
      (spark, deps, dest) =>
        val docs = spark.read.parquet(deps.head.toString)
        val sh = graft.api.Dedup.shingles(docs, "doc_id", "text")
        try {
          val kept = graft.api.Decontamination.dropContaminated(
            docs.filter(col("doc_id") % 97 =!= 0), "doc_id",
            sh.filter(col("doc_id") % 97 =!= 0),
            sh.filter(col("doc_id") % 97 === 0))
          Tables.writeSingleParquet(kept, dest)
        } finally { sh.unpersist(); () }
    }
    val decon = StepURI.table("corpus/decon/2026-08-12")

    // 5. LM-perplexity gate (round 5): drop the worst-NLL 5% tail —
    //    the CCNet-style quality cut running as a DAG step
    StepRegistry.register("corpus/ppl/2026-08-12", version = "v1") {
      (spark, deps, dest) =>
        val docs = spark.read.parquet(deps.head.toString)
        val scores = graft.api.TextAnalysis.perplexityScore(
          docs, "doc_id", "text", vocabSize = 20)
        val cut = scores
          .agg(expr("percentile_approx(avg_nll, 0.95, 10000)"))
          .head().getDouble(0)
        val kept = docs.join(
          scores.filter(col("avg_nll") <= cut).select("doc_id"), "doc_id")
        Tables.writeSingleParquet(kept, dest)
    }
    val ppl = StepURI.table("corpus/ppl/2026-08-12")

    // 6. sequence packing into 200-token bins per language stratum
    StepRegistry.register("corpus/pack/2026-08-12", version = "v1") {
      (spark, deps, dest) =>
        val docs = spark.read.parquet(deps.head.toString)
        Tables.writeSingleParquet(graft.api.Packing.packGreedy(
          docs.select(col("lang"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          "doc_id", "lang", "n_tokens", budget = 200L), dest)
    }
    val pack = StepURI.table("corpus/pack/2026-08-12")

    shelf.catalog = shelf.catalog
      .addStep(clean, Seq(snap))
      .addStep(dedup, Seq(clean))
      .addStep(decon, Seq(dedup))
      .addStep(ppl, Seq(decon))
      .addStep(pack, Seq(ppl))
    shelf.catalog.save()

    val built = shelf.run()
    assert(built.contains(clean) && built.contains(dedup)
      && built.contains(decon) && built.contains(ppl)
      && built.contains(pack))

    val spark = SparkTestSession.spark
    val nRaw = spark.read.parquet(
      Tables.dependencyPath(root, snap).toString).count()
    val nClean = spark.read.parquet(
      Tables.tablePath(root, clean).toString).count()
    val nDedup = spark.read.parquet(
      Tables.tablePath(root, dedup).toString).count()
    assert(nRaw === 500)
    assert(nClean < nRaw, "quality gate dropped short/long docs")
    assert(nDedup < nClean, "near-dup pass removed pair losers")
    val deconDf = spark.read.parquet(Tables.tablePath(root, decon).toString)
    val nDecon = deconDf.count()
    assert(nDecon < nDedup, "decontamination dropped the eval slice + hits")
    val nPpl = spark.read.parquet(Tables.tablePath(root, ppl).toString).count()
    assert(nPpl < nDecon, "perplexity gate dropped the worst-NLL tail")
    val packed = spark.read.parquet(Tables.tablePath(root, pack).toString)
    assert(packed.count() === nPpl, "packing preserves every survivor")
    // every bin respects the budget unless it holds a single oversize doc
    val badBins = graft.api.Packing.binStats(packed, 200L)
      .filter(col("fill") > 200 && col("n_docs") > 1)
      .count()
    assert(badBins === 0)

    // Merkle incrementality across the whole pipeline
    assert(shelf.run() === Seq.empty)
    // provenance flows: pack table inherited via its 5-step dep chain
    val meta = Yaml.load(Snapshots.metadataPath(root, pack))
    assert(meta("execution").asInstanceOf[Map[String, Any]]("status") === "success")
  }
}
