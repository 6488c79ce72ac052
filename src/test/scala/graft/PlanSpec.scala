package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the scale properties we rely on
  * (pushdown, pruning, broadcast joins) must survive refactors — a
  * correct-but-full-scan plan is a silent 100x regression at 100 TB.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("projection prunes the parquet read schema") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      s"expected 3-column ReadSchema in:\n$p")
  }

  test("filters push down to the parquet scan") {
    val p = plan("q_filter_pred")
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThan(l_quantity,30.0)"),
      s"expected pushed filters in:\n$p")
  }

  test("dimension joins broadcast (no fact-side shuffle)") {
    assert(plan("q_join_inner").contains("BroadcastHashJoin"))
    val star = plan("q_join_multiway")
    assert("BroadcastHashJoin".r.findAllIn(star).size === 4,
      "5-way star = 4 broadcast joins against the streamed fact table")
    assert(!star.contains("SortMergeJoin"), "no SMJ in the star at test scale")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("q_limit_topk").contains("TakeOrderedAndProject"))
  }

  test("partition-pruned scan over a hive-partitioned table output") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("pp").resolve("t.parquet")
    spark.read.parquet(s"$sfDir/customer.parquet")
      .write.partitionBy("c_mktsegment").parquet(out.toString)
    val plan = spark.read.parquet(out.toString)
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"),
      s"expected partition filters in:\n$plan")
  }

  test("partitioned source query prunes partitions at the scan") {
    val p = plan("q_src_partitioned")
    assert(p.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      s"expected partition pruning in:\n$p")
  }

  test("aggregation is two-phase (partial before shuffle)") {
    val p = plan("q_agg_group")
    // partial_ prefix marks map-side combine in HashAggregate
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
  }

  test("AQE splits skewed join partitions at runtime") {
    import org.apache.spark.sql.functions._
    // child session: aggressive skew thresholds, broadcast disabled so
    // the join stays a (skew-splittable) SortMergeJoin
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val left = s.range(300000).select(
      when(col("id") < 290000, 0L).otherwise(pmod(col("id"), lit(100))).as("k"),
      col("id").as("payload"))
    val right = s.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    val j = left.join(right, "k")
    // collect() (not count()) so THIS DataFrame's adaptive plan is the
    // one that executes and finalizes — count() builds a separate tree
    assert(j.collect().length === 300000)
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"expected runtime skew-join splitting in:\n$p")
  }

  test("large-large joins still plan SortMergeJoin under " +
      "preferSortMergeJoin=false") {
    import org.apache.spark.sql.functions._
    // SparkConfig sets preferSortMergeJoin=false session-wide so
    // iterative ops get SHJ (build the small per-round side, stream
    // the big persisted one). SHJ has NO sort-spill fallback on the
    // build side, so the guard that matters at 100 TB is Spark's size
    // condition: a join where NEITHER side is much smaller must stay
    // SortMergeJoin. Pin that here (VERDICT r21 item 6) — broadcast
    // disabled and the build-by-size threshold forced low so the size
    // gate, not the local fixture's tiny stats, decides.
    val s = spark.newSession()
    s.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val li2 = s.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val p = li.join(li2, "l_orderkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"),
      s"equal-sized large-large join must plan SMJ (spillable), got:\n$p")
    assert(!p.contains("ShuffledHashJoin"),
      s"SHJ on an equal-sized pair risks build-side OOM at scale:\n$p")
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    import org.apache.spark.sql.functions._
    // At 100 TB the defaults engage on their own (application-side scan
    // threshold is 10 GB); the local fixture needs the thresholds
    // lowered to demonstrate the same plan shape.
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "500MB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
    val o = s.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT") // selective build side
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
    j.collect() // finalize the adaptive plan on THIS DataFrame
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("bloom_filter_agg") && p.contains("might_contain"),
      s"expected an injected runtime bloom filter in:\n$p")
  }

  test("IVF centroid assignment is a zero-shuffle projection") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = api.Similarity.ivfIndex(e, e.filter(col("vec_id") < 16),
      "vec_id", "embedding")
    val p = idx.queryExecution.executedPlan.toString
    // centroids fold to one broadcast row; per-vector argmax is a pure
    // projection — the old crossJoin+window shape shuffled corpus×k rows.
    // The only allowed Exchange is the SinglePartition fold of the k
    // centroid rows; a hash/range partitioning exchange would mean the
    // CORPUS is being shuffled.
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected broadcast attach in:\n$p")
    assert(!p.contains("Exchange hashpartitioning")
        && !p.contains("Exchange rangepartitioning"),
      s"assignment must not shuffle the corpus:\n$p")
    assert(!p.contains("Window"), s"no window sort in assignment:\n$p")
  }

  test("bucketed IVF probe prunes to the probed cells' buckets") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tbl = api.Similarity.ivfIndexBucketed(spark, sfDir, e,
      e.filter(col("vec_id") < 16), "vec_id", "embedding")
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("long").as("cent_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cv"))
    val probe = api.Similarity.ivfSearchPruned(spark, tbl, cents,
      queryId = 1, k = 10, nProbe = 4)
    val p = probe.queryExecution.executedPlan.toString
    // the literal IN over the bucket column must prune the scan: reading
    // all buckets means per-query IO is the whole index
    assert(p.contains("SelectedBucketsCount"),
      s"expected a bucket-pruned scan in:\n$p")
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(p).get
    assert(sel.group(1).toInt < sel.group(2).toInt,
      s"probe must touch a strict subset of buckets:\n$p")
  }

  test("ivfSearchPruned leaves the caller's session conf untouched") {
    import org.apache.spark.sql.functions._
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val before = spark.conf.get(key)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tbl = api.Similarity.ivfIndexBucketed(spark, sfDir, e,
      e.filter(col("vec_id") < 16), "vec_id", "embedding")
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("long").as("cent_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cv"))
    val probe = api.Similarity.ivfSearchPruned(spark, tbl, cents,
      queryId = 1, k = 10, nProbe = 4)
    assert(probe.count() > 0)
    // the probe flag must be scoped to the child session: a leak here
    // silently changes plan selection for every later bucketed query
    assert(spark.conf.get(key) === before,
      "ivfSearchPruned must not mutate the caller's session conf")
    // and the pruning must still be in effect on the returned plan
    assert(probe.queryExecution.executedPlan.toString
      .contains("SelectedBucketsCount"))
  }

  test("decontamination joins the eval side as a broadcast") {
    // the candidate-generation join must be map-side (eval sets are
    // benchmark-sized): a SortMergeJoin here would shuffle the whole
    // exploded corpus on the shingle key at 100 TB
    val df = SparkEntry.queries("q_decontaminate")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast eval join in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side shuffle join in decontamination plan:\n$p")
  }

  test("greedy packing is one shuffle + secondary sort per stratum") {
    // next-fit packing needs exactly one Exchange (group by stratum) and
    // an in-partition sort on (stratum, doc_id); more exchanges would
    // mean the fold re-shuffles, a global sort would serialize strata
    val df = SparkEntry.queries("q_pack_greedy")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex === 1, s"expected 1 hash exchange, got $ex in:\n$p")
    assert(!p.contains("Exchange rangepartitioning") ||
      p.indexOf("Exchange rangepartitioning") < p.indexOf("MapGroups"),
      s"global sort below the packing fold in:\n$p")
  }

  test("funnel/ewma folds stream per-user (no collect_list array)") {
    // the round-6 rewrite: per-user events must flow through a
    // secondary-sort MapGroups fold — a collect_list aggregate would
    // materialize a power user's whole stream in one task (OOM under
    // event-count skew); exactly one hash exchange keys the fold
    // q_evt_funnel = funnelCounts: fold exchange + the tiny per-stage
    // count exchange; q_evt_ewma is the bare fold
    for ((q, wantEx) <- Seq("q_evt_funnel" -> 2, "q_evt_ewma" -> 1)) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect() // finalize the adaptive plan
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!p.contains("collect_list"), s"$q buffers per-user arrays:\n$p")
      assert(p.contains("MapGroups"), s"$q lost the streamed fold:\n$p")
      val ex = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(ex === wantEx, s"$q: expected $wantEx hash exchanges, got $ex in:\n$p")
    }
  }

  test("pmi top-k is TakeOrdered over broadcast totals (no global sort)") {
    val df = SparkEntry.queries("q_text_pmi")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"),
      s"pmi limit should be TakeOrdered, not a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"single-row totals should broadcast:\n$p")
  }

  test("tf-idf tokenizes the corpus once (df derives from tf)") {
    val df = graft.api.TextAnalysis.tfidfTopTerms(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    df.collect() // finalize the adaptive plan
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // only the final plan's operators
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // one explode over the raw docs: the document-frequency branch must
    // reuse the tf aggregate's exchange, not re-tokenize the corpus (a
    // second Generate doubles the dominant scan at corpus scale)
    val nGen = "Generate explode".r.findAllIn(p).length
    assert(nGen == 1, s"expected exactly 1 Generate, got $nGen in:\n$p")
  }

  test("bm25 tokenizes the corpus once and only the query terms' postings") {
    val df = graft.api.TextAnalysis.bm25TopDocs(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
      Seq("dup", "vector", "merge", "scan"))
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // exactly one explode: the doc-length branch is a pure projection
    // (no tokenize pass just to count tokens) and the df branch reuses
    // the tf exchange instead of re-tokenizing
    val nGen = "Generate explode".r.findAllIn(p).length
    assert(nGen == 1, s"expected exactly 1 Generate, got $nGen in:\n$p")
    // the query-term filter sits between the explode and the tf
    // aggregate (plans print parents first, so the Filter line appears
    // above the Generate line): the aggregated volume is the posting
    // lists, not the corpus tokens
    val fi = p.indexOf(" IN (dup")
    assert(fi >= 0 && fi < p.indexOf("Generate explode"),
      s"query-term filter must sit directly on the exploded tokens:\n$p")
  }

  test("quantized top-k is broadcast + TakeOrderedAndProject (no shuffle)") {
    val df = graft.api.Similarity.quantizedTopK(
      spark.read.parquet(s"$sfDir/embeddings.parquet"),
      "vec_id", "embedding", queryId = 1, k = 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not be a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the one-row query side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"quantized scoring must stream the index once, no shuffle join:\n$p")
  }

  test("quantized IVF search is broadcast-only (no shuffle join, no global sort)") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val df = graft.api.Similarity.ivfQuantizedTopK(
      e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 16),
      "vec_id", "embedding", queryId = 1, k = 10, nProbe = 4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not be a global sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the probed-cell and query joins must broadcast, never shuffle:\n$p")
  }

  test("IVF-PQ search is broadcast-only (no shuffle join, no global sort)") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val df = graft.api.Similarity.pqTopK(
      e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 16),
      "vec_id", "embedding", queryId = 1, k = 10, nProbe = 4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not be a global sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the probed-cell and query joins must broadcast, never shuffle:\n$p")
  }

  test("rp top-k is broadcast + TakeOrderedAndProject (no shuffle join)") {
    val df = graft.api.Similarity.rpTopK(
      spark.read.parquet(s"$sfDir/embeddings.parquet"),
      "vec_id", "embedding", queryId = 1, k = 10, dOut = 16)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not be a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the one-row query side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"projected scoring must stream the corpus once, no shuffle join:\n$p")
  }

  test("cms probes join the sketch as a broadcast") {
    val df = SparkEntry.queries("q_sketch_cms")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"),
      s"the (depth x width)-row sketch must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"probing a tiny sketch must never shuffle-join:\n$p")
  }

  test("perplexity broadcasts the vocabulary and context sides") {
    val df = SparkEntry.queries("q_text_perplexity")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // Round 21: the two OOV-mapping broadcast joins are GONE — the
    // ≤V-row vocabulary rides the plan as a literal inside the
    // codegen'd vocab_bigram_ids expression (the k-means driver-literal
    // discipline), so only the per-context join remains and it must
    // broadcast; the only shuffles ride on the packed bigram key and
    // doc_id.
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).size
    assert(nBroadcast >= 1,
      s"the context join must broadcast (got $nBroadcast):\n$p")
    assert(p.contains("vocab_bigram_ids"),
      s"bigram ids must come from the literal-vocab expression (no " +
        s"OOV-mapping joins):\n$p")
    val nJoins = "Join".r.findAllIn(p).size
    assert(nJoins <= 3,
      s"OOV mapping must not reappear as joins (got $nJoins):\n$p")
    // the model/scoring branches both hang off the per-doc bigram-count
    // aggregate (pbc), which is PERSISTED (Pins) since round 11: every
    // consumer (model, ctx via model, the scoring join) must read the
    // cached frame — the tokenize -> bigram-explode ->
    // double-broadcast-join subtree appears ONCE in the dag, not 3x
    // (a 3x corpus-scan multiplier at 100 TB without it). The logical
    // plan shows one InMemoryRelation per consumer; the raw
    // tokenize-side parquet scan of `documents` must appear ONLY under
    // cache-population, i.e. not at all in the outer optimized plan.
    val lp = df.queryExecution.optimizedPlan.toString
    val nCached = "InMemoryRelation".r.findAllIn(lp).size
    assert(nCached >= 2,
      s"pbc must be served from cache to both model and scoring " +
        s"branches (got $nCached InMemoryRelation):\n$lp")
    assert(p.contains("InMemoryTableScan"),
      s"executed plan must read pbc from cache:\n$p")
  }

  test("bucketed join is a zero-exchange SortMergeJoin") {
    val p = api.Bucketing.colocatedOrdersCustomer(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ in:\n$p")
    assert(!p.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$p")
    assert(p.contains("SelectedBucketsCount"), s"expected bucketed scan in:\n$p")
  }

  test("aggregation on the bucket key needs no exchange") {
    val p = api.Bucketing.bucketedAgg(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucket-key agg must be single-stage:\n$p")
  }

  test("near-dup pair pipeline forces no broadcast of a corpus-sized frame") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = api.Dedup.shingles(docs, "doc_id", "text")
    try {
      val pr = api.Dedup.nearDuplicatePairs(sh, 0.5)
      // the per-document size frame must reach the optimizer UNHINTED:
      // a forced broadcast() of a frame with one row per corpus document
      // caps the operator at Spark's 8 GB broadcast-table limit (driver
      // OOM at 10⁹ docs). Whether the size join broadcasts at a given SF
      // is AQE's sizing decision — the logical plan must carry no hint.
      val lp = pr.queryExecution.analyzed.toString
      assert(!lp.contains("ResolvedHint") && !lp.contains("UnresolvedHint"),
        s"no broadcast hints allowed in the near-dup pair pipeline:\n$lp")
    } finally sh.unpersist()
  }

  test("semantic dedup assigns once, cell-partitions once, and hints only the centroid fold") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = e.filter(col("vec_id") < 4)
    val out = api.Dedup.semanticDedup(e, cents, "vec_id", "embedding", 0.9)
    // the ONLY broadcast hint allowed is the 1-row folded centroid
    // array inside the assignment (it prints once per pre-cache subtree
    // reference) — a hint on the corpus-sized assigned frame would cap
    // the operator at the 8 GB broadcast limit. Every hint node must
    // therefore sit directly on the collect_list centroid fold.
    val lpLines = out.queryExecution.analyzed.toString.linesIterator.toSeq
    lpLines.zipWithIndex.filter(_._1.contains("ResolvedHint")).foreach {
      case (_, i) =>
        val next = lpLines.drop(i + 1).headOption.getOrElse("")
        assert(next.contains("Aggregate") && next.contains("collect_list"),
          s"broadcast hint on something other than the centroid fold:\n" +
            lpLines.mkString("\n"))
    }
    val p = out.queryExecution.executedPlan.toString
    // assignment is the zero-shuffle broadcast-fold argmax (the IVF
    // property), and the assigned frame materializes ONCE — every
    // consumer (both pair-join sides, the survivor side) reads the
    // cache instead of re-assigning the corpus
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroid assignment must be the broadcast-fold projection:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"assigned frame must be read from its one materialization:\n$p")
  }

  test("token-budget running sum never windows a whole source in one task") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = api.Mixing.tokenBudgetSample(docs, "doc_id", "source",
      "n_chars", Map("src0" -> 50000L, "src1" -> 20000L))
    val p = out.queryExecution.executedPlan.toString
    // the window spec must partition by (source, slice), not source
    // alone: partitionBy(source) sorts the ENTIRE source through a
    // single task — the 100-TB straggler this operator's two-phase
    // prefix design exists to avoid
    val winSpecs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty, s"expected a window in:\n$p")
    winSpecs.foreach(spec =>
      assert(spec.contains("__slice"),
        s"running-sum window must include the hash slice key, got ($spec) in:\n$p"))
  }

  test("prefix boilerplate joins the small hot set, never windows the corpus") {
    val p = plan("q_text_prefix_boiler")
    // the prefix counts must collapse map-side (partial agg) before any
    // exchange, and the doc-assignment join must be a broadcast of the
    // filtered hot-prefix set — templates are few even when documents
    // are not. A Window or SortMergeJoin here would mean the corpus is
    // being sorted/shuffled against itself.
    assert(p.contains("partial_count"),
      s"prefix counting must combine map-side in:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"hot-prefix assignment must broadcast the filtered set in:\n$p")
    assert(!p.contains("Window"), s"no corpus-wide window expected in:\n$p")
  }

  test("paragraph dedup: partial-min keeper, no corpus window") {
    // the keeper must be a map-side-combined min aggregation (a segment
    // repeated 10^6 times costs a combine) and NOTHING may window the
    // corpus; same contract for the incremental variant, whose corpus
    // side must enter as a LeftAnti join
    val p = plan("q_dedup_paragraph")
    assert(p.contains("partial_min"),
      s"keeper selection must combine map-side in:\n$p")
    assert(!p.contains("Window"), s"no corpus-wide window expected in:\n$p")
    val ip = plan("q_dedup_paragraph_incr")
    assert(ip.contains("partial_min"),
      s"incremental keeper must combine map-side in:\n$ip")
    assert(ip.contains("LeftAnti"),
      s"corpus index must join anti in:\n$ip")
    assert(!ip.contains("Window"), s"no corpus-wide window expected in:\n$ip")
  }

  test("shuffle order broadcasts slice offsets and windows per slice") {
    import org.apache.spark.sql.functions.col
    val p = api.Packing.shuffleOrder(
      spark.range(0, 5000).select(col("id").as("seq_id")), "seq_id", 7L)
      .queryExecution.executedPlan.toString
    // the 64-row offset table must broadcast; the rank window must be
    // keyed by the slice (a corpus-global window would put the whole
    // frame in one task)
    assert(p.contains("BroadcastHashJoin"),
      s"slice offsets must broadcast in:\n$p")
    assert(p.contains("windowspecdefinition(__slice"),
      s"rank window must partition by slice in:\n$p")
  }

  test("gopher quality flags are a zero-exchange map") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = api.TextAnalysis.gopherQualityFlags(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"rule flags must be pure map work, no shuffle in:\n$p")
  }

  test("embedding centroids collapse map-side; pair distances broadcast") {
    val cp = plan("q_embed_centroids")
    // the dim-fanned rows must combine in a partial hash aggregation
    // before the exchange: the shuffle then carries |labels|*dim partial
    // sums per mapper, never corpus*dim rows
    assert(cp.contains("partial_count") || cp.contains("partial_sum"),
      s"centroid aggregation must combine map-side in:\n$cp")
    assert(!cp.contains("Window") && !cp.contains("SortMergeJoin"),
      s"no window or corpus join expected in:\n$cp")
    // the pairwise-distance self-join runs over centroid-sized sides
    val dp = plan("q_embed_group_dist")
    assert(dp.contains("BroadcastNestedLoopJoin") || dp.contains("BroadcastHashJoin"),
      s"centroid pair join must broadcast in:\n$dp")
    assert(!dp.contains("SortMergeJoin"),
      s"no shuffle join between centroid frames in:\n$dp")
  }

  test("adaptive quality windows the score histogram, not the corpus") {
    val p = plan("q_quality_adaptive")
    // same contract as length percentiles: the per-source window may
    // only see (source, ppm, count) histogram rows — partial_count
    // below the window proves the corpus collapsed map-side first
    val winIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("partial_count")
    assert(winIdx >= 0 && aggIdx >= 0,
      s"expected both a window and a partial aggregation in:\n$p")
    assert(aggIdx > winIdx,
      s"histogram aggregation must feed the window, not follow it:\n$p")
  }

  test("length percentiles rank the histogram, not the raw rows") {
    val p = SparkEntry.queries("q_stats_length_pct")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the per-group window may only see (group, value, count) histogram
    // rows — a partial_count under the first exchange proves the corpus
    // collapsed in a map-side hash aggregation BEFORE any window ran,
    // so the one-task-per-group sort is bounded by |distinct values|,
    // not corpus rows
    val winIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("partial_count")
    assert(winIdx >= 0 && aggIdx >= 0,
      s"expected both a window and a partial aggregation in:\n$p")
    // executedPlan prints top-down: the aggregation must sit BELOW
    // (after, in print order) the window that consumes it
    assert(aggIdx > winIdx,
      s"histogram aggregation must feed the window, not follow it:\n$p")
  }
}
