package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries so plan
  * regressions (lost pushdown, missed broadcast, surprise shuffles) are
  * visible. Usage: ExplainCheck [sfDir] [query...]
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "q_scan_project", "q_filter_pred", "q_join_multiway", "q_agg_group",
      "q_join_bucketed", "q_agg_bucketed", "q_dedup_minhash", "q_dedup_incr",
      "q_sim_cosine", "q_sample_det", "q_join_asof", "q_typed_agg",
      "q_sim_ann_ivf", "q_decontaminate", "q_pack_greedy", "q_pipeline_e2e",
      "q_text_bm25", "q_sim_quant", "q_sim_rp", "q_text_perplexity",
      "q_sketch_cms", "q_pipeline_chunks", "q_mix_temperature",
      "q_dedup_keep_best", "q_text_hashtf", "q_evt_funnel",
      "q_text_rep_ngram", "q_dedup_segments", "q_stats_length_pct",
      "q_dedup_span_removal", "q_dedup_span_gram", "q_token_count_bpe",
      "q_bpe_encode", "q_sim_ivf_pq", "q_mm_video_meta",
      "q_text_prefix_boiler", "q_dedup_paragraph", "q_dedup_paragraph_incr",
      "q_pack_shuffle", "q_quality_gopher", "q_decontam_fuzzy",
      "q_mix_upsample", "q_dedup_exact_norm")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
