package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share exact
  * word n-grams with an evaluation/benchmark set — the GPT-3/PaLM-style
  * contamination check that must run before any eval claim. Unlike
  * near-dup detection (an any-vs-any problem needing LSH), this is
  * one-sided exact matching against a SMALL trusted set, so the scale
  * shape is different and simpler:
  *
  *  - the eval side is benchmark-sized (10³–10⁶ shingles), so its
  *    exploded posting list is BROADCAST — the 100 TB corpus streams
  *    once through a map-side hash join with no corpus shuffle for
  *    candidate generation;
  *  - the only shuffle is the per-doc aggregation of hits, whose input
  *    is already filtered to colliding (doc, gram) rows — at sane
  *    contamination rates a vanishing fraction of the corpus.
  *
  * Inputs are shingle frames in [[Dedup.shingles]] format
  * (doc_id, toks: array<string> — distinct n-grams per doc).
  */
object Decontamination {

  /** Per contaminated corpus doc: how many of its distinct n-grams occur
    * anywhere in the eval set (`n_gram_hits`), how many distinct eval
    * docs it collides with (`n_eval_docs`), the doc's shingle count
    * (`n_grams`), and the contaminated fraction of its shingle set
    * (`hit_frac`, 6dp — display only; thresholding uses the exact
    * counts). Docs with zero hits are absent — the common case at
    * scale, which keeps the aggregation input small.
    */
  def contaminationReport(corpusSh: DataFrame, evalSh: DataFrame): DataFrame = {
    val exC = corpusSh.select(col("doc_id"), explode(col("toks")).as("tok"))
    val exE = evalSh.select(col("doc_id").as("eval_id"),
      explode(col("toks")).as("tok"))
    val hits = exC.join(broadcast(exE), "tok")
      .groupBy("doc_id")
      .agg(countDistinct(col("tok")).as("n_gram_hits"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
    // sizes come from the (large) corpus side; the aggregated hit set is
    // small at sane contamination rates — but it is NOT bounded by
    // construction (a leaked benchmark mirrored across the crawl makes
    // it corpus-shaped), so no hint: AQE broadcasts it when it is small
    // and shuffle-joins when contamination is pathological, instead of
    // the hint turning a dirty corpus into a driver OOM
    val sz = corpusSh.select(col("doc_id"), size(col("toks")).as("sz"))
    sz.join(hits, "doc_id")
      .select(col("doc_id"), col("n_gram_hits"), col("n_eval_docs"),
        col("sz").cast("long").as("n_grams"),
        round(col("n_gram_hits") / col("sz"), 6).as("hit_frac"))
  }

  /** FUZZY decontamination: flag corpus docs whose shingle-set Jaccard
    * against any eval doc reaches `threshold` — the near-duplicate
    * contamination an exact n-gram report misses (a paraphrased or
    * lightly-edited benchmark copy shares most shingles but few long
    * exact runs). Per flagged doc: how many eval docs it matches and
    * the best Jaccard. Exact arithmetic (inverted-index candidates +
    * true Jaccard verification — candidate recall is total for any
    * threshold > 0), so an oracle replays it in plain SQL.
    *
    * Scale shape: candidates come ONLY from cross (corpus × eval)
    * postings joined on the token key — never corpus × corpus; the
    * eval side is benchmark-sized, so the posting join is broadcast by
    * AQE and the verification aggregation carries candidate pairs
    * (bounded by eval postings), not the corpus.
    */
  def fuzzyContamination(corpusSh: DataFrame, evalSh: DataFrame,
                         threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val exC = corpusSh.select(col("doc_id").as("c_id"),
      explode(col("toks")).as("tok"))
    val exE = evalSh.select(col("doc_id").as("e_id"),
      explode(col("toks")).as("tok"))
    val inter = exC.join(exE, "tok")
      .groupBy("c_id", "e_id").agg(count(lit(1)).as("inter"))
    val szC = corpusSh.select(col("doc_id").as("c_id"),
      size(col("toks")).as("sa"))
    val szE = evalSh.select(col("doc_id").as("e_id"),
      size(col("toks")).as("sb"))
    inter.join(szC, "c_id").join(szE, "e_id")
      .withColumn("jaccard",
        col("inter") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("c_id").as("doc_id"))
      .agg(count(lit(1)).as("n_eval_matches"),
        round(max(col("jaccard")), 4).as("max_jaccard"))
  }

  /** Remove corpus docs whose contaminated shingle fraction exceeds
    * `maxHitFrac` (default 0.0 = any shared n-gram drops the doc — the
    * conservative eval-hygiene setting). The comparison is exact
    * integer arithmetic (`n_gram_hits > maxHitFrac · n_grams`), not the
    * report's 6dp display rounding — at 6dp a book-length doc with one
    * genuine eval hit would round to 0.0 and leak through.
    */
  def dropContaminated(docs: DataFrame, idCol: String, corpusSh: DataFrame,
                       evalSh: DataFrame, maxHitFrac: Double = 0.0): DataFrame = {
    val flagged = contaminationReport(corpusSh, evalSh)
      .filter(col("n_gram_hits") > lit(maxHitFrac) * col("n_grams"))
      .select(col("doc_id").as(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }
}
