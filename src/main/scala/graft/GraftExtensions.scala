package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarity, MinHashAgg, SimHashAgg, VectorDot}

/** Library entry point for `spark.sql.extensions`: installs every graft
  * Catalyst function at session build time, so a cluster user gets
  * `vec_dot` / `cosine_sim` / `minhash_sig` / `simhash_sig` in SQL with
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * and no imperative `register(spark)` calls. The in-library call sites
  * keep their idempotent `register` fallbacks so the APIs also work on
  * vanilla sessions (both paths build the same Expression instances).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")

    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - exact dot product of two double arrays"),
      exprs => VectorDot(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(tok, k) - k-permutation MinHash signature of the group"),
      exprs => MinHashAgg(exprs(0), MinHashAgg.extractK(exprs(1)))))

    ext.injectFunction((FunctionIdentifier("simhash_sig"),
      info("simhash_sig", "simhash_sig(tok) - 64-bit SimHash signature of the group"),
      exprs => SimHashAgg(exprs.head)))

    ext.injectFunction((FunctionIdentifier("nearest_centroid"),
      info("nearest_centroid", "nearest_centroid(v, cents) - id of the cosine-nearest (id, vector) struct"),
      exprs => graft.functions.NearestCentroid(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("vec_sum_agg"),
      info("vec_sum_agg", "vec_sum_agg(v) - elementwise sum of the group's double arrays"),
      exprs => graft.functions.VectorSumAgg(exprs.head)))

    ext.injectFunction((FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size",
        "sorted_intersect_size(a, b) - |a intersect b| of two sorted distinct string arrays"),
      exprs => graft.functions.SortedIntersectSize(exprs(0), exprs(1))))
  }
}
