package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality pass every lake runs on ingest:
  * one row per column with null count, exact distinct count, and
  * min/max rendered as strings (so heterogenous column types share one
  * output schema). The whole profile is ONE aggregation pass over the
  * table (all per-column aggregates fused into a single job — at
  * 100 TB the scan dominates, so one pass for 5 columns costs a fifth
  * of five single-column passes), unpivoted to rows afterwards.
  *
  * Exact distinct (not approx) keeps the result engine-replayable;
  * partial aggregation bounds the shuffle at the per-partition distinct
  * set. Callers profiling a high-cardinality column at extreme scale
  * can pre-project to the columns they need.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).minus(count(col(c))).cast("long").as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one struct per column, exploded to (column, ...) rows in
    // the caller's column order
    val rows = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"__nn_$c").as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__mn_$c").as("min_str"),
      col(s"__mx_$c").as("max_str"))): _*)
    one.select(explode(rows).as("p")).select("p.*")
  }
}
