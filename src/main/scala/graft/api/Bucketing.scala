package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-partitioned, pre-sorted) tables: the shuffle-elision
  * path for repeated large-table joins and aggregations.
  *
  * At 100 TB, a fact⋈fact join shuffles both sides on every query. The
  * reference re-materializes every step as flat parquet
  * (/root/reference/src/shelf/tables.py:60-66) and so pays the
  * equivalent cost (a full DuckDB re-partition) per query. Writing the
  * fact tables ONCE bucketed+sorted by their join key makes every later
  * join/agg on that key shuffle-free AND sort-free: Catalyst matches the
  * table's `HashPartitioning(key, n)` output partitioning against the
  * join's required distribution and plans a zero-exchange SortMergeJoin.
  *
  * Scale contract: bucket count is chosen once per table family and
  * must divide evenly into executor parallelism; both join sides must
  * use the SAME count (Spark 3.1+ can coalesce mismatched buckets, but
  * same-count is the predictable path).
  */
object Bucketing {

  /** Bucketed copies are session-external tables written once per
    * (session, sfDir) under memory-backed storage when available.
    */
  private val done =
    scala.collection.concurrent.TrieMap[(Int, String, String), String]()

  /** Scratch root shared by every persisted-index artifact. */
  private[graft] def scratchBase: String = base

  private def base: String =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bucketed"
    else sys.props("java.io.tmpdir") + "/graft-bucketed"

  /** Drop this session's bucketed tables and forget them (Graft.clear). */
  private[graft] def clearTables(s: SparkSession): Unit = done.synchronized {
    val id = System.identityHashCode(s)
    done.keys.filter(_._1 == id).foreach { k =>
      done.remove(k).foreach(tbl => s.sql(s"DROP TABLE IF EXISTS $tbl"))
    }
  }

  /** Write `df` as a bucketed+sorted external table; idempotent per
    * session. Returns the table name to read back.
    */
  def ensureBucketed(s: SparkSession, sfDir: String, name: String,
                     df: => DataFrame, key: String,
                     buckets: Int = 8): String = {
    val tag = math.abs(sfDir.hashCode).toString
    val tbl = s"graft_bk_${name}_$tag"
    // synchronized: concurrent queries (q_join_bucketed ∥ q_agg_bucketed
    // in Bench) must not race the same table write — TrieMap's
    // getOrElseUpdate can evaluate the thunk twice under contention.
    done.synchronized {
      done.getOrElseUpdate((System.identityHashCode(s), sfDir, name), {
        df.write
          .format("parquet")
          .bucketBy(buckets, key)
          .sortBy(key)
          .option("path", s"$base/$tbl")
          .mode("overwrite")
          .saveAsTable(tbl)
        tbl
      })
    }
  }

  /** orders⋈customer on custkey with both sides bucketed on the join
    * key: zero-shuffle, zero-sort SortMergeJoin (asserted by
    * BucketingSpec on the executed plan).
    */
  def colocatedOrdersCustomer(s: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.H.t
    val ot = ensureBucketed(s, sfDir, "orders",
      t(s, sfDir, "orders"), "o_custkey")
    val ct = ensureBucketed(s, sfDir, "customer",
      t(s, sfDir, "customer"), "c_custkey")
    // `merge` hint pins SortMergeJoin so the bucket layout (not a
    // broadcast of the small test-SF dim) is what's exercised.
    s.table(ot).hint("merge")
      .join(s.table(ct), col("o_custkey") === col("c_custkey"))
  }

  /** Aggregation on the bucket key: partial+final agg collapse into one
    * stage with no exchange, because the scan already satisfies the
    * required `ClusteredDistribution(o_custkey)`.
    */
  def bucketedAgg(s: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.H.{t, dsum}
    val ot = ensureBucketed(s, sfDir, "orders",
      t(s, sfDir, "orders"), "o_custkey")
    s.table(ot)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total"))
  }
}
