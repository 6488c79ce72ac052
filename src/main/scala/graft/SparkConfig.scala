package graft

import org.apache.spark.sql.SparkSession

/** The one place scale-relevant session settings live. Verify, Bench,
  * the CLI, and the test session all build from here so a tuning change
  * propagates everywhere.
  *
  * The settings and why they matter at 100 TB:
  *  - `shuffle.partitions` = cores locally; on a real cluster size it so
  *    a partition is 100-200 MB post-filter (AQE coalesces the rest).
  *  - AQE on: runtime re-plan fixes stale size estimates at scale —
  *    skew-join splitting, dynamic coalescing, broadcast demotion.
  *  - `files.maxPartitionBytes` stays at the 128 MB default: lowering
  *    it globally (8 MB was tried) cannot split single-row-group
  *    files anyway — parquet byte-range splits bottom out at row-group
  *    granularity — and taxed EVERY scan with 16x the tasks under
  *    concurrent queries (+20% suite wall, measured). CPU-dense
  *    transforms over narrow scans are fixed where the density lives
  *    instead: [[graft.api.Par.spread]] round-robins those inputs only
  *    when the scan came back narrow, a no-op on wide 100 TB scans.
  *    On a real cluster raise this toward 512 MB if task startup
  *    dominates wide scans.
  *  - UTC session timezone: timestamp determinism across engines.
  *  - ANSI stays ON (Spark 4 default): silent overflow/cast corruption
  *    at row 10^12 is how large pipelines rot.
  */
object SparkConfig {

  def builder(appName: String, cpus: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Let AQE re-plan CACHED subtrees too (default false): without
      // it a persisted frame materializes at the static shuffle width
      // and every downstream consumer of the cache pays that many
      // tasks no matter how small the data — with it, cached-plan
      // partitioning is size-adaptive exactly like uncached exchanges
      // (profiled: the pinned dedup/pipeline frames were 32 tiny
      // partitions read by 32-task stages per consumer at sf0.1).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // Allow shuffled-hash join where its size conditions hold
      // (default prefers sort-merge): iterative ops join a large
      // persisted frame against a small per-round frame — SHJ builds
      // the small side and STREAMS the big one, where SMJ would
      // re-sort the big side every round.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // Spark 4 session-artifact isolation installs an
      // ExecutorClassLoader whose parent chain consults the driver's
      // RPC file server. Janino codegen compilation resolves EVERY
      // referenced type through that chain, and each MISS (janino
      // probes many nonexistent candidate names per compile) pays an
      // RPC download attempt while holding the classloader monitor —
      // thread dumps of the loaded bench phase showed executor threads
      // convoyed BLOCKED on that monitor behind a holder streaming
      // from NettyRpcEnv.FileDownloadChannel. This engine never adds
      // session artifacts (JARs/files land on the application
      // classpath), so isolation buys nothing and the classloader hop
      // is pure per-compile overhead — on a real cluster every
      // executor pays it on its first compile of each generated class.
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")

  /** Cpu count from the driver contract env, default 4. */
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
}
