package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the merge-on-read READ cost: how much does a
  * handful of position deletes cost every later scan, before
  * maintenance purges them? Builds one ~10M-row table, lands ONE
  * 1000-key DV delete, and times a full-scan aggregate three ways:
  *
  *  - `native`  — the DV-free twin (`VERSION AS OF 1`, Spark's native
  *    columnar parquet scan);
  *  - `dv-col`  — the DV-bearing head through the COLUMNAR batch path
  *    (round 19: zero-copy pass-through for untouched batches,
  *    on-heap compaction only for batches containing deletions);
  *  - `dv-row`  — the same head forced through the serialized row
  *    branch (the pre-round-19 shape), for the before/after record.
  *
  * Each scenario also times a SELECTIVE point read on the cluster key
  * (round 20): DV-bearing scans keep parquet row-group pushdown —
  * position deletes key on the reader's row-index column — so
  * `sel_over_native` should sit near 1× (pre-round-20 it paid a
  * whole-candidate-file scan).
  *
  * Medians of 5 runs after a warmup; run on an idle host. Usage:
  *   scripts/run.sh graft.tools.DvScanBench [rows]
  */
object DvScanBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.api.TxTable

    def median(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
    def bench(q: String): Double = {
      spark.sql(q).collect() // warm
      median((1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(q).collect()
        (System.nanoTime() - t0) / 1e9
      })
    }
    val agg = "sum(length(s)) AS a, sum(d) AS b, count(*) AS c"

    def scenario(name: String, cond: org.apache.spark.sql.Column): Unit = {
      val w = java.nio.file.Files.createTempDirectory("dvbench").toString
      val cat = "dvb" + java.lang.Integer.toHexString(w.hashCode)
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.api.TxCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
      val t = s"$w/t"
      TxTable.overwriteClustered(spark,
        t,
        spark.range(rows).selectExpr(
          "id", "concat('text-', id % 100000) AS s",
          "CAST(id % 997 AS DOUBLE) AS d"),
        "id", numFiles = 32)
      TxTable.deleteWhereDv(spark, t, cond)
      val native = bench(s"SELECT $agg FROM $cat.t VERSION AS OF 1")
      val dvCol = bench(s"SELECT $agg FROM $cat.t")
      // the pre-round-19 branch, exactly: force the serialized row
      // path while the native twin keeps its vectorized plan
      spark.conf.set("spark.graft.dv.forceRowScan", "true")
      val dvRow = bench(s"SELECT $agg FROM $cat.t")
      spark.conf.unset("spark.graft.dv.forceRowScan")
      // SELECTIVE read (round 20): a point predicate on the cluster
      // key — row-group pushdown stays ON for DV-bearing scans (DV
      // application keys on the reader's row-index column), so the
      // DV'd head must prune inside files like its DV-free twin
      // instead of paying whole-candidate-file scans
      val selPred = s"id BETWEEN ${rows / 2} AND ${rows / 2 + 999}"
      val nativeSel =
        bench(s"SELECT $agg FROM $cat.t VERSION AS OF 1 WHERE $selPred")
      val dvSel = bench(s"SELECT $agg FROM $cat.t WHERE $selPred")
      println(f"""{"scenario":"$name","rows":$rows,""" +
        f""""native_sec":$native%.3f,""" +
        f""""dv_columnar_sec":$dvCol%.3f,"dv_row_sec":$dvRow%.3f,""" +
        f""""col_over_native":${dvCol / native}%.2f,""" +
        f""""row_over_native":${dvRow / native}%.2f,""" +
        f""""sel_native_sec":$nativeSel%.3f,"sel_dv_sec":$dvSel%.3f,""" +
        f""""sel_over_native":${dvSel / nativeSel}%.2f}""")
    }
    // point: 1000 contiguous keys — touches ~1 of 32 clustered files,
    // the shape merge-on-read is FOR; scatter: a modulo delete that
    // lands ~1 position in 41%% of every file's batches — worst case
    scenario("point", col("id").between(5000, 5999))
    scenario("scatter", col("id") % 9973 === 0)

    // CHURN: many SMALL dv commits (the verdict-#7 shape) — 1000+
    // single-key deletes leave 1000+ tiny del files at the head. This
    // evidences (a) the del-file metadata walk + distributed del-row
    // read at high file counts, and (b) the position-map cache's
    // retained-positions bound (entries are bounded by positions, not
    // del-file count). Smaller table so the commit loop stays bounded.
    val churnRows = math.min(rows, 20000000L)
    val churnCommits = args.lift(1).map(_.toInt).getOrElse(1000)
    locally {
      val w = java.nio.file.Files.createTempDirectory("dvchurn").toString
      val cat = "dvc" + java.lang.Integer.toHexString(w.hashCode)
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.api.TxCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
      val t = s"$w/t"
      TxTable.overwriteClustered(spark, t,
        spark.range(churnRows).selectExpr(
          "id", "concat('text-', id % 100000) AS s",
          "CAST(id % 997 AS DOUBLE) AS d"),
        "id", numFiles = 32)
      val t0 = System.nanoTime()
      var i = 0
      while (i < churnCommits) {
        TxTable.deleteWhereDv(spark, t,
          col("id") === (i.toLong * 37 + 11) % churnRows)
        i += 1
      }
      val commitSec = (System.nanoTime() - t0) / 1e9
      val head = TxTable.latestVersion(spark, t)
      val nDels = TxTable.snapshotState(spark, t, head).dels.size
      val native = bench(s"SELECT $agg FROM $cat.t VERSION AS OF 1")
      val dvCol = bench(s"SELECT $agg FROM $cat.t")
      val selPred = s"id BETWEEN ${churnRows / 2} AND ${churnRows / 2 + 999}"
      val nativeSel =
        bench(s"SELECT $agg FROM $cat.t VERSION AS OF 1 WHERE $selPred")
      val dvSel = bench(s"SELECT $agg FROM $cat.t WHERE $selPred")
      println(f"""{"scenario":"churn","rows":$churnRows,""" +
        f""""dv_commits":$churnCommits,"del_files":$nDels,""" +
        f""""commit_sec_total":$commitSec%.1f,""" +
        f""""native_sec":$native%.3f,"dv_columnar_sec":$dvCol%.3f,""" +
        f""""col_over_native":${dvCol / native}%.2f,""" +
        f""""sel_native_sec":$nativeSel%.3f,"sel_dv_sec":$dvSel%.3f,""" +
        f""""sel_over_native":${dvSel / nativeSel}%.2f}""")
    }
    spark.stop()
  }
}
