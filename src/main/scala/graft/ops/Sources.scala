package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.H._

/** Source/sink round-trips beyond parquet: CSV and JSON-lines, the two
  * ingest formats the reference snapshots most often carry
  * (/root/reference/src/shelf/__init__.py:207-233 ingests arbitrary
  * files; tables read them via DuckDB's read_csv/read_json). Spark
  * writes the format, reads it back, and the DuckDB oracle reads the
  * SAME files — so the round-trip (writer dialect, header, type
  * inference) is what's verified, not just the query on top.
  *
  * Scale note: the writes keep Spark's native partitioned layout (one
  * file per partition, glob-read back); `coalesce(1)` is NOT used —
  * single-file output is a driver-side bottleneck at 100 TB.
  */
object Sources {

  /** Shared scratch root: Verify and the oracle compare always run
    * back-to-back on the same sf-dir, so last-writer-wins is safe and
    * keeps the oracle SQL (a static string) path-stable.
    */
  private def ioDir(dir: String) = "/tmp/graft_io"

  private val written =
    scala.collection.concurrent.TrieMap[(Int, String, String), Unit]()

  private def ensure(s: SparkSession, dir: String, fmt: String)
                    (write: String => Unit): String = {
    val out = s"${ioDir(dir)}/$fmt"
    written.getOrElseUpdate((System.identityHashCode(s), dir, fmt), write(out))
    out
  }

  private def oraclePath(fmt: String) = s"/tmp/graft_io/$fmt"

  val qs: Seq[Q] = Seq(

    // CSV round-trip: Spark writes headered CSV partitions of a 4-column
    // orders projection, reads them back with an explicit schema, and
    // aggregates; DuckDB reads the same files.
    Q("q_src_csv",
      Some(s"""SELECT o_orderpriority, count(*) AS n,
                      ${oSum("o_totalprice")} AS total
               FROM read_csv('${oraclePath("csv")}/*.csv',
                             header = true, columns = {
                               'o_orderkey': 'BIGINT', 'o_custkey': 'BIGINT',
                               'o_orderpriority': 'VARCHAR', 'o_totalprice': 'DOUBLE'})
               GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val path = ensure(s, dir, "csv") { out =>
          t(s, dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
            .write.mode("overwrite").option("header", "true").csv(out)
        }
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
          StructField("o_orderpriority", StringType),
          StructField("o_totalprice", DoubleType)))
        s.read.option("header", "true").schema(schema).csv(path)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_orderpriority")
      }),

    // JSON-lines round-trip: nation enriched with a nested struct, read
    // back with schema inference on the Spark side and read_json on the
    // DuckDB side.
    Q("q_src_jsonl",
      Some(s"""SELECT n_regionkey, count(*) AS n_nations,
                      min(meta.name_len) AS min_len, max(meta.name_len) AS max_len
               FROM read_json('${oraclePath("jsonl")}/*.json',
                              format = 'newline_delimited', columns = {
                                'n_nationkey': 'BIGINT', 'n_regionkey': 'BIGINT',
                                'meta': 'STRUCT(name_len BIGINT, upper VARCHAR)'})
               GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val path = ensure(s, dir, "jsonl") { out =>
          t(s, dir, "nation")
            .select(col("n_nationkey"), col("n_regionkey"),
              struct(length(col("n_name")).cast("long").as("name_len"),
                upper(col("n_name")).as("upper")).as("meta"))
            .write.mode("overwrite").json(out)
        }
        s.read.json(path)
          .groupBy("n_regionkey")
          .agg(count(lit(1)).as("n_nations"),
            min(col("meta.name_len")).as("min_len"),
            max(col("meta.name_len")).as("max_len"))
          .orderBy("n_regionkey")
      }),

    // Exact interpolated percentiles: Spark `percentile` and DuckDB
    // `quantile_cont` share (1-f)*lo + f*hi semantics; 6dp rounding
    // absorbs the one-ulp fp differences of the interpolation.
    Q("q_percentile",
      Some("""SELECT l_returnflag,
                     ROUND(CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE), 6) AS p25,
                     ROUND(CAST(quantile_cont(l_extendedprice, 0.5)  AS DOUBLE), 6) AS p50,
                     ROUND(CAST(quantile_cont(l_extendedprice, 0.9)  AS DOUBLE), 6) AS p90
              FROM lineitem GROUP BY 1 ORDER BY 1"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"))
        .orderBy("l_returnflag"))
  )
}
