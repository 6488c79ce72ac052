package graft.api

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** [[TxTable]] as a REGISTERED Spark data source — the integration that
  * turns the commit-log table layer from a function API into a table
  * format a Spark user (or plain SQL) reads like any other:
  *
  * {{{
  *   spark.read.format("txtable").load(path)                    // head
  *   spark.read.format("txtable")
  *     .option("versionAsOf", 2).load(path)                     // time travel
  *   CREATE TABLE t USING txtable LOCATION '/data/events'       -- SQL DDL
  * }}}
  *
  * Built on the PUBLIC V1 source API (`RelationProvider` +
  * `PrunedFilteredScan`), the same integration seam Delta predated
  * DSv2 with: Catalyst pushes the query's conjunctive filters into
  * [[TxTableRelation.buildScan]], which maps them onto the COMMIT
  * LOG's recorded metadata — cluster-column ranges, z-order
  * rectangles, bloom point-sets ([[TxTable.prunedFiles]]) — so a
  * WHERE clause prunes data files from the log alone before Spark
  * lists or reads them, exactly what [[TxTable.readRange]] /
  * [[TxTable.readBox]] / [[TxTable.readPoints]] do for programmatic
  * callers (all four paths evaluate the SAME shared per-file
  * predicates), but driven by the optimizer. Everything below the
  * pruning is the ordinary parquet reader: full codegen, footer
  * pushdown, column pruning via `requiredColumns`.
  *
  * Correctness stance: [[TxTableRelation.unhandledFilters]] returns
  * EVERY filter, so Spark re-applies the real predicates above the
  * scan — log pruning is an optimization and can never change results
  * (the conservative direction [[TxTable.prunedFiles]] guarantees).
  */
class TxTableSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "txtable"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "txtable needs a path: spark.read.format(\"txtable\").load(path)"))
    val spark = sqlContext.sparkSession
    val head = TxTable.latestVersion(spark, path)
    val version = parameters.get("versionAsOf").map(_.toLong) match {
      case Some(v) =>
        // hard-validate the bound: folding "everything <= v" would
        // silently serve the HEAD for any too-large v — a pinned
        // report would read wrong-snapshot data with no error
        require(v >= 1 && v <= head,
          s"versionAsOf $v out of range for $path (versions 1..$head)")
        v
      case None => head
    }
    TxTableRelation(sqlContext, path, version)
  }
}

object TxTableSource {
  /** Test observability: the relative file names the most recent
    * buildScan ON THIS THREAD kept after log pruning (the spec pins
    * pruning without reaching into the scan's internals). Thread-local
    * because V1 buildScan runs on the thread planning the action —
    * concurrent queries on other threads must not clobber an
    * observer's value. Not a public API.
    */
  private[graft] val lastScanFiles =
    ThreadLocal.withInitial[Seq[String]](() => Nil)
}

case class TxTableRelation(sqlc: SQLContext, path: String, version: Long)
    extends BaseRelation with PrunedFilteredScan {

  private def spark = sqlc.sparkSession

  /** ONE log fold per relation: schema and every buildScan derive from
    * this snapshot instead of re-listing and re-folding the log per
    * step (several object-store round-trips each on the S3-shaped
    * deployments this layer targets). Sound because the version is
    * pinned at construction and data files are immutable.
    */
  private lazy val state: TxTable.State =
    TxTable.snapshotState(spark, path, version)

  override def sqlContext: SQLContext = sqlc

  override val schema: StructType = {
    require(state.files.nonEmpty, s"version $version of $path holds no files")
    spark.read.parquet(s"$path/${state.files.head}").schema
  }

  /** Log pruning never substitutes for evaluation: Spark re-applies
    * every predicate above the scan.
    */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val (ranges, points) = TxTableRelation.constraints(filters)
    val kept = TxTable.prunedFiles(state, ranges, points)
    TxTableSource.lastScanFiles.set(kept)
    val base: DataFrame =
      if (kept.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      else
        spark.read.schema(schema).parquet(kept.map(f => s"$path/$f"): _*)
    // column pruning: an empty projection (count(*)-style scans) still
    // needs the right ROW COUNT, so keep the frame and drop the fields.
    // Names are backtick-quoted — a parquet column named "a.b" is legal
    // and a bare col("a.b") would misparse it as a struct field path.
    base.select(requiredColumns.toIndexedSeq.map(n =>
      org.apache.spark.sql.functions.col(
        "`" + n.replace("`", "``") + "`")): _*).rdd
  }
}

object TxTableRelation {

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long              => Some(l)
    case i: Int               => Some(i.toLong)
    case s: Short             => Some(s.toLong)
    case b: Byte              => Some(b.toLong)
    case _                    => None
  }

  /** Map Catalyst's pushed conjunction onto the log metadata's two
    * constraint shapes. Conservative by construction: anything not
    * recognized (Or, string predicates, IsNull, casts…) contributes no
    * constraint, multiple bounds on one column intersect (the filters
    * array is a conjunction), and open bounds use the INCLUSIVE
    * neighbor so a file on the boundary is never dropped.
    */
  private[graft] def constraints(filters: Array[Filter])
      : (Map[String, (Long, Long)], Map[String, Seq[Long]]) = {
    var ranges = Map.empty[String, (Long, Long)]
    var points = Map.empty[String, Seq[Long]]
    def tighten(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = ranges.getOrElse(c, (Long.MinValue, Long.MaxValue))
      ranges += c -> (math.max(l0, lo), math.min(h0, hi))
    }
    def walk(f: Filter): Unit = f match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(c, v) => asLong(v).foreach { x =>
        tighten(c, x, x)
        points += c -> (points.getOrElse(c, Nil) :+ x).distinct
      }
      case In(c, vs) =>
        val ls = vs.toSeq.flatMap(asLong)
        if (ls.nonEmpty && ls.size == vs.length) {
          tighten(c, ls.min, ls.max)
          points += c -> (points.getOrElse(c, Nil) ++ ls).distinct
        }
      case GreaterThan(c, v)        => asLong(v).foreach(x => tighten(c, x, Long.MaxValue))
      case GreaterThanOrEqual(c, v) => asLong(v).foreach(x => tighten(c, x, Long.MaxValue))
      case LessThan(c, v)           => asLong(v).foreach(x => tighten(c, Long.MinValue, x))
      case LessThanOrEqual(c, v)    => asLong(v).foreach(x => tighten(c, Long.MinValue, x))
      case _ => () // unrecognized: contributes no pruning constraint
    }
    filters.foreach(walk)
    (ranges, points)
  }
}
