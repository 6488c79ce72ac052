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

  /** Test observability: the inner parquet DataFrame the most recent
    * buildScan on this thread wrapped — the spec pins that the
    * re-applied filters reach the inner scan's PushedFilters (footer /
    * row-group skipping inside KEPT files), which the outer V1 plan
    * cannot show. Not a public API.
    */
  private[graft] val lastInnerFrame =
    ThreadLocal.withInitial[Option[DataFrame]](() => None)
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
    // the EFFECTIVE snapshot schema: the log-recorded one when the
    // table evolved (buildScan's .schema(...) read then null-fills the
    // added columns for pre-evolution files), else one footer
    TxTable.stateSchema(spark, path, state)
  }

  /** Log pruning never substitutes for evaluation: Spark re-applies
    * every predicate above the scan.
    */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val (ranges, points, strRanges) = TxTableRelation.constraints(filters)
    val kept = TxTable.prunedFiles(state, ranges, points, strRanges)
    TxTableSource.lastScanFiles.set(kept)
    val base: DataFrame =
      if (kept.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      else
        spark.read.schema(schema).parquet(kept.map(f => s"$path/$f"): _*)
    // Re-apply every translatable filter INSIDE the inner frame: since
    // unhandledFilters returns everything, Spark evaluates the real
    // predicates above this RDD[Row] — correct, but above the V1 seam
    // the parquet reader sees NO filter, so footer min/max row-group
    // skipping inside KEPT files never happens and every surviving row
    // pays materialization. Pushing the same conjuncts here restores
    // the skipping (Catalyst forwards them to the parquet scan's
    // PushedFilters); the double evaluation of a pushed predicate is
    // the standard V1 idiom and costs nothing measurable.
    val filtered = filters.toIndexedSeq
      .flatMap(TxTableRelation.toColumn)
      .reduceOption(_ && _)
      .fold(base)(base.filter)
    TxTableSource.lastInnerFrame.set(Some(filtered))
    // column pruning: an empty projection (count(*)-style scans) still
    // needs the right ROW COUNT, so keep the frame and drop the fields.
    // Names are backtick-quoted — a parquet column named "a.b" is legal
    // and a bare col("a.b") would misparse it as a struct field path.
    filtered.select(requiredColumns.toIndexedSeq.map(n =>
      org.apache.spark.sql.functions.col(
        "`" + n.replace("`", "``") + "`")): _*).rdd
  }
}

object TxTableRelation {

  /** Translate a pushed V1 Filter back into the EXACT Column expression
    * Catalyst derived it from, so the inner parquet scan can push it to
    * the footer level. Partial on purpose: a node with any
    * untranslatable child yields None (never a weaker approximation —
    * dropping rows the true predicate keeps would corrupt results,
    * since the re-application above the seam cannot resurrect them).
    * Each translated shape is the faithful inverse of
    * DataSourceStrategy's translation, so filtering by it drops exactly
    * the rows Spark's own re-evaluation would drop anyway.
    */
  private[graft] def toColumn(f: Filter)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    def q(n: String) = col("`" + n.replace("`", "``") + "`")
    f match {
      case EqualTo(a, v)            => Some(q(a) === lit(v))
      case EqualNullSafe(a, v)      => Some(q(a) <=> lit(v))
      case GreaterThan(a, v)        => Some(q(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(q(a) >= lit(v))
      case LessThan(a, v)           => Some(q(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(q(a) <= lit(v))
      case In(a, vs)                => Some(q(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a)                => Some(q(a).isNull)
      case IsNotNull(a)             => Some(q(a).isNotNull)
      case StringStartsWith(a, v)   => Some(q(a).startsWith(v))
      case StringEndsWith(a, v)     => Some(q(a).endsWith(v))
      case StringContains(a, v)     => Some(q(a).contains(v))
      case And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
      case Or(l, r)  => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
      case Not(x)    => toColumn(x).map(!_)
      case _         => None
    }
  }

  /** Bloom probes hash RAW LONGS ([[TxTable.bloomStats]]'s contract),
    * so only genuinely integral filter values may become point
    * constraints; range constraints additionally accept date/timestamp
    * values via [[TxTable.statLong]]'s exact stat encoding.
    */
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
    * neighbor so a file on the boundary is never dropped. Range bounds
    * accept integral AND date/timestamp values — `WHERE event_date >=
    * X` over a date-clustered table prunes from the log's epoch-day
    * ranges exactly like an id range does.
    */
  private[graft] def constraints(filters: Array[Filter])
      : (Map[String, (Long, Long)], Map[String, Seq[Long]],
         Map[String, (Option[String], Option[String])]) = {
    var ranges = Map.empty[String, (Long, Long)]
    var points = Map.empty[String, Seq[Long]]
    var strRanges = Map.empty[String, (Option[String], Option[String])]
    def tighten(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = ranges.getOrElse(c, (Long.MinValue, Long.MaxValue))
      ranges += c -> (math.max(l0, lo), math.min(h0, hi))
    }
    // string bounds intersect in UNSIGNED BYTE order — the order both
    // Spark (UTF8String) and the recorded parquet stats compare in
    def sTighten(c: String, lo: Option[String], hi: Option[String]): Unit = {
      def bmax(a: String, b: String) =
        if (java.util.Arrays.compareUnsigned(
          a.getBytes("UTF-8"), b.getBytes("UTF-8")) >= 0) a else b
      def bmin(a: String, b: String) =
        if (java.util.Arrays.compareUnsigned(
          a.getBytes("UTF-8"), b.getBytes("UTF-8")) <= 0) a else b
      val (l0, h0) = strRanges.getOrElse(c, (None, None))
      strRanges += c -> (
        (l0, lo) match {
          case (Some(a), Some(b)) => Some(bmax(a, b))
          case (a, b)             => a.orElse(b)
        },
        (h0, hi) match {
          case (Some(a), Some(b)) => Some(bmin(a, b))
          case (a, b)             => a.orElse(b)
        })
    }
    def stat(v: Any): Option[Long] = TxTable.statLong(v)
    def walk(f: Filter): Unit = f match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(c, v: String) => sTighten(c, Some(v), Some(v))
      case EqualTo(c, v) =>
        stat(v).foreach(x => tighten(c, x, x))
        asLong(v).foreach(x =>
          points += c -> (points.getOrElse(c, Nil) :+ x).distinct)
      case In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        val ss = vs.toSeq.map(_.asInstanceOf[String])
        sTighten(c, Some(ss.reduce((a, b) =>
            if (java.util.Arrays.compareUnsigned(
              a.getBytes("UTF-8"), b.getBytes("UTF-8")) <= 0) a else b)),
          Some(ss.reduce((a, b) =>
            if (java.util.Arrays.compareUnsigned(
              a.getBytes("UTF-8"), b.getBytes("UTF-8")) >= 0) a else b)))
      case In(c, vs) =>
        val ls = vs.toSeq.flatMap(stat)
        if (ls.nonEmpty && ls.size == vs.length)
          tighten(c, ls.min, ls.max)
        val ps = vs.toSeq.flatMap(asLong)
        if (ps.nonEmpty && ps.size == vs.length)
          points += c -> (points.getOrElse(c, Nil) ++ ps).distinct
      case GreaterThan(c, v: String)        => sTighten(c, Some(v), None)
      case GreaterThanOrEqual(c, v: String) => sTighten(c, Some(v), None)
      case LessThan(c, v: String)           => sTighten(c, None, Some(v))
      case LessThanOrEqual(c, v: String)    => sTighten(c, None, Some(v))
      case GreaterThan(c, v)        => stat(v).foreach(x => tighten(c, x, Long.MaxValue))
      case GreaterThanOrEqual(c, v) => stat(v).foreach(x => tighten(c, x, Long.MaxValue))
      case LessThan(c, v)           => stat(v).foreach(x => tighten(c, Long.MinValue, x))
      case LessThanOrEqual(c, v)    => stat(v).foreach(x => tighten(c, Long.MinValue, x))
      case _ => () // unrecognized: contributes no pruning constraint
    }
    filters.foreach(walk)
    (ranges, points, strRanges)
  }
}
