package graft.api

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{GraftTxParquetIndex, GraftV2Bridge}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource-V2 [[TableCatalog]] over [[TxTable]] commit logs — the
  * SQL-DML front door the V1 `format("txtable")` path cannot provide:
  *
  * {{{
  *   spark.sql.catalog.gx           = graft.api.TxCatalog
  *   spark.sql.catalog.gx.warehouse = /data/warehouse
  *
  *   CREATE TABLE gx.db.events (id BIGINT, v STRING)
  *   INSERT INTO gx.db.events VALUES ...           -- one append commit
  *   INSERT OVERWRITE gx.db.events SELECT ...      -- one overwrite commit
  *   SELECT * FROM gx.db.events VERSION AS OF 3    -- log time travel
  *   DELETE FROM gx.db.events WHERE id < 10        -- file-level rewrite
  *   UPDATE / MERGE INTO                           -- group-based copy-on-write
  * }}}
  *
  * Identifiers map to warehouse paths (`gx.db.t` →
  * `<warehouse>/db/t`), namespaces are directories, and a table IS its
  * `_txlog` — no separate metastore state to drift. Every statement
  * re-resolves [[loadTable]], so SQL reads always see the current head
  * (fresher than the V1 session-catalog route, which caches the
  * CREATE-time relation until `REFRESH TABLE`); each loaded table pins
  * ONE snapshot for the statement — the same per-relation isolation
  * `spark.read` promises.
  *
  * The V1 source (`TxTableSource`) stays the `format("txtable")` /
  * streaming route; this catalog is additive. Reference anchor: the
  * reference's tables are named entries in a catalog JSON resolved to
  * parquet paths (catalog.py:18, tables.py:62) — here the resolution
  * is a Spark catalog plugin and the parquet paths are transactional.
  */
class TxCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/"))
      .getOrElse(throw new IllegalArgumentException(
        s"TxCatalog '$name' needs spark.sql.catalog.$name.warehouse=<dir>"))
  }

  override def name(): String = catName

  private def spark = SparkSession.active
  private def fs = Dedup.hadoopFs(spark, warehouse)

  /** Identifier parts become path segments — path-inert names only
    * (no separators, no `..` traversal, nothing the commit log's JSON
    * could not carry).
    */
  private def part(s: String): String = {
    require(s.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*") && !s.contains(".."),
      s"TxCatalog identifiers must be path-inert " +
        s"([A-Za-z0-9_][A-Za-z0-9_.-]*): '$s'")
    s
  }

  private def pathOf(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq.map(part) :+ part(ident.name))
      .mkString("/")

  private def nsPath(ns: Seq[String]): String =
    (warehouse +: ns.map(part)).mkString("/")

  private def isTable(p: String): Boolean =
    fs.exists(new Path(s"$p/_txlog"))

  private def fullName(ident: Identifier): String =
    (catName +: ident.namespace.toSeq :+ ident.name).mkString(".")

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace.toSeq)
    if (!fs.exists(new Path(dir)))
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    fs.listStatus(new Path(dir)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => isTable(s"$dir/$n"))
      .sorted.map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(pathOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = pathOf(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    new TxV2Table(spark, p, fullName(ident), pinned = None)
  }

  /** SQL `VERSION AS OF v` — the commit log IS the version history. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"txtable versions are commit numbers, got '$version'")
    }
    val head = TxTable.latestVersion(spark, p)
    require(v >= 1 && v <= head,
      s"versionAsOf $v out of range for $p (versions 1..$head)")
    new TxV2Table(spark, p, fullName(ident), pinned = Some(v))
  }

  /** SQL `TIMESTAMP AS OF t` — `timestamp` arrives in MICROseconds
    * (the [[TableCatalog]] contract); resolve to the last commit at or
    * before it, exactly [[TxTable.history]]'s recorded wall clocks.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = pathOf(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val ms = timestamp / 1000L
    val at = TxTable.history(spark, p).filter(_.ts <= ms)
      .map(_.version).maxOption.getOrElse(
        throw new IllegalArgumentException(
          s"no commit at or before timestamp $ms ms in $p"))
    new TxV2Table(spark, p, fullName(ident), pinned = Some(at))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "txtable does not take PARTITIONED BY: cluster inside files with " +
        "overwriteClustered/appendClustered (log-metadata skipping " +
        "replaces directory partitioning)")
    val p = Option(properties.get(TableCatalog.PROP_LOCATION))
      .map(_.stripSuffix("/")).getOrElse(pathOf(ident))
    if (isTable(p)) throw new TableAlreadyExistsException(ident)
    // first commit defines the schema: one zero-row, schema-carrying
    // parquet file (stage's empty-frame discipline), so the new table
    // reads as EMPTY, never as unreadable
    TxTable.overwrite(spark, p, spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
    new TxV2Table(spark, p, fullName(ident), pinned = None)
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val p = pathOf(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "txtable schema evolution is top-level additive only " +
            s"(got nested field ${add.fieldNames.mkString(".")})")
        TxTable.evolveAddColumn(spark, p, add.fieldNames.head, add.dataType)
      case other =>
        throw new UnsupportedOperationException(
          s"txtable supports ALTER TABLE ADD COLUMN only (additive " +
            s"evolution, TxTable.evolveAppend's contract); got $other")
    }
    new TxV2Table(spark, p, fullName(ident), pinned = None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = pathOf(ident)
    isTable(p) && fs.delete(new Path(p), true)
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    // `ALTER TABLE gx.ns.a RENAME TO gx.ns.b` hands the new identifier
    // UNRESOLVED — the catalog name rides along as the first namespace
    // part (rename cannot cross catalogs, so Spark never strips it).
    // Without this normalization the table would silently move to
    // `<warehouse>/gx/ns/b`.
    val to = pathOf(
      if (newIdent.namespace.headOption.contains(catName))
        Identifier.of(newIdent.namespace.drop(1), newIdent.name)
      else newIdent)
    val from = pathOf(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    if (!fs.rename(new Path(from), new Path(to)))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }

  // ---- namespaces (directories under the warehouse) ----

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(n => isTable(s"$warehouse/$n"))
      .sorted.map(Array(_)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsPath(namespace.toSeq)
    if (!fs.exists(new Path(dir)))
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    fs.listStatus(new Path(dir)).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(n => isTable(s"$dir/$n"))
      .sorted.map(n => namespace :+ n).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (namespace.nonEmpty && !fs.exists(new Path(nsPath(namespace.toSeq))))
      throw new NoSuchNamespaceException(catName +: namespace.toSeq)
    Map("location" -> nsPath(namespace.toSeq)).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    fs.mkdirs(new Path(nsPath(namespace.toSeq)))
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "txtable namespaces are directories; they carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val dir = new Path(nsPath(namespace.toSeq))
    if (!fs.exists(dir)) false
    else {
      if (!cascade)
        require(fs.listStatus(dir).isEmpty,
          s"namespace ${namespace.mkString(".")} is not empty " +
            "(DROP ... CASCADE to remove its tables)")
      fs.delete(dir, true)
    }
  }
}

/** One txtable snapshot as a DSv2 [[Table]]. Reads plan through
  * Spark's OWN `ParquetScanBuilder` over a commit-log-backed file
  * index ([[GraftTxParquetIndex]]) — the identical native vectorized
  * scan + log-metadata file pruning + parquet row-group pushdown the
  * V1 `TxFileIndex` relation gets, now behind a catalog identifier.
  * Writes route through the transactional verbs as a [[V1Write]]
  * (`INSERT INTO` → one [[TxTable.append]] commit, `INSERT OVERWRITE`
  * → one [[TxTable.overwrite]] commit) — the DSv2 mirror of the V1
  * `InsertableRelation` guard that keeps SQL DML off Spark's
  * destructive native file-write path.
  */
class TxV2Table(spark: SparkSession, val path: String, ident: String,
                pinned: Option[Long])
    extends Table with SupportsRead with SupportsWrite
    with SupportsDeleteV2 {

  private[api] lazy val snapVersion: Long =
    pinned.getOrElse(TxTable.latestVersion(spark, path))
  private[api] lazy val state: TxTable.State =
    TxTable.snapshotState(spark, path, snapVersion)

  override def name(): String = ident

  override lazy val schema: StructType =
    TxTable.stateSchema(spark, path, state)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def properties(): util.Map[String, String] =
    Map(
      TableCatalog.PROP_PROVIDER -> "txtable",
      TableCatalog.PROP_LOCATION -> path,
      "version" -> snapVersion.toString).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val statuses = TxTable.liveFileStatuses(spark, path, state)
    val index = new GraftTxParquetIndex(spark, new Path(path),
      state.files.map(f => f -> statuses(f)),
      dataFilters => {
        val kept = TxTableRelation.keptFiles(state, dataFilters)
        TxTableSource.lastScanFilesByPath.put(path, kept)
        kept.toSet
      })
    GraftV2Bridge.parquetScanBuilder(spark, index, schema, options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty,
      s"cannot write to a time-travel snapshot of $path " +
        s"(VERSION/TIMESTAMP AS OF pins version $snapVersion; " +
        "writes target the head)")
    new TxV1WriteBuilder(spark, path)
  }

  // ---- SQL DELETE FROM: the file-level transactional delete ----

  /** Accept exactly the predicates we can round-trip into a Column —
    * [[TxTable.deleteWhere]] then derives FILE-LEVEL candidates from
    * the same log metadata the read path prunes with (untouched files
    * carry by reference) and keeps SQL NULL semantics (predicate-NULL
    * rows are KEPT). A condition that cannot round-trip reports
    * `false` and Spark falls back to the row-level rewrite path.
    */
  override def canDeleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean =
    pinned.isEmpty && predicates.forall(p =>
      GraftV2Bridge.predicateToV1(p).exists(f =>
        TxFilters.toColumn(f).isDefined))

  override def deleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val cond = predicates.toSeq
      .map(p => TxFilters.toColumn(GraftV2Bridge.predicateToV1(p).get).get)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    TxTable.deleteWhere(spark, path, cond)
    ()
  }

  /** SQL `TRUNCATE TABLE`: one overwrite commit to an empty,
    * schema-carrying state — history below it stays time-travelable
    * (truncate is a version, not an erasure).
    */
  override def truncateTable(): Boolean = {
    TxTable.overwrite(spark, path, spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
    true
  }

  override def toString: String = s"TxV2Table($ident@v$snapVersion)"
}

/** V1 `sources.Filter` → `Column` (the reverse of Spark's pushdown
  * translation): how SQL `DELETE FROM` predicates reach
  * [[TxTable.deleteWhere]]'s Column contract. Conservative — `None`
  * for anything unrecognized, which flips the table to
  * `canDeleteWhere = false` and the row-level fallback.
  */
private[api] object TxFilters {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.sources._

  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case And(l, r)                => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r)                 => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(c)                   => toColumn(c).map(!_)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case AlwaysTrue()             => Some(lit(true))
    case AlwaysFalse()            => Some(lit(false))
    case _                        => None
  }
}

/** `INSERT INTO` / `INSERT OVERWRITE` as single transactional commits:
  * the [[V1Write]] fallback hands the materialized DataFrame to the
  * SAME verbs every other write path uses — schema-on-write
  * enforcement, claim-loop concurrency, atomic visibility — instead of
  * a second executor-side write stack that could drift.
  */
class TxV1WriteBuilder(spark: SparkSession, path: String)
    extends WriteBuilder with SupportsTruncate {

  private var overwriteAll = false

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame,
                            overwrite: Boolean): Unit = {
          if (overwriteAll || overwrite) TxTable.overwrite(spark, path, data)
          else TxTable.append(spark, path, data)
          ()
        }
      }
  }
}
