package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-maintenance verbs as DSv2 STORED PROCEDURES (the Iceberg
  * `CALL catalog.system.*` shape, on Spark 4's native procedure
  * support) — the lifecycle operations SQL DML cannot express:
  *
  * {{{
  *   CALL gx.system.history(table => 'db.t')
  *   CALL gx.system.compact(table => 'db.t', num_files => 4)
  *   CALL gx.system.compact_small(table => 'db.t')
  *   CALL gx.system.optimize(table => 'db.t', cluster_by => 'id')
  *   CALL gx.system.restore(table => 'db.t', version => 3)
  *   CALL gx.system.expire_history(table => 'db.t', keep_versions => 10)
  *   CALL gx.system.vacuum(table => 'db.t')
  * }}}
  *
  * Each runs the corresponding [[TxTable]] verb on the driver (they
  * launch their own Spark jobs) and returns its result as rows via a
  * [[LocalScan]]. Argument defaults mirror the API defaults.
  */
private[api] object TxProcedures {

  val Namespace: Array[String] = Array("system")

  /** One procedure: named IN parameters (defaults as SQL literals),
    * driver-side body, one row set out.
    */
  private final class P(
      pname: String,
      params: Seq[(String, DataType, Option[String])],
      out: StructType,
      body: (SparkSession, String => String, InternalRow) => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {

    private var resolve: String => String = identity

    def withResolver(r: String => String): P = { resolve = r; this }

    override def name(): String = pname
    override def description(): String = s"txtable $pname"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] =
      params.map { case (n, dt, dflt) =>
        val b = ProcedureParameter.in(n, dt)
        dflt.foreach(b.defaultValue)
        b.build()
      }.toArray

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val produced = body(SparkSession.active, resolve, input).toArray
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = produced
        override def readSchema(): StructType = out
      }).iterator()
    }
  }

  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.toArray)

  private def versionOut = StructType(Seq(StructField("version", LongType)))

  private def defs: Seq[P] = Seq(
    new P("history",
      Seq(("table", StringType, None)),
      StructType(Seq(
        StructField("version", LongType), StructField("action", StringType),
        StructField("op", StringType), StructField("txn", StringType),
        StructField("ts", LongType), StructField("num_files", IntegerType),
        StructField("num_delete_files", IntegerType),
        // merge-on-read debt per commit: the on-disk bytes of ITS
        // position-delete files (the unit the driver-cap guard sums)
        StructField("del_bytes", LongType))),
      (s, resolve, in) => {
        val p = resolve(in.getUTF8String(0).toString)
        val commits = TxTable.history(s, p)
        // ONE bulk size resolution across the whole history — a
        // churned log must not cost one RPC per del file per row
        val lens = TxTable.delFileLens(s, p, commits.flatMap(_.dels))
        commits.map(c => row(c.version, UTF8String.fromString(c.action),
          c.op.map(UTF8String.fromString).orNull,
          c.txn.map(UTF8String.fromString).orNull,
          c.ts, c.files.size, c.dels.size,
          c.dels.map(lens.getOrElse(_, 0L)).sum))
      }),

    // Merge-on-read DEBT at the head, per DV-bearing live file: total
    // rows, recorded delete positions, deleted fraction — the backlog
    // compact_small purges and the driver-cap guard protects against,
    // visible BEFORE it trips. Empty on a purged (or DV-free) table.
    new P("dv_stats",
      Seq(("table", StringType, None)),
      StructType(Seq(
        StructField("file", StringType), StructField("file_rows", LongType),
        StructField("del_rows", LongType),
        StructField("deleted_fraction", DoubleType))),
      (s, resolve, in) =>
        TxTable.dvStats(s, resolve(in.getUTF8String(0).toString))
          .map { case (f, rows, dels, frac) =>
            row(UTF8String.fromString(f), rows, dels, frac) }),

    new P("compact",
      Seq(("table", StringType, None), ("num_files", IntegerType, Some("1"))),
      versionOut,
      (s, resolve, in) => Seq(row(TxTable.compact(s,
        resolve(in.getUTF8String(0).toString), in.getInt(1))))),

    new P("compact_small",
      // -1 sentinels: thresholds resolve from the TABLE's persisted
      // properties (graft.compactSmall.*), else 32 MB / 128 MB — the
      // knobs travel with the table; explicit args still win
      Seq(("table", StringType, None),
        ("min_file_bytes", LongType, Some("-1")),
        ("target_bytes", LongType, Some("-1"))),
      versionOut,
      (s, resolve, in) => Seq(row(TxTable.compactSmall(s,
        resolve(in.getUTF8String(0).toString), in.getLong(1), in.getLong(2))))),

    new P("optimize",
      Seq(("table", StringType, None),
        ("cluster_by", StringType, None),
        ("num_files", IntegerType, Some("8"))),
      versionOut,
      (s, resolve, in) => Seq(row(TxTable.optimize(s,
        resolve(in.getUTF8String(0).toString),
        in.getUTF8String(1).toString.split(',').map(_.trim).toSeq
          .filter(_.nonEmpty),
        in.getInt(2))))),

    new P("restore",
      Seq(("table", StringType, None), ("version", LongType, None)),
      versionOut,
      (s, resolve, in) => Seq(row(TxTable.restore(s,
        resolve(in.getUTF8String(0).toString), in.getLong(1))))),

    new P("expire_history",
      // keep_versions omitted -> the table's graft.retention.keepVersions
      // property (no built-in fallback: expiry is destructive)
      Seq(("table", StringType, None),
        ("keep_versions", IntegerType, Some("-1"))),
      StructType(Seq(StructField("expired", IntegerType))),
      (s, resolve, in) => Seq(row(TxTable.expireHistory(s,
        resolve(in.getUTF8String(0).toString), in.getInt(1))))),

    new P("vacuum",
      Seq(("table", StringType, None),
        ("older_than_ms", LongType, Some(TxTable.VacuumMinAgeMs.toString))),
      StructType(Seq(StructField("removed", IntegerType))),
      (s, resolve, in) => Seq(row(TxTable.vacuum(s,
        resolve(in.getUTF8String(0).toString), in.getLong(1))))),

    // merge-on-read DML: position-delete commits through SQL —
    //   CALL gx.system.delete_dv(table => 't', where => 'id % 10 = 3')
    //   CALL gx.system.update_dv(table => 't',
    //     where => 'id < 5', set => "v = 'X'; g = g + 100")
    // `where`/`set` values are SQL expressions resolved against the
    // table's columns; `set` assignments separate on ';' outside
    // single-quoted literals (an expression may legitimately contain
    // ',' — and a string literal may contain ';').
    new P("delete_dv",
      Seq(("table", StringType, None), ("where", StringType, None),
        ("cdf", BooleanType, Some("false"))),
      versionOut,
      (s, resolve, in) => Seq(row(TxTable.deleteWhereDv(s,
        resolve(in.getUTF8String(0).toString),
        org.apache.spark.sql.functions.expr(in.getUTF8String(1).toString),
        in.getBoolean(2))))),

    new P("update_dv",
      Seq(("table", StringType, None), ("where", StringType, None),
        ("set", StringType, None), ("cdf", BooleanType, Some("false"))),
      versionOut,
      (s, resolve, in) => {
        val assignments = splitOutsideQuotes(in.getUTF8String(2).toString, ';')
          .map(_.trim).filter(_.nonEmpty).map { a =>
            val eq = a.indexOf('=')
            require(eq > 0, s"update_dv set assignment needs 'col = expr', " +
              s"got '$a' (separate assignments with ';')")
            a.take(eq).trim ->
              org.apache.spark.sql.functions.expr(a.drop(eq + 1).trim)
          }.toMap
        Seq(row(TxTable.updateWhereDv(s,
          resolve(in.getUTF8String(0).toString),
          org.apache.spark.sql.functions.expr(in.getUTF8String(1).toString),
          assignments, in.getBoolean(3))))
      }))

  /** Split on `sep` OUTSIDE single-quoted SQL string literals, so a
    * set expression like `v = 'a;b'` stays one assignment (the SQL
    * '' in-literal escape toggles twice — a net no-op, as needed).
    */
  private[graft] def splitOutsideQuotes(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    s.foreach { c =>
      if (c == '\'') { inQ = !inQ; cur += c; () }
      else if (c == sep && !inQ) { out += cur.result(); cur.clear() }
      else { cur += c; () }
    }
    out += cur.result()
    out.result()
  }

  def names: Seq[String] = defs.map(_.name())

  def load(pname: String, resolve: String => String): UnboundProcedure =
    defs.find(_.name() == pname)
      .map(_.withResolver(resolve))
      .getOrElse(throw new IllegalArgumentException(
        s"unknown txtable procedure '$pname' " +
          s"(available: ${names.mkString(", ")})"))
}
