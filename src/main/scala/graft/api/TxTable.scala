package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A dependency-free transactional table layer over parquet — the
  * lakehouse commit-log shape (Delta/Iceberg's core mechanics) with
  * zero format jars, closing the "table format absent from
  * /opt/spark/jars" gap with the same public design those formats
  * published: an append-only JSON commit log is the source of truth,
  * data files are immutable and invisible until a commit references
  * them, and readers resolve a snapshot from the log instead of
  * listing the directory.
  *
  * Layout:
  * {{{
  *   table/
  *     _txlog/00000000000000000001.json          commit records
  *     _txlog/00000000000000000010.checkpoint.json  folded live set
  *     data-<uuid>/part-*.parquet                one dir per commit
  * }}}
  *
  * Commit record (one line of JSON, fields regex-stable):
  * `{"version":3,"action":"append","files":["data-ab/part-0.parquet"],
  * "ts":1700000000000,"writer":"12345@host"}`
  *
  * Guarantees, and how each is achieved:
  *  - **Atomic visibility**: writers stage parquet into a
  *    commit-unique `data-<uuid>/` dir FIRST, then publish it with a
  *    single create-if-absent of the next `_txlog/<v>.json`. A reader
  *    never sees a partial commit: either the log file exists (and its
  *    files are fully written — the log write is last) or the staged
  *    dir is invisible garbage for [[vacuum]].
  *  - **Optimistic concurrency**: the version is claimed by the
  *    create-if-absent — a loser gets FileAlreadyExists, re-reads the
  *    log, and retries at the next version. Append/append conflicts
  *    commute, so retry is always safe; an overwrite that loses to a
  *    concurrent commit retries on top of it (last-overwrite-wins in
  *    LOG order — the log is the serialization). Same caveat as every
  *    other publish path here: create(overwrite=false) is atomic on
  *    posix/HDFS, check-then-create on Hadoop's local ChecksumFS and
  *    most object stores (those need external serialization).
  *  - **Snapshot isolation / time travel**: a snapshot at version V is
  *    the fold of commits 1..V (overwrite resets the live set, append
  *    extends it). Data files are immutable, so a reader holding V's
  *    file list is isolated from every later writer. [[readVersion]]
  *    IS time travel; [[history]] lists the log.
  *  - **O(1)-ish snapshot resolution at scale**: every
  *    [[CheckpointEvery]]-th commit also writes a
  *    `<v>.checkpoint.json` holding the FOLDED live set, so a reader
  *    starts from the latest checkpoint at-or-below its target and
  *    folds only the suffix — the log never has to be replayed from
  *    v1, and a 100 TB table with 10^5 commits resolves from one
  *    checkpoint + <CheckpointEvery tail records. Listing `_txlog/`
  *    (small JSON files) replaces listing the data tree entirely —
  *    the property that makes object-store tables consistent.
  *  - **[[compact]]** rewrites the current snapshot into few files as
  *    an overwrite commit (content-identical, fewer tasks downstream);
  *    **[[vacuum]]** deletes `data-*` dirs referenced by NO commit —
  *    crashed/lost-race stagings — and never anything the log can
  *    still reach (time travel stays intact).
  *
  * All IO goes through the Hadoop FS of the table path, so the same
  * code runs on file://, hdfs://, or the s3mini test scheme.
  */
object TxTable {

  final case class Commit(version: Long, action: String,
                          files: Seq[String], ts: Long,
                          txn: Option[String] = None)

  /** Fold-and-persist cadence for checkpoint records. */
  val CheckpointEvery = 10
  private val MaxCommitRetries = 64

  private def fs(spark: SparkSession, path: String) =
    Dedup.hadoopFs(spark, path)

  private def logDir(path: String) = s"$path/_txlog"
  private def commitPath(path: String, v: Long) =
    f"${logDir(path)}/$v%020d.json"
  private def checkpointPath(path: String, v: Long) =
    f"${logDir(path)}/$v%020d.checkpoint.json"

  // ---- log records (hand-rolled JSON; staged names are [-a-z0-9/.]
  // only, so no escaping is ever needed — enforced at stage time) ----

  private def render(c: Commit): String =
    s"""{"version":${c.version},"action":"${c.action}",""" +
      s""""files":[${c.files.map("\"" + _ + "\"").mkString(",")}],""" +
      c.txn.map(t => s""""txn":"$t",""").getOrElse("") +
      s""""ts":${c.ts},"writer":"${java.lang.ProcessHandle.current().pid()}"}"""

  private val VersionRe = """"version":(\d+)""".r
  private val ActionRe = """"action":"(\w+)"""".r
  private val FilesRe = """"files":\[([^\]]*)\]""".r
  private val FileRe = """"([^"]+)"""".r
  private val TsRe = """"ts":(\d+)""".r
  private val TxnRe = """"txn":"([^"]+)"""".r

  private def parse(txt: String): Commit = Commit(
    VersionRe.findFirstMatchIn(txt).map(_.group(1).toLong)
      .getOrElse(throw new java.io.IOException(s"bad commit record: $txt")),
    ActionRe.findFirstMatchIn(txt).map(_.group(1)).getOrElse("append"),
    FilesRe.findFirstMatchIn(txt).map(m =>
      FileRe.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
      .getOrElse(Seq.empty),
    TsRe.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L),
    TxnRe.findFirstMatchIn(txt).map(_.group(1)))

  private def readSmall(hfs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): String = {
    val in = hfs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def writeNew(hfs: org.apache.hadoop.fs.FileSystem,
                       p: org.apache.hadoop.fs.Path, txt: String): Unit =
    if (hfs.getScheme == "file") {
      // Hadoop's local ChecksumFS create(overwrite=false) is
      // check-then-create; java.nio CREATE_NEW is a real O_EXCL, so
      // local commit claims are genuinely atomic (two same-host
      // writers cannot both claim a version). Throws
      // FileAlreadyExistsException (an IOException) on a lost race —
      // the same signal the retry loop keys on.
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      java.nio.file.Files.write(local, txt.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      ()
    } else {
      val out = hfs.create(p, false) // create-if-absent claims the version
      out.write(txt.getBytes("UTF-8")); out.close()
    }

  /** One listing of `_txlog/` → (commit versions asc, checkpoint
    * versions asc). Versions come from the zero-padded NAMES — the
    * record bodies are only read when their contents are needed, which
    * is what keeps snapshot resolution at one checkpoint + a short
    * tail instead of a full log replay.
    */
  private def logVersions(hfs: org.apache.hadoop.fs.FileSystem,
                          path: String): (Seq[Long], Seq[Long]) = {
    val ld = new org.apache.hadoop.fs.Path(logDir(path))
    if (!hfs.exists(ld)) return (Seq.empty, Seq.empty)
    val names = hfs.listStatus(ld).toSeq.map(_.getPath.getName)
    (names.filter(n => n.endsWith(".json") && !n.endsWith(".checkpoint.json"))
       .map(_.stripSuffix(".json").toLong).sorted,
     names.filter(_.endsWith(".checkpoint.json"))
       .map(_.stripSuffix(".checkpoint.json").toLong).sorted)
  }

  /** All commit records in the log, ascending (absent table → empty). */
  def history(spark: SparkSession, path: String): Seq[Commit] = {
    val hfs = fs(spark, path)
    logVersions(hfs, path)._1.map(v =>
      parse(readSmall(hfs, new org.apache.hadoop.fs.Path(commitPath(path, v)))))
  }

  def latestVersion(spark: SparkSession, path: String): Long =
    logVersions(fs(spark, path), path)._1.lastOption.getOrElse(0L)

  /** The live file set at `version` (relative paths): start from the
    * newest checkpoint at-or-below it, fold only the tail commits
    * after it — never a full log replay.
    */
  private def liveFiles(spark: SparkSession, path: String,
                        version: Long): Seq[String] = {
    val hfs = fs(spark, path)
    val (commitVs, ckVs) = logVersions(hfs, path)
    val upTo = commitVs.filter(_ <= version)
    require(upTo.nonEmpty, s"no commits at or below version $version in $path")
    val (base, startAfter) = ckVs.filter(_ <= version).lastOption match {
      case Some(cv) =>
        val ck = parse(readSmall(hfs,
          new org.apache.hadoop.fs.Path(checkpointPath(path, cv))))
        (ck.files, cv)
      case None => (Seq.empty[String], 0L)
    }
    upTo.filter(_ > startAfter)
      .map(v => parse(readSmall(hfs,
        new org.apache.hadoop.fs.Path(commitPath(path, v)))))
      .foldLeft(base) { (live, c) =>
        c.action match {
          case "overwrite" => c.files
          case _           => live ++ c.files
        }
      }
  }

  /** Stage `df` as parquet under a commit-unique data dir; returns the
    * staged RELATIVE file names. Underscore files (_SUCCESS) are not
    * data and never enter a commit record.
    */
  private def stage(spark: SparkSession, path: String,
                    df: DataFrame): Seq[String] = {
    val sub = "data-" + java.util.UUID.randomUUID().toString.take(12)
    df.write.mode("overwrite").parquet(s"$path/$sub")
    val hfs = fs(spark, path)
    val staged = hfs.listStatus(new org.apache.hadoop.fs.Path(s"$path/$sub"))
      .toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .sorted.map(n => s"$sub/$n")
    require(staged.forall(_.matches("[a-zA-Z0-9/._-]+")),
      s"staged names must be JSON-inert: $staged")
    staged
  }

  /** Claim the next version optimistically; retries on lost races.
    * With `txn` set, the commit is IDEMPOTENT: if any logged commit
    * already carries the same txn id, that version is returned and
    * nothing new lands — the mechanism behind exactly-once streaming
    * ingest (redelivered micro-batches re-present their txn id).
    * Idempotence holds for SERIAL redelivery (a checkpoint replay);
    * two concurrent writers sharing a txn id can still both land —
    * streaming redelivery is never concurrent with itself.
    */
  private def commit(spark: SparkSession, path: String, action: String,
                     files: Seq[String], txn: Option[String] = None): Long = {
    txn.foreach(t => require(t.matches("[A-Za-z0-9._:-]+"),
      s"txn id must be JSON-inert ([A-Za-z0-9._:-]+): '$t'"))
    val hfs = fs(spark, path)
    hfs.mkdirs(new org.apache.hadoop.fs.Path(logDir(path)))
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      txn.foreach { t =>
        history(spark, path).find(_.txn.contains(t)).foreach { prior =>
          return prior.version // already landed: redelivery is a no-op
        }
      }
      val v = latestVersion(spark, path) + 1
      val rec = Commit(v, action, files, System.currentTimeMillis(), txn)
      try {
        writeNew(hfs, new org.apache.hadoop.fs.Path(commitPath(path, v)),
          render(rec))
        if (v % CheckpointEvery == 0) // best-effort; readers never require it
          scala.util.Try(writeNew(hfs,
            new org.apache.hadoop.fs.Path(checkpointPath(path, v)),
            render(Commit(v, "checkpoint", liveFiles(spark, path, v),
              rec.ts))))
        return v
      } catch {
        case _: java.io.IOException => // version claimed by a racer:
          attempt += 1 // re-read the log and retry on top of it
      }
    }
    throw new IllegalStateException(
      s"could not commit to $path after $MaxCommitRetries attempts")
  }

  /** Appends must match the table's schema by (name → type) — the
    * enforcement half of schema-on-write: a drifted producer fails
    * loudly at commit time instead of landing rows a later reader
    * unions into nulls. Field ORDER is not significant (parquet reads
    * resolve by name); nullability is not compared (it is advisory in
    * Spark schemas).
    */
  private def requireSchemaMatch(spark: SparkSession, path: String,
                                 df: DataFrame): Unit = {
    val v = latestVersion(spark, path)
    if (v == 0) return // first commit defines the schema
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => f.name -> f.dataType).toMap
    val table = shape(readVersion(spark, path, v).schema)
    val staged = shape(df.schema)
    require(staged == table,
      s"append schema mismatch for $path: table has $table, append has $staged")
  }

  /** Replace the table content (also the create form — v1 overwrite). */
  def overwrite(spark: SparkSession, path: String, df: DataFrame): Long =
    commit(spark, path, "overwrite", stage(spark, path, df))

  /** Transactionally add rows; concurrent appends all land (commuting
    * retries), each as its own version. Schema-enforced against the
    * current head. `txn` makes the append idempotent (see [[commit]]).
    */
  def append(spark: SparkSession, path: String, df: DataFrame,
             txn: Option[String] = None): Long = {
    requireSchemaMatch(spark, path, df)
    // redelivery fast path: a txn that already landed skips even the
    // staging write (commit re-checks inside its retry loop regardless)
    txn.flatMap(t => history(spark, path).find(_.txn.contains(t))) match {
      case Some(prior) => prior.version
      case None => commit(spark, path, "append", stage(spark, path, df), txn)
    }
  }

  /** An exactly-once `foreachBatch` sink: each micro-batch appends
    * under txn id `appId:batchId`, so checkpoint redelivery of a batch
    * re-presents the same txn and lands nothing twice — the idempotent
    * sink half of Structured Streaming's exactly-once contract, with
    * the TxTable log as the transaction marker instead of a
    * partition-overwrite convention.
    *
    * {{{
    * stream.writeStream.foreachBatch(TxTable.streamAppend(spark, path, "ingest"))
    *   .option("checkpointLocation", ck).start()
    * }}}
    */
  def streamAppend(spark: SparkSession, path: String, appId: String)
      : (DataFrame, Long) => Unit =
    (batch, batchId) => { append(spark, path, batch,
      txn = Some(s"$appId:$batchId")); () }

  /** The current snapshot. */
  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path, latestVersion(spark, path))

  /** Time travel: the table exactly as of `version`. */
  def readVersion(spark: SparkSession, path: String,
                  version: Long): DataFrame = {
    val files = liveFiles(spark, path, version)
    require(files.nonEmpty, s"version $version of $path holds no files")
    spark.read.parquet(files.map(f => s"$path/$f"): _*)
  }

  /** Rewrite the current snapshot into `numFiles` files as an
    * overwrite commit — content-identical (the spec pins it), fewer
    * tasks for every downstream reader. Old versions stay readable.
    */
  def compact(spark: SparkSession, path: String, numFiles: Int = 1): Long =
    overwrite(spark, path, read(spark, path).coalesce(numFiles))

  /** Delete `data-*` dirs no commit references — crashed or lost-race
    * stagings. Never touches log-reachable files: every historical
    * version stays readable. Returns the number of dirs removed.
    */
  def vacuum(spark: SparkSession, path: String): Int = {
    val hfs = fs(spark, path)
    val referenced = history(spark, path).flatMap(_.files)
      .map(_.takeWhile(_ != '/')).toSet
    val dirs = hfs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .map(_.getPath).filter(_.getName.startsWith("data-"))
    val orphans = dirs.filterNot(d => referenced.contains(d.getName))
    orphans.foreach(d => hfs.delete(d, true))
    orphans.size
  }
}
