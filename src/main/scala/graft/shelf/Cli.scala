package graft.shelf

import java.nio.file.Paths

/** CLI mirroring the reference's command surface: snapshot / run / list /
  * audit / db / export / new-table (/root/reference/src/shelf/__init__.py:27-180).
  */
object Cli {

  private def usage(): Nothing = {
    System.err.println(
      """usage: shelf <command> [args]
        |  init
        |  snapshot <path> <dataset_name> [--force] [--edit]
        |  run [regex] [--force] [--dry-run]
        |  list [regex] [--paths]
        |  audit [--fix]
        |  db [query] [--csv] [--names short|full|both]
        |  export <dest_dir>
        |  export-duckdb <db_file> [--short]
        |  new-table <dataset_name> [dep_uri...]""".stripMargin)
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) usage()
    val root = Paths.get(sys.env.getOrElse("SHELF_ROOT", "."))
    lazy val shelf = new Shelf(root, () => Shelf.defaultSession())
    val flags = args.tail.filter(_.startsWith("--")).toSet
    val pos = args.tail.filterNot(_.startsWith("--")).toSeq

    args.head match {
      case "init" =>
        Catalog.init(root)
        println(s"initialized shelf in $root")
      case "snapshot" =>
        if (pos.size < 2) usage()
        val uri = shelf.snapshot(Paths.get(pos(0)), pos(1), flags("--force"))
        // reference parity (__init__.py:215-216): drop into an editor on
        // the fresh sidecar so provenance fields get filled immediately
        if (flags("--edit")) editSidecar(root, uri)
        println(uri)
      case "run" =>
        val parIdx = args.indexOf("--parallel")
        val par = if (parIdx >= 0 && parIdx + 1 < args.length)
          args(parIdx + 1).toInt else 1
        val done = shelf.run(pos.filterNot(p => parIdx >= 0 && p == par.toString)
            .headOption,
          flags("--force"), flags("--dry-run"), parallelism = par)
        done.foreach(println)
      case "list" =>
        shelf.list(pos.headOption, flags("--paths")).foreach(println)
      case "audit" =>
        val problems = shelf.audit(flags("--fix"))
        problems.foreach(System.err.println)
        if (problems.nonEmpty) sys.exit(1)
      case "db" =>
        val namesIdx = args.indexOf("--names")
        val names = if (namesIdx >= 0 && namesIdx + 1 < args.length)
          args(namesIdx + 1) else "both"
        // drop ONLY the token at the --names value position — filtering
        // by VALUE would also swallow a query that happens to equal it
        // (`shelf db both`) and silently fall into the shell
        val posDb = args.zipWithIndex.drop(1)
          .filterNot { case (a, i) => a.startsWith("--") || i == namesIdx + 1 }
          .map(_._1)
        posDb.headOption match {
          case Some(query) =>
            val df = shelf.db(query, names)
            if (flags("--csv")) println(Db.toCsv(df))
            else Db.toJsonRecords(df).foreach(println)
          case None =>
            // reference parity (__init__.py:172-175): bare `shelf db`
            // drops into the interactive shell
            shell(shelf)
        }
      case "shell" => shell(shelf)
      case "export" =>
        if (pos.isEmpty) usage()
        shelf.export(Paths.get(pos.head))
        println(s"exported to ${pos.head}")
      case "export-duckdb" =>
        // with the `duckdb` CLI on PATH this produces a real .duckdb
        // database (reference __init__.py:285-312, incl. --short alias
        // renames); without it, the documented fallback container is
        // the same parquet directory + manifest `export` writes (A18)
        if (pos.isEmpty) usage()
        if (shelf.exportDuckdb(Paths.get(pos.head), flags("--short")))
          println(s"exported duckdb database to ${pos.head}")
        else {
          shelf.export(Paths.get(pos.head))
          println(s"duckdb CLI not found; exported parquet container to ${pos.head}")
        }
      case "new-table" =>
        if (pos.isEmpty) usage()
        val uri = shelf.newTable(pos.head, pos.tail.map(StepURI.parse))
        println(uri)
      case _ => usage()
    }
  }

  /** Interactive SQL loop over the registered views (reference `shelf db`
    * with no query, __init__.py:172-175 → :403-431): read a query per
    * line, print JSON records; blank/exit quits. Reachable both as bare
    * `db` (reference behavior) and the explicit `shell` subcommand.
    */
  def shell(shelf: => Shelf, in: scala.io.Source = scala.io.Source.stdin,
            out: java.io.PrintStream = Console.out): Unit = {
    // `shelf` is by-name: the Shelf constructor auto-inits a catalog in
    // root, and a bare `db`/`shell` that quits immediately must not
    // scribble a shelf.yaml into an arbitrary cwd
    val lines = in.getLines()
    out.print("shelf> "); out.flush()
    lines.takeWhile(l => l.trim.nonEmpty && l.trim != "exit" && l.trim != "quit")
      .foreach { line =>
        try Db.toJsonRecords(shelf.db(line)).foreach(out.println)
        catch { case e: Exception => System.err.println(s"error: ${e.getMessage}") }
        out.print("shelf> "); out.flush()
      }
  }

  /** Open a snapshot's metadata sidecar in the user's editor — the
    * reference hardcodes vim (__init__.py:216); here $EDITOR wins when
    * set. Returns the editor's exit code.
    */
  def editSidecar(root: java.nio.file.Path, uri: StepURI,
                  editor: Option[String] = None): Int = {
    val ed = editor.orElse(sys.env.get("EDITOR")).getOrElse("vim")
    val cmd = (ed.split("\\s+").toSeq :+
      Snapshots.metadataPath(root, uri).toString)
    new ProcessBuilder(cmd: _*).inheritIO().start().waitFor()
  }
}
