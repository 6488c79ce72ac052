package graft.shelf

import java.nio.file.{Files, Path}
import java.security.MessageDigest
import scala.collection.immutable.SortedMap
import scala.jdk.CollectionConverters._

/** SHA-256 checksums over files, folders, and manifests — byte-identical
  * to the reference so `audit` semantics carry over.
  *
  * Reference: /root/reference/src/shelf/utils.py:13-49 (IGNORE_FILES :13,
  * file hash :16-24, folder manifest :26-39, manifest fold :42-49).
  */
object Checksums {

  /** Files never included in folder checksums (utils.py:13). */
  val IgnoreFiles: Set[String] = Set(".DS_Store")

  def checksumFile(path: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(path)
    try {
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) md.update(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    hex(md.digest())
  }

  def checksumBytes(bytes: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(bytes))

  def checksumString(s: String): String =
    checksumBytes(s.getBytes("UTF-8"))

  /** Relative-path → sha256 manifest of every file under `dir`
    * (utils.py:26-39). Throws when the directory holds no files.
    */
  def checksumFolder(dir: Path): SortedMap[String, String] = {
    val entries = folderManifest(dir)
    require(entries.nonEmpty, s"""No files found in "$dir" to checksum""")
    entries
  }

  /** Audit-safe manifest walk: an EMPTY directory (data files rotted
    * away but the dir remains — exactly what audit exists to report)
    * yields an empty manifest whose fold can never equal a recorded
    * checksum, so the auditor reports a mismatch instead of crashing
    * the whole run. Ingest-time [[checksumFolder]] keeps the non-empty
    * guard for reference parity.
    */
  def folderManifest(dir: Path): SortedMap[String, String] = {
    val entries = Files.walk(dir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .filterNot(p => IgnoreFiles.contains(p.getFileName.toString))
      .map(p => dir.relativize(p).toString -> checksumFile(p))
      .toSeq
    SortedMap(entries: _*)
  }

  /** Fold a manifest into one checksum: sha256 over the sorted
    * (name, checksum) pairs' UTF-8 bytes, concatenated with no separator
    * (utils.py:42-49). Must stay byte-identical for audit parity.
    */
  def checksumManifest(manifest: Map[String, String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    manifest.toSeq.sortBy(_._1).foreach { case (name, cs) =>
      md.update(name.getBytes("UTF-8"))
      md.update(cs.getBytes("UTF-8"))
    }
    hex(md.digest())
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString

  /** Append a path to .gitignore if absent
    * (utils.py:56-73, __init__.py:213).
    */
  def addToGitignore(repoRoot: Path, entry: String): Unit = {
    val gi = repoRoot.resolve(".gitignore")
    val lines: Seq[String] =
      if (Files.exists(gi)) Files.readAllLines(gi).asScala.toSeq else Seq.empty
    if (!lines.contains(entry)) {
      val content = (lines :+ entry).mkString("", "\n", "\n")
      Files.writeString(gi, content)
    }
  }
}
