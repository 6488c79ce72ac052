package graft.shelf

/** Node id in the build DAG: `snapshot://ns/.../version` or
  * `table://ns/.../version`.
  *
  * Reference: /root/reference/src/shelf/types.py:16-57 (scheme literal :19,
  * parse :40-45, total ordering :50-57).
  */
final case class StepURI(scheme: String, path: String) extends Ordered[StepURI] {
  require(scheme == "snapshot" || scheme == "table",
    s"invalid scheme: $scheme (must be snapshot or table)")

  override def toString: String = s"$scheme://$path"

  /** Lexicographic on the full URI string — matches the reference's
    * dataclass ordering, and makes ISO-date versions sort naturally with
    * a literal `latest` sorting after all dates ('l' > '9').
    */
  def compare(that: StepURI): Int = toString.compare(that.toString)

  def version: String = path.split("/").last

  /** Path with the trailing version segment removed. */
  def stem: String = path.split("/").dropRight(1).mkString("/")

  def isLatest: Boolean = version == "latest"
}

object StepURI {
  private val Pattern = "^(snapshot|table)://(.+)$".r

  def parse(uri: String): StepURI = uri match {
    case Pattern(scheme, path) => StepURI(scheme, path)
    case _ => throw new IllegalArgumentException(s"invalid step URI: $uri")
  }

  def snapshot(path: String): StepURI = StepURI("snapshot", path)
  def table(path: String): StepURI = StepURI("table", path)

  /** `\d{4}-\d{2}-\d{2}` or `latest`
    * (/root/reference/src/shelf/__init__.py:508-509).
    */
  def isValidVersion(v: String): Boolean =
    v == "latest" || v.matches("""\d{4}-\d{2}-\d{2}""")

  /** Append today's date when the name carries no version
    * (/root/reference/src/shelf/__init__.py:492-505).
    */
  def maybeAddVersion(datasetName: String,
                      today: java.time.LocalDate = java.time.LocalDate.now()): String = {
    val parts = datasetName.split("/").toSeq
    if (isValidVersion(parts.last)) {
      require(parts.size > 1, s"invalid dataset name: $datasetName")
      datasetName
    } else (parts :+ today.toString).mkString("/")
  }
}
