package graft.shelf

import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table metadata: config, inheritance, validation, input manifests.
  *
  * Reference: /root/reference/src/shelf/table_metadata.py (inheritance
  * :56-94, validation :96-128, runtime/override merge :130-156, input
  * manifest :158-177, live path :180-204).
  */
object Metadata {

  /** Provenance fields inherited by default from a single dependency
    * (table_metadata.py:60-72).
    */
  val DefaultInheritFields: Seq[String] = Seq(
    "name", "description", "source_name", "source_url",
    "access_notes", "license", "license_url")

  /** Declared config type enum → acceptable Spark SQL type names
    * (table-config-v1.schema.json:55-62). The reference compares Polars
    * dtype strings; we compare Spark DDL names — same contract, different
    * engine vocabulary (documented deviation).
    */
  val DeclaredTypes: Map[String, Set[String]] = Map(
    "string" -> Set("string"),
    "integer" -> Set("bigint", "int", "smallint", "tinyint"),
    "float" -> Set("double", "float"),
    "boolean" -> Set("boolean"),
    "date" -> Set("date"),
    "timestamp" -> Set("timestamp", "timestamp_ntz"))

  def sparkTypeName(dt: org.apache.spark.sql.types.DataType): String =
    dt.sql.toLowerCase

  /** Inherit provenance from dependencies: default all 7 fields when
    * there is exactly one dep and no explicit `inherit`; otherwise the
    * config's `inherit: {uri: {fields: [...]}}` map. Inheriting from a
    * non-dependency is an error (table_metadata.py:56-94).
    */
  def resolveInheritance(root: Path, config: Map[String, Any],
                         deps: Seq[StepURI]): Map[String, Any] = {
    val inherit: Map[String, Seq[String]] =
      if (config.isEmpty && deps.size == 1)
        Map(deps.head.toString -> DefaultInheritFields)
      else config.get("inherit") match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]].map {
          case (uri, settings: Map[_, _]) =>
            uri -> settings.asInstanceOf[Map[String, Any]]
              .getOrElse("fields", Seq.empty).asInstanceOf[Seq[Any]].map(_.toString)
          case (uri, _) => uri -> Seq.empty[String]
        }
        case _ => Map.empty
      }

    inherit.foldLeft(Map.empty[String, Any]) { case (acc, (uriStr, fields)) =>
      val dep = StepURI.parse(uriStr)
      if (!deps.contains(dep))
        throw new IllegalArgumentException(
          s"Cannot inherit from $uriStr as it is not a dependency")
      val depMeta = Yaml.load(Snapshots.metadataPath(root, dep))
      acc ++ fields.flatMap(f => depMeta.get(f).map(f -> _))
    }
  }

  /** Schema + data validation, all data checks in ONE aggregation pass
    * (the reference does per-column passes with Polars; a single agg job
    * matters when the table is TBs). Returns error strings; empty = ok.
    */
  def validate(df: DataFrame, config: Map[String, Any]): Seq[String] = {
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val actual = df.schema.fields.map(f => f.name -> sparkTypeName(f.dataType)).toMap

    config.get("schema").foreach {
      case spec: Map[_, _] =>
        spec.asInstanceOf[Map[String, Any]].foreach { case (colName, declared) =>
          actual.get(colName) match {
            case None => errors += s"Missing column: $colName"
            case Some(t) =>
              val ok = DeclaredTypes.get(declared.toString).map(_.contains(t))
                .getOrElse(declared.toString == t)
              if (!ok) errors += s"Type mismatch for $colName: expected $declared, got $t"
          }
        }
      case _ =>
    }

    val validation = config.get("validation")
      .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
      .getOrElse(Map.empty[String, Any])
    def listOf(key: String): Seq[String] = validation.get(key)
      .collect { case s: Seq[_] => s.map(_.toString) }.getOrElse(Seq.empty)

    val required = listOf("required_columns")
    required.filterNot(actual.contains).foreach(c => errors += s"Required column missing: $c")
    val uniqueCols = listOf("unique_columns").filter(actual.contains)
    val notNullCols = listOf("not_null").filter(actual.contains)

    if (uniqueCols.nonEmpty || notNullCols.nonEmpty) {
      val aggs = Seq(count(lit(1)).as("__n")) ++
        uniqueCols.map(c => countDistinct(col(c)).as(s"__u_$c")) ++
        notNullCols.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(s"__z_$c"))
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = row.getAs[Long]("__n")
      uniqueCols.foreach { c =>
        if (row.getAs[Long](s"__u_$c") != n) errors += s"Column not unique: $c"
      }
      notNullCols.foreach { c =>
        if (row.getAs[Long](s"__z_$c") != 0L) errors += s"Column contains null values: $c"
      }
    }

    // dim_ prefix rule: schema-file intent, dead code in the reference
    // (SURVEY.md §1.3) — surfaced as a warning, never a failure.
    if (validation.get("require_dimension_prefix").contains(true)) {
      df.schema.fields.filter(f => sparkTypeName(f.dataType) == "string")
        .filterNot(_.name.startsWith("dim_"))
        .foreach(f => System.err.println(
          s"[shelf] warning: dimension-like column ${f.name} lacks dim_ prefix"))
    }
    errors.toSeq
  }

  /** Input manifest: script + optional config + each dep's sidecar (the
    * sidecar embeds the dep's data checksum — the Merkle link)
    * (table_metadata.py:158-177).
    */
  def inputManifest(root: Path, script: ScriptRef,
                    deps: Seq[StepURI]): Map[String, String] = {
    val scriptEntry: (String, String) = script match {
      case FileScript(p) => p.toString -> Checksums.checksumFile(p)
      case ScalaScript(name, version) =>
        s"scala://$name" -> Checksums.checksumString(s"$name@$version")
    }
    val configEntry = script.configPath.filter(Files.exists(_))
      .map(p => p.toString -> Checksums.checksumFile(p))
    val depEntries = deps.map { d =>
      val p = Snapshots.metadataPath(root, d)
      p.toString -> Checksums.checksumFile(p)
    }
    (Seq(scriptEntry) ++ configEntry ++ depEntries).toMap
  }

  /** Re-hash every input manifest entry (tables.py:21-48). Scala-step
    * entries (`scala://...`) re-hash from the live registry version.
    */
  def manifestFresh(manifest: Map[String, String]): Boolean =
    manifest.forall {
      case (key, cs) if key.startsWith("scala://") =>
        val name = key.stripPrefix("scala://")
        StepRegistry.get(name)
          .exists(s => Checksums.checksumString(s"$name@${s.version}") == cs)
      case (path, cs) =>
        val p = java.nio.file.Paths.get(path)
        Files.exists(p) && Checksums.checksumFile(p) == cs
    }
}

/** How a table step is executed. */
sealed trait ScriptRef {
  /** Sidecar config lives next to the script as `<script>.meta.yaml`
    * (table_metadata.py:36).
    */
  def configPath: Option[Path]
}
final case class FileScript(path: Path) extends ScriptRef {
  def configPath: Option[Path] = {
    val name = path.getFileName.toString
    val base = name.lastIndexOf('.') match {
      case -1 => name
      case i  => name.substring(0, i)
    }
    Some(path.resolveSibling(base + ".meta.yaml"))
  }
}
final case class ScalaScript(name: String, version: String) extends ScriptRef {
  def configPath: Option[Path] = None
}

/** Registry of Scala-native table steps — the Spark port's replacement
  * for arbitrary Python subprocess steps (SURVEY.md A10/A13): a step is a
  * function (SparkSession, depPaths, outPath) => Unit registered under
  * the table path, with a version tag that participates in the Merkle
  * input manifest (bump the version to invalidate downstream tables).
  */
object StepRegistry {
  import org.apache.spark.sql.SparkSession
  final case class ScalaStep(version: String,
                             fn: (SparkSession, Seq[Path], Path) => Unit)
  private val steps = scala.collection.concurrent.TrieMap[String, ScalaStep]()

  def register(tablePath: String, version: String)(
      fn: (SparkSession, Seq[Path], Path) => Unit): Unit =
    steps(tablePath) = ScalaStep(version, fn)

  def get(tablePath: String): Option[ScalaStep] = steps.get(tablePath)
  def clear(): Unit = steps.clear()
}
