package graft.shelf

import java.nio.file.{Files, Path}

/** The shelf catalog: `shelf.yaml` holding version + step→deps map.
  *
  * Reference: /root/reference/src/shelf/core.py:10-61 and
  * schemas/shelf-v1.schema.json (snapshot steps must have zero deps).
  * Structural validation runs the embedded shelf-v1 schema through
  * [[Schemas]] (load and save, like the reference), then code checks
  * for the rules the schema cannot express.
  */
final case class Catalog(root: Path, version: Int,
                         steps: Map[StepURI, Seq[StepURI]]) {

  def configPath: Path = root.resolve("shelf.yaml")

  def save(): Unit = {
    val doc = Map[String, Any](
      "version" -> version,
      "data_dir" -> "data",
      "steps" -> steps.toSeq.sortBy(_._1).map { case (k, v) =>
        k.toString -> v.sorted.map(_.toString)
      }.toMap)
    // validate-before-save, the reference's core.py:60 discipline
    Schemas.ensure(doc, Schemas.ShelfV1, "shelf.yaml")
    Yaml.save(configPath, doc)
  }

  def addStep(uri: StepURI, deps: Seq[StepURI] = Seq.empty): Catalog =
    copy(steps = steps + (uri -> deps)).ensureValid()

  def ensureValid(): Catalog = {
    steps.foreach { case (uri, deps) =>
      if (uri.scheme == "snapshot")
        require(deps.isEmpty, s"snapshot step $uri must have no dependencies")
      deps.foreach { d =>
        require(steps.contains(d) || d.scheme == "snapshot",
          s"dependency $d of $uri is not a known step")
      }
    }
    this
  }

  def dag: Dag.Deps = steps
}

object Catalog {

  def init(root: Path): Catalog = {
    require(!Files.exists(root.resolve("shelf.yaml")),
      s"shelf.yaml already exists in $root")
    val c = Catalog(root, version = 1, steps = Map.empty)
    c.save()
    c
  }

  /** Load + validate. The document is first validated against the
    * embedded shelf-v1 schema ([[Schemas.ShelfV1]] — the reference's
    * jsonschema.validate at core.py:27-35), yielding schema-keyed
    * errors; the code checks below then cover what the schema cannot
    * express (version == 1, URI parse, unknown-dependency), with
    * `shelf.yaml: field '...'`-style messages — never an opaque
    * cast/parse error.
    */
  def load(root: Path): Catalog = {
    val doc = Yaml.load(root.resolve("shelf.yaml"))
    Schemas.ensure(doc, Schemas.ShelfV1, "shelf.yaml")
    val version = doc.get("version") match {
      case Some(i: Int) => i
      case Some(other) =>
        try other.toString.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"shelf.yaml: field 'version' must be an integer, got '$other'")
        }
      case None => throw new IllegalArgumentException(
        "shelf.yaml: required field 'version' is missing")
    }
    if (version != 1) throw new IllegalArgumentException(
      s"shelf.yaml: field 'version' must be 1, got $version")
    def parseUri(context: String, s: String): StepURI =
      try StepURI.parse(s)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"shelf.yaml: $context: ${e.getMessage}")
      }
    val steps = doc.getOrElse("steps", Map.empty[String, Any]) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].map {
        case (k, v: Seq[_]) => parseUri("field 'steps'", k) ->
          v.map(x => parseUri(s"field 'steps', deps of '$k'", x.toString))
        case (k, null)      => parseUri("field 'steps'", k) -> Seq.empty[StepURI]
        case (k, v) => throw new IllegalArgumentException(
          s"shelf.yaml: field 'steps', entry '$k': dependencies must be a list, got '$v'")
      }
      case other => throw new IllegalArgumentException(
        s"shelf.yaml: field 'steps' must be a map of step URI to dependency list, got '$other'")
    }
    Catalog(root, version, steps).ensureValid()
  }
}
