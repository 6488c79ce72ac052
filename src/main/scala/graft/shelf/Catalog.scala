package graft.shelf

import java.nio.file.{Files, Path}

/** The shelf catalog: `shelf.yaml` holding version + step→deps map.
  *
  * Reference: /root/reference/src/shelf/core.py:10-61 and
  * schemas/shelf-v1.schema.json (snapshot steps must have zero deps).
  * Structural validation is implemented in code rather than via a
  * JSON-schema engine (none ships with Spark).
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

  def load(root: Path): Catalog = {
    val doc = Yaml.load(root.resolve("shelf.yaml"))
    val version = doc.get("version") match {
      case Some(i: Int) => i
      case Some(other)  => other.toString.toInt
      case None => throw new IllegalArgumentException("shelf.yaml missing version")
    }
    require(version == 1, s"unsupported shelf.yaml version: $version")
    val steps = doc.getOrElse("steps", Map.empty[String, Any]) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].map {
        case (k, v: Seq[_]) => StepURI.parse(k) -> v.map(x => StepURI.parse(x.toString))
        case (k, null)      => StepURI.parse(k) -> Seq.empty[StepURI]
        case (k, v) => throw new IllegalArgumentException(s"bad deps for $k: $v")
      }
      case other => throw new IllegalArgumentException(s"bad steps: $other")
    }
    Catalog(root, version, steps).ensureValid()
  }
}
