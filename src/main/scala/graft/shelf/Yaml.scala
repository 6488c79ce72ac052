package graft.shelf

import java.nio.file.{Files, Path}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.{YAMLFactory, YAMLGenerator}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Minimal YAML I/O over Jackson (ships with Spark). Documents are plain
  * `Map[String, Any]` — the reference's metadata layer is schema-light
  * YAML too (/root/reference/src/shelf/utils.py:52-53).
  */
object Yaml {
  private val mapper: ObjectMapper = {
    val factory = YAMLFactory.builder()
      .disable(YAMLGenerator.Feature.WRITE_DOC_START_MARKER)
      .build()
    val m = new ObjectMapper(factory)
    m.registerModule(DefaultScalaModule)
    m
  }

  def load(path: Path): Map[String, Any] =
    Option(mapper.readValue(Files.readString(path), classOf[Map[String, Any]]))
      .getOrElse(Map.empty)

  def loadString(s: String): Map[String, Any] =
    Option(mapper.readValue(s, classOf[Map[String, Any]])).getOrElse(Map.empty)

  def dump(doc: Map[String, Any]): String =
    mapper.writeValueAsString(sortKeys(doc))

  def save(path: Path, doc: Map[String, Any]): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.writeString(path, dump(doc))
  }

  /** Round-trip-stable output: keys sorted at every level
    * (/root/reference/src/shelf/core.py:53-61 saves sorted).
    */
  private def sortKeys(v: Any): Any = v match {
    case m: Map[_, _] =>
      scala.collection.immutable.SortedMap(
        m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1): _*)
        .map { case (k, x) => k -> sortKeys(x) }
    case s: Seq[_] => s.map(sortKeys)
    case other => other
  }
}
