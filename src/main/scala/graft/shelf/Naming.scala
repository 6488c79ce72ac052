package graft.shelf

import scala.collection.mutable

/** Pure naming algorithms: snake-casing, table aliases, and dependency
  * name simplification.
  *
  * Reference: /root/reference/src/shelf/__init__.py:434-489 and
  * /root/reference/src/shelf/tables.py:184-225; behavior pinned by
  * tests/test_shelf.py:572-594.
  */
object Naming {

  /** `a/b/c-d.x` → `a_b_cd` (__init__.py:434-435). */
  def pathToSnake(path: String): String = {
    val noExt = path.lastIndexOf('.') match {
      case -1 => path
      case i  => path.substring(0, i)
    }
    noExt.replace("/", "_").replace("-", "")
  }

  /** True when a snake-cased name ends in a version suffix. The reference
    * regex has a typo (`d{4}` without backslash, __init__.py:489) that
    * mis-ranks date-versioned aliases; we implement the documented intent
    * (prefer unversioned aliases) with a correct pattern. Note aliases are
    * snake-cased first, so a date suffix looks like `_20240726`.
    */
  def hasVersion(name: String): Boolean =
    name.matches(""".*_(\d{8}|latest)$""")

  private def betterAlias(a: String, b: Option[String]): String = b match {
    case None => a
    case Some(bb) =>
      // Order by (has version, length, name) — prefer unversioned, then
      // shorter, then lexicographic (__init__.py:481-485).
      Seq((hasVersion(a), a.length, a), (hasVersion(bb), bb.length, bb)).min._3
  }

  /** All unique path-suffix aliases (with/without version) per table;
    * best alias per table by `betterAlias` (__init__.py:447-478).
    * Returns (alias, table_name) pairs, both snake-cased.
    */
  def tableAliases(tables: Seq[String]): Seq[(String, String)] = {
    val potential = mutable.Map[String, mutable.Set[String]]()
    tables.foreach { path =>
      val parts = path.split("/")
      (0 until parts.length - 1).foreach { i =>
        val noVersion = parts.slice(i, parts.length - 1).mkString("/")
        if (noVersion.nonEmpty)
          potential.getOrElseUpdate(noVersion, mutable.Set()) += path
        val withVersion = parts.slice(i, parts.length).mkString("/")
        if (withVersion != path)
          potential.getOrElseUpdate(withVersion, mutable.Set()) += path
      }
    }
    val best = mutable.Map[String, String]() // table_name -> alias
    potential.toSeq.sortBy(_._1).foreach { case (alias, paths) =>
      if (paths.size == 1) {
        val tableName = pathToSnake(paths.head)
        val tableAlias = pathToSnake(alias)
        best(tableName) = betterAlias(tableAlias, best.get(tableName))
      }
    }
    best.toSeq.map { case (name, alias) => (alias, name) }.sortBy(_._2)
  }

  /** Shortest-unique semantic names for a step's dependency paths:
    * start from `parts[-2]`, extend with parent prefixes on conflict,
    * finally suffix the version; fail on livelock (tables.py:184-225 —
    * where the version-suffix candidate is generated but unreachable dead
    * code; we make it reachable, which is strictly more resolving).
    * Returns name → path.
    */
  def simplifyDependencyNames(deps: Seq[String]): Map[String, String] = {
    def candidates(dep: String): Iterator[String] = {
      val parts = dep.split("/").toSeq // ns / ... / name / version
      val base = parts(parts.length - 2)
      // base, parent_base, grandparent_parent_base, ..., full chain
      val names = parts.dropRight(2).reverseIterator
        .scanLeft(base)((name, p) => s"${p}_$name").toSeq
      val version = parts.last.replace("-", "")
      (names :+ s"${names.last}_$version").iterator
    }

    val iters = deps.map(d => d -> candidates(d)).toMap
    var frontier: Map[String, String] = deps.map(d => d -> iters(d).next()).toMap
    val mapping = mutable.Map[String, String]()

    var lastDuplicates: Set[String] = Set.empty
    var done = false
    while (!done) {
      val dupNames = frontier.groupBy(_._2).collect {
        case (n, m) if m.size >= 2 => n
      }.toSet
      frontier.foreach { case (dep, name) =>
        if (!dupNames(name)) mapping(name) = dep
      }
      frontier = frontier.filter { case (_, name) => dupNames(name) }
      if (frontier.isEmpty) done = true
      else {
        if (dupNames == lastDuplicates && lastDuplicates.nonEmpty)
          throw new IllegalStateException(
            s"infinite loop resolving dependency names: $deps")
        lastDuplicates = dupNames
        frontier = frontier.map { case (dep, _) =>
          val it = iters(dep)
          dep -> (if (it.hasNext) it.next()
                  else throw new IllegalStateException(
                    s"cannot uniquely name dependencies: $deps"))
        }
      }
    }
    mapping.toMap
  }
}
