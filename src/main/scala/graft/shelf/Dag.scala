package graft.shelf

import scala.collection.mutable

/** DAG utilities: topological order, pruning, `latest` resolution.
  *
  * Reference: /root/reference/src/shelf/steps.py:10-94 and
  * /root/reference/src/shelf/__init__.py:273-282.
  */
object Dag {

  type Deps = Map[StepURI, Seq[StepURI]]

  /** Kahn's algorithm with deterministic (sorted) tie-breaking; the
    * reference relies on graphlib.TopologicalSorter.static_order()
    * (steps.py:67-74). Cycles raise.
    */
  def topoSort(dag: Deps): Seq[StepURI] = {
    val nodes = (dag.keySet ++ dag.values.flatten).toSeq.sorted
    val depsOf = mutable.Map[StepURI, mutable.SortedSet[StepURI]]()
    nodes.foreach(n => depsOf(n) = mutable.SortedSet(dag.getOrElse(n, Seq.empty): _*))
    val ready = mutable.SortedSet(nodes.filter(depsOf(_).isEmpty): _*)
    val out = mutable.ArrayBuffer[StepURI]()
    while (ready.nonEmpty) {
      val n = ready.head
      ready.remove(n)
      out += n
      nodes.foreach { m =>
        if (depsOf(m).contains(n)) {
          depsOf(m).remove(n)
          if (depsOf(m).isEmpty) ready.add(m)
        }
      }
    }
    if (out.size != nodes.size)
      throw new IllegalStateException("cycle detected in DAG")
    out.toSeq
  }

  /** Keep steps matching `regex`, plus all transitive ancestors AND
    * descendants (steps.py:10-37).
    */
  def pruneWithRegex(dag: Deps, regex: String): Deps = {
    val re = regex.r
    val seed = dag.keySet.filter(s => re.findFirstIn(s.toString).isDefined)
    if (seed.isEmpty) return Map.empty

    val parents: Map[StepURI, Seq[StepURI]] = dag
    val children: Map[StepURI, Seq[StepURI]] = dag.toSeq
      .flatMap { case (step, deps) => deps.map(_ -> step) }
      .groupMap(_._1)(_._2)

    def closure(start: Set[StepURI], next: StepURI => Seq[StepURI]): Set[StepURI] = {
      val seen = mutable.Set(start.toSeq: _*)
      val queue = mutable.Queue(start.toSeq: _*)
      while (queue.nonEmpty) {
        val n = queue.dequeue()
        next(n).foreach { m => if (seen.add(m)) queue.enqueue(m) }
      }
      seen.toSet
    }

    val keep = closure(seed, n => parents.getOrElse(n, Seq.empty)) ++
      closure(seed, n => children.getOrElse(n, Seq.empty))
    dag.collect { case (s, deps) if keep(s) => s -> deps.filter(keep) }
  }

  /** Drop steps that are complete AND whose ancestors are all clean —
    * dirty = ¬completed ∨ any-dep-dirty, walked in topo order
    * (steps.py:40-54). `isCompleted` re-hashes inputs (the Merkle check).
    */
  def pruneCompleted(dag: Deps, isCompleted: StepURI => Boolean): Deps = {
    val dirty = mutable.Set[StepURI]()
    topoSort(dag).foreach { step =>
      val deps = dag.getOrElse(step, Seq.empty)
      if (deps.exists(dirty) || !isCompleted(step)) dirty += step
    }
    dag.collect { case (s, deps) if dirty(s) => s -> deps.filter(dirty) }
  }

  /** Rewrite `latest`-versioned dependencies to the max concrete version among
    * steps sharing the stem (__init__.py:273-282, core.py:71-79).
    * Lexicographic max is correct for ISO dates, and a literal `latest`
    * step wins over any date ('l' > '9').
    */
  def resolveLatest(dag: Deps): Deps = {
    def resolve(dep: StepURI): StepURI =
      if (!dep.isLatest) dep
      else {
        val candidates = dag.keys.filter(k =>
          k.scheme == dep.scheme && k.stem == dep.stem)
        if (candidates.isEmpty) dep else candidates.max
      }
    dag.map { case (step, deps) => step -> deps.map(resolve) }
  }
}
