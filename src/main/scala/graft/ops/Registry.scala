package graft.ops

/** Single source of truth for the query inventory (SURVEY.md §2B/§2C).
  * `SparkEntry` derives both `queries` and `oracleSql` from here so the
  * two maps can never drift apart.
  */
object Registry {
  val all: Seq[Q] =
    Relational.qs ++ Windows.qs ++ Funcs.qs ++ Pipeline.qs ++ Extras.qs ++
      Breadth.qs ++ Sources.qs ++ Linkage.qs

  lazy val byName: Map[String, Q] = {
    val names = all.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).mkString(",")}")
    all.map(q => q.name -> q).toMap
  }
}
