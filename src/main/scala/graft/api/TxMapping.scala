package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Column mapping for `ALTER TABLE RENAME/DROP COLUMN` — the
  * Delta/Iceberg name-mapping shape over the txtable commit log:
  *
  *  - every column has a PHYSICAL name — what its bytes are called in
  *    parquet footers and in the log's per-file skipping metadata
  *    (stats/sstats/mstats/bloom keys). It is assigned ONCE when the
  *    column enters the schema (CREATE / evolve) and NEVER changes:
  *    RENAME only moves the LOGICAL name, DROP retires the physical
  *    name forever (recorded under [[RetiredProp]] in the table
  *    properties, so a later ADD of the same logical name gets a
  *    FRESH physical name and can never resurrect the dropped
  *    column's bytes). Physical-name immutability is what makes every
  *    translation in the read/write paths race-free: a rename
  *    interleaving with an append changes no file's column names.
  *  - the LOGICAL→physical association rides the log-recorded schema
  *    ([[TxTable.State.schemaB64]]) as per-field metadata under
  *    [[PhysKey]] — the propsB64/schemaB64 plumbing, so it follows
  *    time travel (each snapshot reads under ITS logical names),
  *    checkpoints, restore and expiry for free. A table whose fields
  *    all satisfy physical == logical (every table until its first
  *    rename/drop) has NO mapping and takes every pre-existing code
  *    path unchanged.
  *  - readers read files under the PHYSICAL schema and rename to
  *    logical in one simultaneous projection (swap-renames are legal);
  *    writers rename logical→physical before staging. Only TABLE DATA
  *    files carry physical names — del files (f, pos) and staged CDF
  *    change files keep their own shapes.
  *
  * Reference behavior: `/root/reference` delegates DDL to DuckDB,
  * where RENAME/DROP are catalog metadata operations; this reproduces
  * that contract over immutable parquet + a commit log, per Delta's
  * column-mapping (name mode) design.
  */
private[graft] object TxMapping {

  /** StructField metadata key carrying the field's physical name when
    * it differs from the logical name. Stripped from every schema that
    * DEFINES a table (CREATE/CTAS/REPLACE/overwrite) and from every
    * read output — the mapping lives ONLY in the commit log.
    */
  val PhysKey = "graft.physical"

  /** Table property: comma-separated physical names retired by DROP
    * COLUMN. A retired physical may still exist in live data files;
    * fresh columns must never re-claim it.
    */
  val RetiredProp = "graft.mapping.retired"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey)
    else f.name

  /** Whether any field reads/writes under a different physical name.
    * The fast negative: unmapped tables skip every translation below.
    */
  def isMapped(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name)

  /** logical name → physical name (identity entries included). */
  def toPhysicalMap(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> physicalName(f)).toMap

  /** physical name → logical name. */
  def toLogicalMap(schema: StructType): Map[String, String] =
    schema.fields.map(f => physicalName(f) -> f.name).toMap

  private def withoutPhysKey(m: Metadata): Metadata =
    if (!m.contains(PhysKey)) m
    else new MetadataBuilder().withMetadata(m).remove(PhysKey).build()

  /** Strip [[PhysKey]] from every field — applied to schemas that
    * DEFINE a table: without it, `CREATE TABLE AS SELECT * FROM
    * mapped_table` would inherit mapping metadata through Spark's
    * alias propagation and read its own (logically-named) files under
    * the WRONG physical names.
    */
  def stripMapping(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      f.copy(metadata = withoutPhysKey(f.metadata))))

  /** The schema the FILES carry: logical field order, physical names,
    * mapping metadata stripped (files must never re-state the map).
    */
  def toPhysicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      f.copy(name = physicalName(f), metadata = withoutPhysKey(f.metadata))))

  /** Rename `df`'s columns through `renames` in ONE simultaneous
    * projection (aliases all resolve against the INPUT, so swap
    * renames — a→b, b→a — are exact). Columns outside the map pass
    * through untouched; renamed outputs carry [[PhysKey]]-free
    * metadata so the mapping never leaks into downstream footers.
    */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame =
    if (renames.forall { case (from, to) => from == to }) df
    else df.select(df.schema.fields.toIndexedSeq.map { f =>
      val c: Column = df.col("`" + f.name.replace("`", "``") + "`")
      renames.get(f.name) match {
        case Some(to) if to != f.name =>
          c.as(to, withoutPhysKey(f.metadata))
        case _ => c
      }
    }: _*)

  /** Write-side: logical column names → physical, for TABLE DATA
    * frames about to stage into a snapshot whose logical schema is
    * `logical`. Extra columns (DV provenance, `_change`) pass through.
    */
  def toPhysicalDf(df: DataFrame, logical: StructType): DataFrame =
    if (!isMapped(logical)) df
    else renameColumns(df, toPhysicalMap(logical)
      .filter { case (l, p) => l != p })

  /** Read-side: physical column names → logical, for frames read raw
    * from table data files of a snapshot whose logical schema is
    * `logical`. Extra columns pass through.
    */
  def toLogicalDf(df: DataFrame, logical: StructType): DataFrame =
    if (!isMapped(logical)) df
    else renameColumns(df, toLogicalMap(logical)
      .filter { case (p, l) => l != p })

  /** Single-name logical→physical translator: the map is built ONCE
    * (not per invocation — the returned function may run per file ×
    * dimension in pruning filters); identity function when unmapped
    * or the snapshot records no schema.
    */
  def toPhysicalName(logical: Option[StructType]): String => String =
    logical.filter(isMapped) match {
      case Some(lg) => val m = toPhysicalMap(lg); c => m.getOrElse(c, c)
      case None => identity
    }

  /** Single-name physical→logical translator, same contract. */
  def toLogicalName(logical: Option[StructType]): String => String =
    logical.filter(isMapped) match {
      case Some(lg) => val m = toLogicalMap(lg); c => m.getOrElse(c, c)
      case None => identity
    }

  /** Strip [[PhysKey]] from a DataFrame's field metadata (no renames)
    * — the one place the 'mapping never reaches footers' scrub lives.
    * Returns the frame untouched when no field carries the key.
    */
  def scrubMappingDf(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(_.metadata.contains(PhysKey))) df
    else df.select(df.schema.fields.toIndexedSeq.map(f =>
      df.col("`" + f.name.replace("`", "``") + "`")
        .as(f.name, withoutPhysKey(f.metadata))): _*)

  /** Rename a schema's fields through a name map (identity for names
    * outside it), mapping metadata scrubbed — for building the
    * physical twin of a PRUNED read schema, whose fields may have
    * lost their metadata on the way through Spark's column pruning.
    */
  def renameSchema(s: StructType, m: Map[String, String]): StructType =
    StructType(s.fields.map(f => f.copy(name = m.getOrElse(f.name, f.name),
      metadata = withoutPhysKey(f.metadata))))

  /** Translate a constraint map keyed by logical column names to the
    * physical names the log's skipping metadata is keyed by. Names
    * outside the schema pass through (conservative: they match no
    * recorded stats and prune nothing).
    */
  def keysToPhysical[V](m: Map[String, V],
                        logical: StructType): Map[String, V] =
    if (!isMapped(logical)) m
    else {
      val t = toPhysicalMap(logical)
      m.map { case (k, v) => t.getOrElse(k, k) -> v }
    }

  /** Translate a V1 source filter tree's attribute names
    * logical→physical, for pushing into the parquet reader on mapped
    * scans. A filter referencing anything outside the map (metadata
    * columns, unknown names) returns None — it is simply not pushed;
    * every filter stays residual above the scan regardless.
    *
    * SOUNDNESS: the pushed filter must be IMPLIED by the original
    * (skipped row groups must provably hold no matching row — the
    * residual re-filter cannot resurrect skipped rows). Dropping one
    * side of an AND only WEAKENS the predicate, which is sound in
    * positive polarity — but under a NOT the weakening inverts into a
    * strengthening, so inside any Not the child must translate
    * EXACTLY (`strict`): a partially-translated And there returns
    * None and the whole Not is not pushed.
    */
  def filterToPhysical(f: org.apache.spark.sql.sources.Filter,
                       t: Map[String, String],
                       strict: Boolean = false)
      : Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    def att(a: String): Option[String] = t.get(a)
    f match {
      case EqualTo(a, v) => att(a).map(EqualTo(_, v))
      case EqualNullSafe(a, v) => att(a).map(EqualNullSafe(_, v))
      case GreaterThan(a, v) => att(a).map(GreaterThan(_, v))
      case GreaterThanOrEqual(a, v) => att(a).map(GreaterThanOrEqual(_, v))
      case LessThan(a, v) => att(a).map(LessThan(_, v))
      case LessThanOrEqual(a, v) => att(a).map(LessThanOrEqual(_, v))
      case In(a, vs) => att(a).map(In(_, vs))
      case IsNull(a) => att(a).map(IsNull)
      case IsNotNull(a) => att(a).map(IsNotNull)
      case StringStartsWith(a, v) => att(a).map(StringStartsWith(_, v))
      case StringEndsWith(a, v) => att(a).map(StringEndsWith(_, v))
      case StringContains(a, v) => att(a).map(StringContains(_, v))
      case And(l, r) =>
        (filterToPhysical(l, t, strict), filterToPhysical(r, t, strict)) match {
          case (Some(a), Some(b)) => Some(And(a, b))
          // one translatable side still prunes (weakening — positive
          // polarity only; under a Not this must fail the whole tree)
          case (Some(a), None) if !strict => Some(a)
          case (None, Some(b)) if !strict => Some(b)
          case _ => None
        }
      case Or(l, r) =>
        // BOTH sides must translate: a dropped OR side NARROWS the
        // pushed predicate, unsound in every polarity
        for (a <- filterToPhysical(l, t, strict);
             b <- filterToPhysical(r, t, strict))
          yield Or(a, b)
      case Not(c) => filterToPhysical(c, t, strict = true).map(Not)
      case _ => None
    }
  }

  /** Retired physical names from a property map. */
  def retired(props: Map[String, String]): Set[String] =
    props.get(RetiredProp).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty).toSet

  /** A fresh physical name for a column entering the schema as
    * `logical`: the logical name itself unless that physical is or
    * ever was in use (current physicals ∪ retired ∪ this batch's
    * picks) — then a version-qualified name, still collision-checked.
    */
  def freshPhysical(logical: String, schema: StructType,
                    retiredSet: Set[String], atVersion: Long,
                    taken: Set[String] = Set.empty): String = {
    val used = schema.fields.map(physicalName).toSet ++ retiredSet ++ taken
    if (!used(logical)) logical
    else {
      var cand = s"${logical}_p$atVersion"
      while (used(cand)) cand = cand + "_"
      cand
    }
  }

  /** Field carrying an explicit physical name (only when it differs). */
  def fieldWithPhysical(f: StructField, physical: String): StructField =
    if (physical == f.name) f.copy(metadata = withoutPhysKey(f.metadata))
    else f.copy(metadata = new MetadataBuilder()
      .withMetadata(withoutPhysKey(f.metadata))
      .putString(PhysKey, physical).build())
}
