package graft.core

/** A named dataset in the reference's two-level namespace.
  *
  * Mirrors reference dbt/adapters/glue/relation.py:15-28: `schema.identifier`
  * only (no third database level — credentials.py:69-78 rejects
  * database != schema), backtick quoting, and the `<model>_tmp` temp-relation
  * convention (macros/adapters.sql:99-135).
  */
final case class Relation(schema: String, identifier: String, isTemporary: Boolean = false) {
  private def q(part: String): String = s"`${part.replace("`", "``")}`"
  /** Backtick-quoted fully-qualified name (quote char per relation.py:25). */
  def quoted: String = if (isTemporary) q(identifier) else s"${q(schema)}.${q(identifier)}"
  /** Unquoted dotted name for catalog APIs. */
  def name: String = if (isTemporary) identifier else s"$schema.$identifier"
  /** Staging relation for incremental/snapshot work (adapters.sql:99-106). */
  def tmp: Relation = Relation(schema, s"${identifier}_tmp", isTemporary = true)
}

object Relation {
  def temp(identifier: String): Relation = Relation("", identifier, isTemporary = true)

  /** Render a runtime value as a safe single-quoted SQL string literal —
    * the ONLY way data values may enter generated DDL text (partition
    * specs, TBLPROPERTIES). Escapes backslash + single quote; a null
    * partition value renders as Hive's default-partition sentinel, which is
    * how Spark names the directory a null partition row lands in.
    */
  def sqlLiteral(v: Any): String = v match {
    case null => "'__HIVE_DEFAULT_PARTITION__'"
    case other =>
      "'" + other.toString.replace("\\", "\\\\").replace("'", "\\'") + "'"
  }

  /** Parse a raw `schema.identifier` / `identifier` string (no backticks —
    * quoting is THIS type's job; raw dots inside names are not supported,
    * mirroring the reference's 2-level namespace).
    */
  def parse(name: String): Relation = name.split('.') match {
    case Array(id)         => Relation("", id, isTemporary = true)
    case Array(schema, id) => Relation(schema, id)
    case _ =>
      throw new IllegalArgumentException(
        s"expected [schema.]identifier, got '$name'")
  }

  /** A sibling relation of `name` with `suffix` appended to the
    * identifier, PRESERVING the parse semantics — staging/scratch tables
    * derived with `Relation(rel.schema, id + suffix)` broke unqualified
    * (current-database) names: the empty schema rendered as
    * ``` `` ```.`id_suffix` instead of resolving in the current database.
    */
  def sibling(name: String, suffix: String): Relation = {
    val r = parse(name)
    r.copy(identifier = r.identifier + suffix)
  }
}
