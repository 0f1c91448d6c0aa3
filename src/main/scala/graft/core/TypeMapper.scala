package graft.core

import org.apache.spark.sql.types._

/** The reference's type-mapping layer (SURVEY §0 item 5).
  *
  * Maps the adapter's source-side type names to Spark SQL types the way the
  * reference does:
  *   - agate seed types → Spark (reference impl.py:91-110: text→string,
  *     number→double when it has decimals else bigint, date→date,
  *     datetime→timestamp, boolean→boolean)
  *   - result-protocol names reduce parametrized/nested types to their head
  *     (reference connections.py:33-40 splits on '(' and '<');
  *     TEXT/VARCHAR normalize to STRING (column.py:12-16)
  *   - the seed LOAD schema (phase 1 of 2-phase typing,
  *     impl.py:37-64 `ColumnCsvMappingStrategy`): timestamp→string,
  *     bigint→double, date→string — lenient parse first, cast after.
  */
object TypeMapper {

  /** agate→Spark (impl.py:91-110). */
  def fromAgate(agateType: String, hasDecimals: Boolean = false): DataType =
    agateType.toLowerCase match {
      case "text"                     => StringType
      case "number" if hasDecimals    => DoubleType
      case "number"                   => LongType
      case "boolean"                  => BooleanType
      case "date"                     => DateType
      case "datetime" | "timedelta"   => TimestampType
      case other =>
        throw new IllegalArgumentException(s"unknown agate type: $other")
    }

  /** Head type name of a possibly parametrized/nested Spark SQL type string
    * (connections.py:33-40), with TEXT/VARCHAR→STRING (column.py:12-16). */
  def headTypeName(sqlType: String): String = {
    val head = sqlType.split(Array('(', '<')).head.trim.toLowerCase
    head match {
      case "text" | "varchar" => "string"
      case other              => other
    }
  }

  /** Normalize a declared seed column type to a Spark-castable type string
    * (TEXT is an agate/dbt name, not a Spark one — column.py:12-16). */
  def castType(declared: String): String = {
    val lower = declared.trim.toLowerCase
    if (lower == "text" || lower.startsWith("text(")) "string" else declared
  }

  /** Phase-1 load type for a declared seed column type (impl.py:48-56):
    * the type the CSV is parsed AS before the cast projection applies the
    * declared type. */
  def seedLoadType(declared: String): String =
    headTypeName(declared) match {
      case "timestamp" => "string"
      case "bigint"    => "double"
      case "date"      => "string"
      case other       => other
    }
}
