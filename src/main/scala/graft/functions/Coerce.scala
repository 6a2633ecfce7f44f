package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Typed tag-field coercion (SURVEY.md §1.2; DataCatalogController.py
  * 1510–1569 / 1857–1943).
  *
  * The reference coerces per value in Python if/else chains; here each rule
  * is a pure `Column => Column` so it stays inside whole-stage codegen — no
  * UDFs anywhere. ANSI-safe: `try_*` variants are used wherever the input
  * string is data-driven, so a malformed value yields NULL (the reference's
  * "skip field" behavior) instead of failing the job.
  */
object Coerce {

  /** bool: string `'TRUE'` → true, ANYTHING else → false — including
    * NULL: the reference's string path is `if field_value == 'TRUE'` with
    * else → False (DataCatalogController.py:1510–1518), so None and every
    * non-'TRUE' string land False. A bare `===` propagates NULL instead,
    * silently dropping such rows from any `= false` filter downstream.
    * (The non-import path, :1872–1875, is Python `bool(field_value)` on an
    * already-typed query result — no string parsing to mirror there.)
    *
    * DELIBERATE DEVIATION, mirrored by the oracle: the reference compares
    * the value UNTRIMMED and CASE-SENSITIVELY, so a CSV cell `'TRUE '`
    * (trailing pad) or `'true'` (lowercase — routine in hand-edited
    * imports) is silently False there. We trim + uppercase first (trim
    * also in [[timestamp]]'s length heuristic) because padding and case
    * are noise, not signal; the q05/q06 oracles encode the same lenient
    * rule so the gate pins the deviation rather than hiding it.
    */
  def bool(v: Column): Column =
    coalesce(upper(trim(v)) === lit("TRUE"), lit(false))

  /** string: passthrough `str(value)` (1523–1526). */
  def string(v: Column): Column = v.cast("string")

  /** double: `float(value)`; invalid → NULL (1527–1530, 1885–1888). */
  def double(v: Column): Column = v.try_cast(DoubleType)

  /** enum: value must be a member of the template's enum_values, else NULL
    * (skip). The reference assigns the display_name unchecked
    * (DataCatalogController.py:1539–1542, 1889–1892) and lets the Data
    * Catalog API reject a non-member at write time; with no API here, the
    * membership check models that rejection as a skipped field (the
    * template's enum_values come from the template read, :107–142).
    */
  def enumOf(v: Column, allowed: Seq[String]): Column =
    when(v.isInCollection(allowed), v)

  /** richtext: N values joined with `'<br>'` (1531–1537, 1880–1884). The
    * caller supplies a *deterministically ordered* array — `collect_list`
    * order is not stable across runs, so sort first.
    */
  def richtext(values: Column): Column = concat_ws("<br>", values)

  /** richtext export form swaps `<br>` for `, ` (DataCatalogController.py:1177). */
  def richtextExport(v: Column): Column = regexp_replace(v, "<br>", ", ")

  /** The reference's timestamp heuristic (1544–1569, 1893–1936):
    * length 10 → date at 00:00 UTC; length 19 → `yyyy-MM-dd HH:mm:ss`;
    * otherwise an ISO-ish fallback parse. Encoded as a deterministic
    * when-chain; session timezone must be UTC (build.sbt sets it).
    */
  def timestamp(v: Column): Column = {
    val t = trim(v)
    when(length(t) === 10, try_to_timestamp(t, lit("yyyy-MM-dd")))
      .when(length(t) === 19, try_to_timestamp(t, lit("yyyy-MM-dd HH:mm:ss")))
      .otherwise(try_to_timestamp(t))
  }

  /** Dispatch by template field type — the engine-side analogue of
    * `populate_tag_field` (1857–1943). Returns a Column of the field's
    * native Spark type.
    */
  def coerce(fieldType: String, v: Column, enumValues: Seq[String] = Nil): Column =
    fieldType match {
      case "bool"                    => bool(v)
      case "double"                  => double(v)
      case "enum"                    => enumOf(v, enumValues)
      case "richtext"                => v.cast("string")
      case "timestamp" | "datetime"  => timestamp(v)
      case _                         => string(v)
    }
}
