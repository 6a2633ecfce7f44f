package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classification joins (SURVEY.md §2 C1–C3).
  *
  * C1 — glossary semi-join (DataCatalogController.py:768–799): which glossary
  * terms appear among an asset's column names. The mapping table is tiny →
  * broadcast left-semi join, zero shuffle on the big side.
  *
  * C2/C3 — smallest-superset containment join
  * (DataCatalogController.py:909–984): for an observed set of infotypes, find
  * the reference row whose `field_infotypes` array is the smallest superset.
  * The reference generates one `unnest` equality per observed infotype plus
  * `order by array_length(...) limit 1`; natively that is a theta join on
  * array containment (`array_except(observed, candidate) == ∅`) plus a
  * per-key `row_number` window. The selection table is small → broadcast
  * theta join; the window partitions by the observed key so no extra shuffle
  * beyond the aggregation that built the observed sets.
  */
object Classify {

  /** C1: glossary terms present among `columns`. `mapping(source_name,
    * canonical_name)`; `columns(column_name)`. Matched canonical terms come
    * back with a `field_value=true` bool field
    * (DataCatalogController.py:781–799).
    */
  def glossaryMatch(mapping: DataFrame, columns: DataFrame): DataFrame = {
    // the BROADCAST side must be bounded at any scale: the mapping is
    // tiny reference data, but `columns` can be a catalog-wide frame —
    // broadcasting it raw would ship the big side to every executor.
    // Distinct the observed NAMES first (map-side combined, vocabulary-
    // sized at any catalog size) and semi-join the mapping against THAT;
    // the semi keeps each mapping row at most once, same as before.
    val observed = columns.select(col("column_name")).distinct()
    mapping.join(
        broadcast(observed),
        mapping("source_name") === observed("column_name"), "left_semi")
      .select(col("canonical_name"), lit(true).as("field_value"))
  }

  /** Containment predicate: every element of `observed` appears in
    * `candidate` (BQ-generated `unnest` equalities ≡ DuckDB
    * `list_has_all(candidate, observed)`).
    */
  def containsAll(candidate: Column, observed: Column): Column =
    size(array_except(observed, candidate)) === 0

  /** C2/C3: for each row of `observed` (keyed `keyCol`, array column
    * `observedCol`), pick from `selection` (array column `candidateCol`) the
    * smallest superset row; ties broken deterministically by `tieCol`
    * (the reference's bare `limit 1` is nondeterministic — SURVEY.md §7
    * "first-row nondeterminism" — so we impose a total order).
    */
  def smallestSuperset(observed: DataFrame, selection: DataFrame,
                       keyCol: String, observedCol: String,
                       candidateCol: String, tieCol: String): DataFrame = {
    val joined = observed.join(
      broadcast(selection),
      containsAll(selection(candidateCol), observed(observedCol)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(size(col(candidateCol)).asc, col(tieCol).asc)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
