package graft.expand

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.AssetUri

/** URI-pattern expansion over a catalog listing (SURVEY.md §2 A1–A3, B1/B2).
  *
  * The reference enumerates assets by listing the live catalog and matching
  * each dataset/table name against the config's included/excluded URI
  * expressions, then set-differencing (Resources.py:34–74, 165–269). Here the
  * catalog is a DataFrame `(project, dataset, table)` and the whole
  * include−exclude algebra compiles to ONE filter predicate — no shuffle, no
  * collect, and at 100 TB the predicate is pushed into the metastore/parquet
  * scan of the catalog listing itself. The data-driven variant (exclude a
  * *set* computed at runtime, e.g. already-tagged assets for
  * `overwrite=false`, DataCatalogController.py:230–243) is a left-anti join
  * instead (see [[minusExisting]]).
  */
object Expander {

  /** Wildcard predicate (Resources.py:238–251): all `*`-split fragments must
    * be substrings; no `*` → exact match.
    */
  def globPredicate(c: Column, expr: String): Column =
    AssetUri.globFragments(expr) match {
      case None        => c === lit(expr)
      case Some(frags) =>
        frags.map(f => c.contains(f)).reduceOption(_ && _).getOrElse(lit(true))
    }

  /** Predicate for one URI pattern against catalog columns. A project-level
    * URI (no dataset) matches every dataset and table (Resources.py:77–101).
    */
  def uriPredicate(uri: String): Column = {
    val u = AssetUri.parseBq(uri)
    val p = col("project") === lit(u.project)
    val d = u.dataset.map(globPredicate(col("dataset"), _)).getOrElse(lit(true))
    val t = u.table.map(globPredicate(col("table"), _)).getOrElse(lit(true))
    p && d && t
  }

  private def orChain(preds: Seq[Column]): Column =
    preds.reduceOption(_ || _).getOrElse(lit(false))

  /** Expand included URIs minus excluded URIs over the catalog
    * (Resources.py:34–74; set difference at :72). Pure narrow filter.
    */
  def expand(catalog: DataFrame, included: Seq[String],
             excluded: Seq[String]): DataFrame = {
    val inc = orChain(included.filter(_.nonEmpty).map(uriPredicate))
    val exc = orChain(excluded.filter(_.nonEmpty).map(uriPredicate))
    catalog.filter(inc && !exc)
  }

  /** Incremental-skip semantics (`overwrite=false`,
    * DataCatalogController.py:230–243, 752–758): drop work items that already
    * carry a tag. The reference probes the catalog per asset; set-based
    * anti-join does it in one pass and scales with the tag table, not with
    * RPC quota.
    */
  def minusExisting(work: DataFrame, existing: DataFrame,
                    keys: Seq[String]): DataFrame =
    work.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
