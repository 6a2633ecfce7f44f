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
    * be substrings; no `*` → exact match. The GENERIC form — the BigQuery
    * segments use the reference's exact per-segment rules below
    * ([[datasetPredicate]]/[[tableFragmentsPredicate]]); this one serves
    * the fileset/spanner container and leaf, where the reference's import
    * path takes exact names only and the wildcard support is this
    * engine's generalization.
    */
  def globPredicate(c: Column, expr: String): Column =
    AssetUri.globFragments(expr) match {
      case None        => c === lit(expr)
      case Some(frags) =>
        frags.map(f => c.contains(f)).reduceOption(_ && _).getOrElse(lit(true))
    }

  /** The reference's DATASET-segment wildcard (get_datasets,
    * Resources.py:153–158): ONLY a trailing `*` engages wildcarding, and
    * everything before it — inner stars included — must appear as ONE
    * substring of the dataset name (`dataset[:-1] in ds.dataset_id`).
    * Any other expression, mid-star included, is a LITERAL dataset name
    * (the else-branch appends it verbatim), so `a*b` matches only a
    * dataset literally named `a*b` — i.e. nothing.
    */
  def datasetPredicate(c: Column, expr: String): Column =
    if (expr.endsWith("*")) {
      val frag = expr.dropRight(1)
      if (frag.isEmpty) lit(true) else c.contains(frag)
    } else c === lit(expr)

  /** The reference's TABLE-segment wildcard (Resources.py:238–251): every
    * `*`-split fragment is tested against `table.full_table_id` —
    * `project:dataset.table` — NOT the bare table name, so a fragment
    * that happens to match the project or dataset part matches every
    * table of that dataset's listing. Faithful quirk, kept: `fullId` is
    * the rendered full id of the candidate row.
    */
  def tableFragmentsPredicate(fullId: Column, tableCol: Column,
                              expr: String): Column =
    AssetUri.globFragments(expr) match {
      case None        => tableCol === lit(expr)
      case Some(frags) =>
        frags.map(f => fullId.contains(f)).reduceOption(_ && _)
          .getOrElse(lit(true))
    }

  /** Predicate for one URI pattern against catalog columns. A project-level
    * URI (no dataset) matches every dataset and table (Resources.py:77–101).
    * On a TYPED catalog (carrying `asset_type`, and `instance` for Spanner
    * rows) the fileset/spanner shapes match their own rows — the container
    * segment (entry_group / database) lives in the `dataset` column, the
    * leaf (fileset / table) in `table` (see [[AssetUri]]).
    */
  def uriPredicate(uri: String): Column = uriPredicate(uri, Set.empty)

  def uriPredicate(uri: String, catalogCols: Set[String]): Column = {
    val u = AssetUri.parse(uri)
    val isBq = u.assetType == "bigquery"
    val ty =
      if (catalogCols.contains("asset_type"))
        col("asset_type") === lit(u.assetType)
      else lit(isBq)
    val p = col("project") === lit(u.project)
    val i = u.instance.filter(_ => catalogCols.contains("instance"))
      .map(globPredicate(col("instance"), _)).getOrElse(lit(true))
    // bigquery follows the reference's per-segment rules exactly
    // (trailing-star datasets, full-table-id table fragments); the
    // fileset/spanner shapes keep the generic glob — a generalization,
    // the reference's import path takes exact names there
    val d = u.dataset.map { e =>
      if (isBq) datasetPredicate(col("dataset"), e)
      else globPredicate(col("dataset"), e)
    }.getOrElse(lit(true))
    val t = u.table.map { e =>
      if (isBq)
        tableFragmentsPredicate(
          concat(col("project"), lit(":"), col("dataset"), lit("."),
            col("table")),
          col("table"), e)
      else globPredicate(col("table"), e)
    }.getOrElse(lit(true))
    ty && p && i && d && t
  }

  private def orChain(preds: Seq[Column]): Column =
    preds.reduceOption(_ || _).getOrElse(lit(false))

  /** Expand included URIs minus excluded URIs over the catalog
    * (Resources.py:34–74; set difference at :72). Pure narrow filter.
    */
  def expand(catalog: DataFrame, included: Seq[String],
             excluded: Seq[String]): DataFrame = {
    val cols = catalog.columns.toSet
    val inc = orChain(included.filter(_.nonEmpty).map(uriPredicate(_, cols)))
    val exc = orChain(excluded.filter(_.nonEmpty).map(uriPredicate(_, cols)))
    catalog.filter(inc && !exc)
  }

  /** Set-based [[AssetUri.render]] over typed catalog columns: builds the
    * slashed URI per row from `asset_type` (+ `instance` for Spanner).
    */
  def renderUri(assetType: Column, project: Column, dataset: Column,
                table: Column, instance: Column): Column = {
    val label = when(assetType === "fileset", lit("entry_group"))
      .when(assetType === "spanner", lit("database"))
      .otherwise(lit("dataset"))
    val base = concat_ws("/", assetType, lit("project"), project)
    val withInst = when(assetType === "spanner",
      concat_ws("/", base, lit("instance"), instance)).otherwise(base)
    // a NULL dataset must drop the whole container SEGMENT, matching
    // AssetUri.render's Option fold — concat_ws alone skips only the
    // null VALUE and would emit a dangling ".../dataset" label, a URI
    // that joins nothing (no tag/history key ever renders that way)
    when(dataset.isNull, withInst)
      .otherwise(concat_ws("/", withInst, label, dataset, table))
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
