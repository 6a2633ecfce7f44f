package graft.model

/** Asset URI algebra.
  *
  * The reference scatters URI string surgery across many call sites
  * (Resources.py:131–147, DataCatalogController.py:775, 873–876, 1053);
  * SURVEY.md §7 calls for centralizing it in one tested type. URIs take the
  * shapes
  * {{{
  *   bigquery/project/P/dataset/D          (dataset-level)
  *   bigquery/project/P/dataset/D/T        (table-level)
  *   bigquery/project/P                    (project-level: all datasets/tables)
  * }}}
  * with `*`-wildcards allowed in the dataset and table segments
  * (Resources.py:149–162, 238–251).
  */
final case class AssetUri(
    assetType: String,           // "bigquery" | "fileset" | "spanner" | "gs"
    project: String,
    dataset: Option[String],
    table: Option[String],
    column: Option[String]) {

  /** Catalog-facing slashed form, e.g. `bigquery/project/p/dataset/d/t`. */
  def render: String = {
    val base = s"$assetType/project/$project"
    val d = dataset.map(d => s"$base/dataset/$d").getOrElse(base)
    val t = table.map(t => s"$d/$t").getOrElse(d)
    column.map(c => s"$t/column/$c").getOrElse(t)
  }

  /** Singular-segment path used by the tag-history sink
    * (`/dataset/…/table/…[/column/…]`, BigQueryUtils.py:123–128).
    */
  def historyAssetName: String = {
    val base = s"$project/dataset/${dataset.getOrElse("")}"
    val t = table.map(t => s"$base/table/$t").getOrElse(base)
    column.map(c => s"$t/column/$c").getOrElse(t)
  }
}

object AssetUri {
  /** Parse `bigquery/project/P[/dataset/D[/T]]` (Resources.py:165–269 input
    * shapes). Unknown shapes throw — configs are validated at load time, not
    * per-row.
    */
  def parseBq(uri: String): AssetUri = {
    val parts = uri.stripSuffix("/").split("/").toList
    parts match {
      case "bigquery" :: "project" :: p :: "dataset" :: d :: t :: Nil =>
        AssetUri("bigquery", p, Some(d), Some(t), None)
      case "bigquery" :: "project" :: p :: "dataset" :: d :: Nil =>
        AssetUri("bigquery", p, Some(d), None, None)
      case "bigquery" :: "project" :: p :: Nil =>
        AssetUri("bigquery", p, None, None, None)
      case _ =>
        throw new IllegalArgumentException(s"unsupported asset uri: $uri")
    }
  }

  /** Wildcard token semantics (Resources.py:238–251): an expression is split
    * on `*` and every non-empty fragment must appear as a substring of the
    * candidate name. No `*` means exact equality.
    */
  def globFragments(expr: String): Option[Seq[String]] =
    if (!expr.contains("*")) None
    else Some(expr.split("\\*").toSeq.filter(_.nonEmpty))
}
