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
  *   fileset/project/P/entry_group/G/F     (fileset entry; constants.py:18,
  *                                          DataCatalogController.py:1244–1252)
  *   spanner/project/P/instance/I/database/D/T
  *                                         (Spanner table; constants.py:19,
  *                                          DataCatalogController.py:1254–1269)
  * }}}
  * with `*`-wildcards allowed in the container and table segments
  * (Resources.py:149–162, 238–251). The slot mapping for non-BQ types keeps
  * one shape for the whole engine: `dataset` holds the container
  * (entry_group / database), `table` the leaf (fileset / table), and
  * `instance` is the extra Spanner segment.
  */
final case class AssetUri(
    assetType: String,           // "bigquery" | "fileset" | "spanner" | "gs"
    project: String,
    dataset: Option[String],
    table: Option[String],
    column: Option[String],
    instance: Option[String] = None) {

  /** The label of the container segment in the slashed form. */
  private def containerLabel: String = assetType match {
    case "fileset" => "entry_group"
    case "spanner" => "database"
    case _         => "dataset"
  }

  /** Catalog-facing slashed form, e.g. `bigquery/project/p/dataset/d/t` or
    * `spanner/project/p/instance/i/database/d/t`.
    */
  def render: String = {
    val base = s"$assetType/project/$project"
    val i = instance.map(i => s"$base/instance/$i").getOrElse(base)
    val d = dataset.map(d => s"$i/$containerLabel/$d").getOrElse(i)
    val t = table.map(t => s"$d/$t").getOrElse(d)
    column.map(c => s"$t/column/$c").getOrElse(t)
  }

  /** Singular-segment path used by the tag-history sink
    * (`/dataset/…/table/…[/column/…]`, BigQueryUtils.py:123–128), typed per
    * asset kind.
    */
  def historyAssetName: String = {
    val leafLabel = if (assetType == "fileset") "fileset" else "table"
    val base = instance.map(i => s"$project/instance/$i").getOrElse(project) +
      s"/$containerLabel/${dataset.getOrElse("")}"
    val t = table.map(t => s"$base/$leafLabel/$t").getOrElse(base)
    column.map(c => s"$t/column/$c").getOrElse(t)
  }
}

object AssetUri {
  /** Parse any supported slashed shape (Resources.py:165–269 input shapes
    * plus the fileset/spanner entries of DataCatalogController.py:1240–1292).
    * Unknown shapes throw — configs are validated at load time, not per-row.
    */
  def parse(uri: String): AssetUri = {
    val parts = uri.stripSuffix("/").split("/").toList
    parts match {
      case "bigquery" :: "project" :: p :: "dataset" :: d :: t :: Nil =>
        AssetUri("bigquery", p, Some(d), Some(t), None)
      case "bigquery" :: "project" :: p :: "dataset" :: d :: Nil =>
        AssetUri("bigquery", p, Some(d), None, None)
      case "bigquery" :: "project" :: p :: Nil =>
        AssetUri("bigquery", p, None, None, None)
      case "fileset" :: "project" :: p :: "entry_group" :: g :: f :: Nil =>
        AssetUri("fileset", p, Some(g), Some(f), None)
      case "fileset" :: "project" :: p :: "entry_group" :: g :: Nil =>
        AssetUri("fileset", p, Some(g), None, None)
      case "spanner" :: "project" :: p :: "instance" :: i :: "database" ::
          d :: t :: Nil =>
        AssetUri("spanner", p, Some(d), Some(t), None, Some(i))
      case "spanner" :: "project" :: p :: "instance" :: i :: "database" ::
          d :: Nil =>
        AssetUri("spanner", p, Some(d), None, None, Some(i))
      case _ =>
        throw new IllegalArgumentException(s"unsupported asset uri: $uri")
    }
  }

  /** Historical name for the BQ-only parser; now parses every shape. */
  def parseBq(uri: String): AssetUri = parse(uri)

  /** Wildcard token semantics (Resources.py:238–251): an expression is split
    * on `*` and every non-empty fragment must appear as a substring of the
    * candidate name. No `*` means exact equality.
    */
  def globFragments(expr: String): Option[Seq[String]] =
    if (!expr.contains("*")) None
    else Some(expr.split("\\*").toSeq.filter(_.nonEmpty))
}
