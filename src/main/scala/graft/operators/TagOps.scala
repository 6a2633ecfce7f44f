package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Auxiliary tag operations (SURVEY.md §2 C7/C8 + update_tag_subset).
  */
object TagOps {

  /** C7 — tag copy (DataCatalogController.py:1946–2056): read the source
    * asset's tags, re-key them to the target asset, MERGE into state.
    * Column-level tags only copy when the target has that column
    * (existence check ≡ semi-join against the target schema).
    */
  def copyTags(tags: DataFrame, srcAsset: String, tgtAsset: String,
               tgtColumns: DataFrame): DataFrame = {
    val src = tags.filter(col("asset_uri") === srcAsset)
      .withColumn("asset_uri", lit(tgtAsset))
    // NULL column = an entry-level tag (it addresses the asset, not a
    // column — TagStore's <=> key join treats NULL as a legal key, so
    // such rows exist); a bare === ""/=!= "" pair matches NEITHER side
    // and would silently LOSE the row from the copy. The copied row then
    // NORMALIZES to column = "" — every producer in this codebase keys
    // entry-level tags that way (UsageTracking, Registration,
    // ConfigDispatch), and upsert's null-safe key treats NULL and "" as
    // DISTINCT keys, so an un-normalized NULL copy would duplicate an
    // existing ""-keyed tag on the target instead of merging with it
    val entryLevel = src.filter(col("column").isNull || col("column") === "")
      .withColumn("column", coalesce(col("column"), lit("")))
    val columnLevel = src.filter(col("column") =!= "")
      .join(broadcast(tgtColumns), src("column") === tgtColumns("column_name"),
        "left_semi")
    val copied = entryLevel.unionByName(columnLevel)
    TagStore.upsert(tags, copied)
  }

  /** update_tag_subset (main.py surface): overwrite only the provided
    * fields of one existing tag, leaving the others in place.
    */
  def updateTagSubset(tags: DataFrame, assetUri: String, templateId: String,
                      updates: DataFrame): DataFrame = {
    val incoming = updates
      .withColumn("asset_uri", lit(assetUri))
      .withColumn("template_id", lit(templateId))
    TagStore.upsert(tags, incoming.select(tags.columns.toIndexedSeq.map(col): _*))
  }

  /** C8 — policy-tag schema annotation (DataCatalogController.py:1064–1097,
    * 2059–2087): match (column → policy_tag) requests against the table
    * schema and rebuild it with the annotation; unmatched schema columns
    * pass through, requests for unknown columns are dropped (the
    * existence check).
    *
    * RE-ANNOTATION-SAFE: requests carry their tag under a private name so
    * an already-annotated schema (the natural output of a prior run — the
    * "rebuild" shape) never hits an ambiguous `policy_tag` reference, and
    * a request covering a SUBSET of columns preserves the other columns'
    * existing tags instead of clearing them. Requests are deduped per
    * column (max — deterministic) so a duplicated request row cannot fan
    * schema rows out.
    */
  def annotatePolicyTags(schemaCols: DataFrame, requests: DataFrame): DataFrame = {
    val req = requests.groupBy("column_name")
      .agg(max(col("policy_tag")).as("__new_pt"))
    val existing =
      if (schemaCols.columns.contains("policy_tag")) col("policy_tag")
      else lit("")
    schemaCols.join(broadcast(req), Seq("column_name"), "left_outer")
      .withColumn("__pt", coalesce(col("__new_pt"), existing, lit("")))
      .drop("__new_pt")
      .drop("policy_tag")
      .withColumnRenamed("__pt", "policy_tag")
  }
}
