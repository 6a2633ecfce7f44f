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
    val entryLevel = src.filter(col("column") === "")
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
    TagStore.upsert(tags, incoming.select(tags.columns.map(col): _*))
  }

  /** C8 — policy-tag schema annotation (DataCatalogController.py:1064–1097,
    * 2059–2087): match (column → policy_tag) requests against the table
    * schema and rebuild it with the annotation; unmatched schema columns
    * pass through, requests for unknown columns are dropped (the
    * existence check).
    */
  def annotatePolicyTags(schemaCols: DataFrame, requests: DataFrame): DataFrame =
    schemaCols.join(broadcast(requests), Seq("column_name"), "left_outer")
      .withColumn("policy_tag", coalesce(col("policy_tag"), lit("")))
}
