package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-registration workflow parity
  * (extensions/product_registration_pipeline/main.py): a data-product tag
  * whose `data_product_status` field ([[StatusFieldId]] — NOT a generic
  * `status`) flips to 'PENDING' triggers generation of the
  * product's resource tags over all of its data assets; once generated,
  * the product's status moves to 'REVIEW' so the data steward can sign
  * off before access is granted.
  *
  * The reference is event-driven glue (Data Catalog tag-update event →
  * cloud function → Tag Engine API calls, one product at a time). The
  * Spark form is one set-based transition over the WHOLE product
  * portfolio: the trigger is a filter on the product-tag table, the
  * generation a fan-out join from the product→asset mapping, and the
  * status flip a keyed MERGE — any number of pending products register in
  * one pass.
  */
object Registration {

  /** The workflow-state field the reference triggers on and rewrites:
    * `data_product_status` (the log-router inclusion filter matches
    * `…fields.data_product_status.enumValue.displayName="PENDING"`,
    * README:98, and the update payload names the same field_id,
    * main.py:139) — not a generic `status`.
    */
  val StatusFieldId = "data_product_status"

  /** The companion field the reference's update_tag_subset call rewrites
    * alongside the flip (main.py:140: `last_modified_date` ←
    * now().strftime("%Y-%m-%d %H:%M:%S")).
    */
  val LastModifiedFieldId = "last_modified_date"

  /** One registration sweep. Inputs:
    *  - `productTags`: unified tag rows for the `data_product` template
    *    (the [[StatusFieldId]] field rows carry the workflow state);
    *  - `mapping(product_uri, asset_uri)`: the product's data assets;
    *  - `assetFacts(asset_uri, n_rows)`: per-asset facts for the dynamic
    *    resource field (catalog metadata, computed once upstream).
    *  - `now`: the clock value written into `last_modified_date` on the
    *    flip (injectable so batch runs and the oracle stay
    *    deterministic; production passes the reference's second-truncated
    *    wall clock).
    * Output: the NEXT tag state — product tags with PENDING→REVIEW
    * flipped and their `last_modified_date` stamped (the two
    * changed_fields of the reference's update_tag_subset call), plus the
    * generated `data_resource` tags (static steward/env fields + the
    * n_rows fact) for every pending product's assets.
    */
  def registerPending(productTags: DataFrame, mapping: DataFrame,
                      assetFacts: DataFrame,
                      resourceTemplateId: String,
                      now: Column = date_format(current_timestamp(),
                        "yyyy-MM-dd HH:mm:ss")): DataFrame = {
    val pending = productTags
      // the trigger value and the written value are UPPERCASE in the
      // reference (the pubsub filter matches displayName="PENDING",
      // README:98; the function writes 'REVIEW', main.py:139)
      .filter(col("field_id") === StatusFieldId &&
        col("field_value") === "PENDING")
      .select(col("asset_uri").as("product_uri")).distinct()
    // trigger → generation fan-out: assets of pending products only.
    // assetFacts dedupes to ONE row per asset before the join (min() —
    // the deterministic-survivor rule UsageTracking's lookup join uses):
    // a duplicate facts row would otherwise fan every generated field out
    // twice, with conflicting n_rows if the duplicates disagree
    val assets = mapping.join(pending, Seq("product_uri"), "left_semi")
      .select("asset_uri").distinct()
      .join(assetFacts.groupBy("asset_uri")
        .agg(min(col("n_rows")).as("n_rows")), Seq("asset_uri"), "left")
    val fields = Seq(
      struct(lit("steward").as("field_id"), lit("string").as("field_type"),
        lit("governance").as("field_value")),
      struct(lit("env").as("field_id"), lit("enum").as("field_type"),
        lit("PROD").as("field_value")),
      struct(lit("n_rows").as("field_id"), lit("double").as("field_type"),
        col("n_rows").cast("string").as("field_value")))
    val generated = assets
      .select(col("asset_uri"), lit("").as("column"),
        lit(resourceTemplateId).as("template_id"),
        explode(array(fields: _*)).as("f"))
      .select(col("asset_uri"), col("column"), col("template_id"),
        col("f.field_id"), col("f.field_type"), col("f.field_value"))
      // an asset MISSING from assetFacts emits steward/env but NO n_rows
      // row (the established skip-field-on-missing-value rule), instead
      // of silently writing a typed double field whose value is NULL
      .filter(col("field_id") =!= "n_rows" || col("field_value").isNotNull)
    // status flip: the reference's update_tag_subset writes TWO
    // changed_fields on the triggering product — data_product_status →
    // 'REVIEW' and last_modified_date → now (main.py:139–141) — so the
    // pending set joins back (broadcast: products are portfolio-sized)
    // and both field rows rewrite together
    val flipped = productTags
      .join(broadcast(pending.withColumn("__pending", lit(true))),
        productTags("asset_uri") === pending("product_uri"), "left")
      .withColumn("field_value",
        when(col("__pending") && col("field_id") === StatusFieldId,
          lit("REVIEW"))
        .when(col("__pending") && col("field_id") === LastModifiedFieldId,
          now.cast("string"))
        .otherwise(col("field_value")))
      .drop("product_uri", "__pending")
    flipped.unionByName(generated)
  }
}
