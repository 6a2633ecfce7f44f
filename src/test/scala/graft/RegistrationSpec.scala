package graft

import org.apache.spark.sql.functions._
import graft.operators.Registration

/** Product-registration sweep: trigger filter, fan-out scope, and the
  * two-field flip (data_product_status → REVIEW, last_modified_date →
  * now) the reference's update_tag_subset call performs.
  */
class RegistrationSpec extends SparkSpec {
  import spark.implicits._

  private def tags(rows: (String, String)*) = rows.toSeq
    .flatMap { case (p, s) =>
      Seq((p, Registration.StatusFieldId, "enum", s),
        (p, Registration.LastModifiedFieldId, "timestamp", "2022-08-21"))
    }
    .toDF("asset_uri", "field_id", "field_type", "field_value")
    .select(col("asset_uri"), lit("").as("column"),
      lit("data_product").as("template_id"), col("field_id"),
      col("field_type"), col("field_value"))

  private val mapping = Seq(("product/p1", "a1"), ("product/p2", "a2"))
    .toDF("product_uri", "asset_uri")
  private val facts = Seq(("a1", 5L), ("a2", 7L)).toDF("asset_uri", "n_rows")

  test("only PENDING products fan out; status AND last_modified flip") {
    val out = Registration.registerPending(
      tags("product/p1" -> "PENDING", "product/p2" -> "APPROVED"),
      mapping, facts, "data_resource", now = lit("2024-01-02 03:04:05"))
    val prod = out.filter(col("template_id") === "data_product")
      .select("asset_uri", "field_id", "field_value")
      .as[(String, String, String)].collect()
      .map { case (a, f, v) => (a, f) -> v }.toMap
    assert(prod(("product/p1", Registration.StatusFieldId)) === "REVIEW")
    assert(prod(("product/p2", Registration.StatusFieldId)) === "APPROVED")
    // the reference rewrites last_modified_date in the SAME
    // update_tag_subset payload (main.py:140) — but only on the
    // triggering product; the non-pending product's stamp must survive
    assert(prod(("product/p1", Registration.LastModifiedFieldId))
      === "2024-01-02 03:04:05")
    assert(prod(("product/p2", Registration.LastModifiedFieldId))
      === "2022-08-21")
    // generation scoped to the pending product's assets only
    val generated = out.filter(col("template_id") === "data_resource")
    assert(generated.select("asset_uri").distinct()
      .as[String].collect().toSeq === Seq("a1"))
    val n = generated.filter(col("field_id") === "n_rows")
      .select("field_value").as[String].head()
    assert(n === "5")
  }

  test("no pending products: status table unchanged, nothing generated") {
    val in = tags("product/p1" -> "REVIEW", "product/p2" -> "APPROVED")
    val out = Registration.registerPending(in, mapping, facts, "data_resource")
    assert(out.count() === in.count())
    assert(out.exceptAll(in).count() === 0)
  }
}
