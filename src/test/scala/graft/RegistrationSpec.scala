package graft

import org.apache.spark.sql.functions._
import graft.operators.Registration

/** Product-registration sweep: trigger filter, fan-out scope, status flip. */
class RegistrationSpec extends SparkSpec {
  import spark.implicits._

  private def tags(rows: (String, String)*) = rows.toSeq
    .toDF("asset_uri", "field_value")
    .select(col("asset_uri"), lit("").as("column"),
      lit("data_product").as("template_id"), lit("status").as("field_id"),
      lit("enum").as("field_type"), col("field_value"))

  private val mapping = Seq(("product/p1", "a1"), ("product/p2", "a2"))
    .toDF("product_uri", "asset_uri")
  private val facts = Seq(("a1", 5L), ("a2", 7L)).toDF("asset_uri", "n_rows")

  test("only PENDING products fan out; their status flips to REVIEW") {
    val out = Registration.registerPending(
      tags("product/p1" -> "PENDING", "product/p2" -> "APPROVED"),
      mapping, facts, "data_resource")
    val statuses = out.filter(col("template_id") === "data_product")
      .select("asset_uri", "field_value").as[(String, String)].collect().toMap
    assert(statuses === Map("product/p1" -> "REVIEW", "product/p2" -> "APPROVED"))
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
