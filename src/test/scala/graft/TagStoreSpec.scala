package graft

import graft.operators.TagStore

/** MERGE-shaped tag lifecycle semantics (DataCatalogController.py:1468–1652). */
class TagStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tags(rows: (String, String)*) =
    rows.toDF("asset_uri", "field_value")
      .select($"asset_uri", org.apache.spark.sql.functions.lit("").as("column"),
        org.apache.spark.sql.functions.lit("t").as("template_id"),
        org.apache.spark.sql.functions.lit("f").as("field_id"), $"field_value")

  test("upsert: incoming wins, unmatched existing survives") {
    val out = TagStore.upsert(tags("a" -> "old", "b" -> "keep"), tags("a" -> "new"))
      .select("asset_uri", "field_value").as[(String, String)].collect().toMap
    assert(out === Map("a" -> "new", "b" -> "keep"))
  }

  test("applyWithDeletes: all-empty incoming deletes the existing tag") {
    val out = TagStore.applyWithDeletes(
        tags("a" -> "old", "b" -> "keep"), tags("a" -> "", "c" -> "new"))
      .select("asset_uri", "field_value").as[(String, String)].collect().toMap
    assert(out === Map("b" -> "keep", "c" -> "new"))
  }

  test("reconcile: replaces tag set only for touched assets") {
    val out = TagStore.reconcile(tags("a" -> "old", "b" -> "keep"), tags("a" -> "new"))
      .select("asset_uri", "field_value").as[(String, String)].collect().toMap
    assert(out === Map("a" -> "new", "b" -> "keep"))
  }
}
