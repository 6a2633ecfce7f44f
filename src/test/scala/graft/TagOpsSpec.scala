package graft

import org.apache.spark.sql.functions._
import graft.operators.TagOps

/** update_tag_subset semantics (reference: main.py:2868–2912 →
  * DataCatalogController.update_tag_subset): a partial-field overwrite of
  * ONE tag touches exactly the provided fields of exactly the addressed
  * (asset, template) tag.
  */
class TagOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tagState = Seq(
    ("a1", "", "t", "owner", "alice"),
    ("a1", "", "t", "status", "DRAFT"),
    ("a1", "c0", "t", "pii", "none"),
    ("a1", "", "u", "owner", "ops"),   // other template, same asset
    ("a2", "", "t", "owner", "bob"))   // other asset, same template
    .toDF("asset_uri", "column", "template_id", "field_id", "field_value")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, String, String, String, String)].collect()
      .map(t => (t._1, t._2, t._3, t._4) -> t._5).toMap

  test("partial-field overwrite preserves untouched fields") {
    val updates = Seq(("", "owner", "carol")).toDF("column", "field_id", "field_value")
    val out = asMap(TagOps.updateTagSubset(tagState, "a1", "t", updates))
    assert(out(("a1", "", "t", "owner")) === "carol")        // overwritten
    assert(out(("a1", "", "t", "status")) === "DRAFT")       // untouched field survives
    assert(out(("a1", "c0", "t", "pii")) === "none")         // other column untouched
    assert(out(("a1", "", "u", "owner")) === "ops")          // other template untouched
    assert(out(("a2", "", "t", "owner")) === "bob")          // other asset untouched
    assert(out.size === 5)                                    // nothing dropped or duplicated
  }

  test("a field id absent from the existing tag upserts as a new field") {
    val updates = Seq(("", "steward", "dq-team")).toDF("column", "field_id", "field_value")
    val out = asMap(TagOps.updateTagSubset(tagState, "a1", "t", updates))
    assert(out(("a1", "", "t", "steward")) === "dq-team")
    assert(out.size === 6)
  }

  test("column-level subset update addresses only that column's tag") {
    val updates = Seq(("c0", "pii", "email")).toDF("column", "field_id", "field_value")
    val out = asMap(TagOps.updateTagSubset(tagState, "a1", "t", updates))
    assert(out(("a1", "c0", "t", "pii")) === "email")
    assert(out(("a1", "", "t", "owner")) === "alice")
    assert(out.size === 5)
  }

  test("copyTags: a NULL-column source tag copies as entry-level, not silently dropped") {
    val withNull = tagState.unionByName(
      Seq(("a1", "t", "note", "keep")).toDF("asset_uri", "template_id",
          "field_id", "field_value")
        .withColumn("column", lit(null).cast("string"))
        .select("asset_uri", "column", "template_id", "field_id",
          "field_value"))
    val tgtCols = Seq("c0").toDF("column_name")
    val out = TagOps.copyTags(withNull, "a1", "a9", tgtCols)
      .filter(col("asset_uri") === "a9")
    // the NULL-column row survives the copy (=== ""/=!= "" both miss it)
    // AND normalizes to the codebase's entry-level key column = "" —
    // upsert's null-safe key treats NULL and "" as DISTINCT, so a NULL
    // copy would duplicate an existing ""-keyed tag instead of merging
    assert(out.filter(col("column") === "" &&
      col("field_id") === "note").count() === 1)
    assert(out.filter(col("column").isNull).count() === 0)
  }

  test("annotatePolicyTags: re-annotation preserves existing tags and never goes ambiguous") {
    import graft.operators.TagOps
    val schema = Seq(("ssn", "STRING"), ("name", "STRING"), ("age", "INT"))
      .toDF("column_name", "data_type")
    val first = TagOps.annotatePolicyTags(schema,
      Seq(("ssn", "pii_high"), ("name", "pii_low")).toDF("column_name",
        "policy_tag"))
    // re-annotate the ALREADY-annotated output with a SUBSET request:
    // previously an ambiguous policy_tag reference; and the untouched
    // column's existing tag must survive, not reset to ""
    val second = TagOps.annotatePolicyTags(first,
      Seq(("ssn", "pii_redacted")).toDF("column_name", "policy_tag"))
    val got = second.select("column_name", "policy_tag")
      .as[(String, String)].collect().toMap
    assert(got === Map("ssn" -> "pii_redacted", "name" -> "pii_low",
      "age" -> ""))
    // a duplicated request row must not fan schema rows out
    val dup = TagOps.annotatePolicyTags(schema,
      Seq(("ssn", "a"), ("ssn", "b")).toDF("column_name", "policy_tag"))
    assert(dup.count() === 3)
    assert(dup.filter(col("column_name") === "ssn")
      .select("policy_tag").as[String].collect().toSeq === Seq("b"))
  }
}
