package graft

import org.apache.spark.sql.functions._
import graft.model.{FieldSpec, TagConfig}
import graft.operators.TagEngine

/** §3.1 end-to-end job semantics: overwrite gate + merge into state. */
class TagEngineSpec extends SparkSpec {
  import spark.implicits._

  private def catalog = Lake.tableNames.map(t => ("p", "lake", t))
    .toDF("project", "dataset", "table")

  private val config = TagConfig(
    configType = "DYNAMIC_TAG_TABLE", templateId = "gov",
    fields = Seq(FieldSpec("n_rows", "double",
      Some("select count(*) from $table"))),
    includedUris = Seq("bigquery/project/p/dataset/lake/region",
      "bigquery/project/p/dataset/lake/nation"))

  test("runJob with overwrite=false skips already-tagged assets") {
    Lake.registerAll(spark, sf)
    val existing = Seq(
      ("bigquery/project/p/dataset/lake/region", "", "gov", "n_rows", "999"))
      .toDF("asset_uri", "column", "template_id", "field_id", "field_value")
    val out = TagEngine.runJob(spark, config.copy(overwrite = false),
        catalog, existing)
      .select("asset_uri", "field_value").as[(String, String)].collect().toMap
    // region keeps the old value (skip); nation gets computed count 25
    assert(out("bigquery/project/p/dataset/lake/region") === "999")
    assert(out("bigquery/project/p/dataset/lake/nation") === "25")
  }

  test("runJob with overwrite=true recomputes tagged assets") {
    Lake.registerAll(spark, sf)
    val existing = Seq(
      ("bigquery/project/p/dataset/lake/region", "", "gov", "n_rows", "999"))
      .toDF("asset_uri", "column", "template_id", "field_id", "field_value")
    val out = TagEngine.runJob(spark, config, catalog, existing)
      .select("asset_uri", "field_value").as[(String, String)].collect().toMap
    assert(out("bigquery/project/p/dataset/lake/region") === "5")
  }
}
