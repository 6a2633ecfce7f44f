package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.CoreQueries.Q

/** Tag-engine-parity queries, part 4: the operators that were spec-only in
  * round 2 now under the oracle gate — JSONL backup restore (A5/B7), bulk
  * reconcile (A10), template field ordering (B3/E3).
  */
object CoreQueries4 {

  /** One JSONL line per catalog entry (BackupFileParser.py:54–126 shapes):
    * e1 carries source-template tags at entry and column level plus a
    * non-matching tag that must be stripped; e2 has only foreign-template
    * tags (dropped); e3 matches the template but not the project (dropped).
    */
  private val backupLines = Seq(
    """{"entryGroupId":"eg1","id":"e1","locationId":"us","projectId":"p1",
      |"createTime":"2024-01-01T00:00:00Z","updateTime":"2024-01-02T00:00:00Z",
      |"tags":[
      | {"template":"gov","templateProject":"p1","fields":[
      |   {"name":"owner","type":"string","value":"alice"},
      |   {"name":"score","type":"double","value":"5"}]},
      | {"template":"ops","templateProject":"p1","fields":[
      |   {"name":"oncall","type":"string","value":"bob"}]}],
      |"columns":[
      | {"name":"e1:c1","tags":[
      |   {"template":"gov","templateProject":"p1","fields":[
      |     {"name":"pii","type":"bool","value":"true"}]}]},
      | {"name":"e1:c2","tags":[
      |   {"template":"ops","templateProject":"p1","fields":[
      |     {"name":"oncall","type":"string","value":"bob"}]}]}]}"""
      .stripMargin.replace("\n", ""),
    """{"entryGroupId":"eg1","id":"e2","locationId":"us","projectId":"p1",
      |"tags":[{"template":"ops","templateProject":"p1","fields":[
      |  {"name":"oncall","type":"string","value":"carol"}]}],
      |"columns":[]}""".stripMargin.replace("\n", ""),
    """{"entryGroupId":"eg2","id":"e3","locationId":"us","projectId":"p2",
      |"tags":[{"template":"gov","templateProject":"p2","fields":[
      |  {"name":"owner","type":"string","value":"dave"}]}],
      |"columns":[]}""".stripMargin.replace("\n", ""))

  /** A5/B7 under the gate: JSONL backup → template+project filter (nested
    * higher-order-function surgery) → flattened restore rows.
    */
  def q34BackupRestore(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.BackupParser
    CoreQueries.withTempDir(spark, "graft_bak") { tmp =>
      java.nio.file.Files.write(tmp.resolve("backup.jsonl"),
        backupLines.mkString("\n").getBytes("UTF-8"))
      val backup = BackupParser.read(spark, tmp.toString)
      BackupParser.toTagRows(
          BackupParser.filterByTemplate(backup, "gov", "p1"))
        .orderBy("entry_id", "column", "field_id")
    }
  }

  /** The fixture is driver-authored, so the oracle states the expected
    * restore rows directly (like q24's file-scan oracle): e1's gov tags
    * survive at entry and column level, the ops tag and the foreign-project
    * entry are stripped.
    */
  val q34Oracle: String =
    """SELECT * FROM (VALUES
      |  ('p1', 'eg1', 'e1', '', 'owner', 'string', 'alice'),
      |  ('p1', 'eg1', 'e1', '', 'score', 'double', '5'),
      |  ('p1', 'eg1', 'e1', 'c1', 'pii', 'bool', 'true'))
      |  AS t(projectId, entryGroupId, entry_id, "column", field_id,
      |       field_type, field_value)
      |ORDER BY entry_id, "column", field_id""".stripMargin

  /** A10 under the gate: ReconcileTagsRequest semantics — the incoming set
    * atomically REPLACES all tags in its touched (asset, template) scopes;
    * untouched assets survive (`whenNotMatchedBySource.delete` scoped).
    */
  def q35Reconcile(spark: SparkSession, dir: String): DataFrame = {
    import graft.Lake
    import graft.operators.TagStore
    val docs = Lake.table(spark, dir, "documents")
    val existing = docs.filter(col("doc_id") % 2 === 0).select(
      concat(lit("doc_"), col("doc_id")).as("asset_uri"),
      lit("").as("column"), lit("t").as("template_id"),
      lit("status").as("field_id"), lit("old").as("field_value"))
    val incoming = docs.filter(col("doc_id") % 4 === 0).select(
      concat(lit("doc_"), col("doc_id")).as("asset_uri"),
      concat(lit("c"), col("doc_id") % 2).as("column"),
      lit("t").as("template_id"),
      lit("quality").as("field_id"), col("lang").as("field_value"))
    TagStore.reconcile(existing, incoming)
      .orderBy("asset_uri", "field_id")
  }

  val q35Oracle: String =
    """WITH existing AS (
      |  SELECT 'doc_' || doc_id AS asset_uri, '' AS "column",
      |         't' AS template_id, 'status' AS field_id, 'old' AS field_value
      |  FROM documents WHERE doc_id % 2 = 0),
      |incoming AS (
      |  SELECT 'doc_' || doc_id AS asset_uri, 'c' || (doc_id % 2) AS "column",
      |         't' AS template_id, 'quality' AS field_id, lang AS field_value
      |  FROM documents WHERE doc_id % 4 = 0),
      |untouched AS (
      |  SELECT e.* FROM existing e WHERE NOT EXISTS (
      |    SELECT 1 FROM incoming i
      |    WHERE i.asset_uri = e.asset_uri AND i.template_id = e.template_id))
      |SELECT * FROM untouched
      |UNION ALL
      |SELECT * FROM incoming
      |ORDER BY asset_uri, field_id""".stripMargin

  /** B3/E3 under the gate: template fields apply in DESCENDING `order`
    * (DataCatalogController.py:152) with a deterministic tiebreak; the
    * model's `ordered` projection drives the rank.
    */
  def q36FieldOrdering(spark: SparkSession, dir: String): DataFrame = {
    import graft.model.{TagTemplate, TemplateField}
    import spark.implicits._
    val tmpl = TagTemplate("gov", Seq(
      TemplateField("owner", "string", order = 2),
      TemplateField("score", "double", order = 9),
      TemplateField("env", "enum", order = 5),
      TemplateField("notes", "richtext", order = 0)))
    tmpl.ordered.zipWithIndex
      .map { case (f, i) => (f.fieldId, f.fieldType, f.order, i + 1) }
      .toDF("field_id", "field_type", "field_order", "apply_rank")
      .orderBy("apply_rank")
  }

  val q36Oracle: String =
    """SELECT field_id, field_type, field_order,
      |  CAST(row_number() OVER (ORDER BY field_order DESC) AS INT)
      |    AS apply_rank
      |FROM (VALUES
      |  ('owner', 'string', 2), ('score', 'double', 9),
      |  ('env', 'enum', 5), ('notes', 'richtext', 0))
      |  AS t(field_id, field_type, field_order)
      |ORDER BY apply_rank""".stripMargin

  /** ENTRY_CREATE config end-to-end through the dispatch (A6 +
    * apply_entry_config): three parquet files expand from their globs;
    * schema field counts AND record counts come from driver-side parquet
    * FOOTER reads (zero Spark jobs — the same metadata the reference
    * reads via `ParquetFile(tmp).metadata`), and the output is the
    * unified tag-row shape every other config type produces. The `size`
    * field is restricted away by `config.fields` — file byte size is
    * writer-dependent, which an engine-independent oracle cannot pin.
    */
  def q37EntryConfig(spark: SparkSession, dir: String): DataFrame = {
    import graft.model.{FieldSpec, TagConfig}
    import graft.operators.{ConfigDispatch, EngineInputs}
    val config = TagConfig(
      configType = "ENTRY_CREATE",
      templateId = "file_metadata",
      fields = Seq("name", "type", "num_rows", "num_cols")
        .map(f => FieldSpec(f)),
      includedUris = Seq(s"$dir/region.parquet", s"$dir/nation.parquet",
        s"$dir/supplier.parquet"))
    val none = spark.emptyDataFrame
    ConfigDispatch.applyConfig(spark, config, EngineInputs(none, none))
      .orderBy("asset_uri", "field_id")
  }

  val q37Oracle: String =
    """WITH f AS (
      |  SELECT 'fileset/region' AS asset_uri, 'region.parquet' AS name,
      |         (SELECT count(*) FROM region) AS num_rows, 2 AS num_cols
      |  UNION ALL
      |  SELECT 'fileset/nation', 'nation.parquet',
      |         (SELECT count(*) FROM nation), 3
      |  UNION ALL
      |  SELECT 'fileset/supplier', 'supplier.parquet',
      |         (SELECT count(*) FROM supplier), 4),
      |m AS (
      |  SELECT asset_uri, 'name' AS field_id, 'string' AS field_type,
      |         name AS field_value FROM f
      |  UNION ALL
      |  SELECT asset_uri, 'type', 'enum', 'PARQUET' FROM f
      |  UNION ALL
      |  SELECT asset_uri, 'num_rows', 'double',
      |         CAST(num_rows AS VARCHAR) FROM f
      |  UNION ALL
      |  SELECT asset_uri, 'num_cols', 'double',
      |         CAST(num_cols AS VARCHAR) FROM f)
      |SELECT asset_uri, '' AS "column", 'file_metadata' AS template_id,
      |       field_id, field_type, field_value
      |FROM m ORDER BY asset_uri, field_id""".stripMargin

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q34_backup_restore", q34BackupRestore _, Some(q34Oracle)),
    ("q35_reconcile", q35Reconcile _, Some(q35Oracle)),
    ("q36_field_ordering", q36FieldOrdering _, Some(q36Oracle)),
    ("q37_entry_config", q37EntryConfig _, Some(q37Oracle)))
}
