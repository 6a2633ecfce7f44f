package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expand.Expander
import graft.model.{AssetUri, TagConfig}

/** The end-to-end config pipeline (SURVEY.md §3.1/§3.2): what the reference
  * runs as HTTP hops (`trigger_job` → `_split_work` → N×`_run_task`) is one
  * driver program here — expansion builds the asset work set, evaluation is
  * a union of combined-query DataFrames (one per asset TABLE — each query
  * itself distributed), and the terminal MERGE + history append is the
  * fan-in.
  *
  * Collecting the expanded asset list to the driver is deliberate: it is
  * catalog METADATA (table names — thousands at the reference's largest
  * load test), not data. Row-level fan-out (static/import/glossary configs)
  * never collects — those paths stay fully set-based (see Expander /
  * TagStore / Classify).
  */
object TagEngine {

  /** Apply a dynamic-table config: expand → substitute+evaluate each
    * field's query per asset (combined into ONE statement per asset,
    * DataCatalogController.py:488–495) → melt to tag rows
    * `(asset_uri, column, template_id, field_id, field_type, field_value)`.
    */
  def applyDynamicTableConfig(spark: SparkSession, config: TagConfig,
                              catalog: DataFrame): DataFrame = {
    val assets = Expander
      .expand(catalog, config.includedUris, config.excludedUris)
      .select("project", "dataset", "table")
      .collect()
      .map(r => AssetUri("bigquery", r.getString(0), Some(r.getString(1)),
        Some(r.getString(2)), None))
    val (queryFields, staticFields) =
      config.fields.partition(_.queryExpression.isDefined)
    val perAsset = assets.map { uri =>
      val evaluated =
        if (queryFields.nonEmpty) ConfigEval.evalCombined(spark, queryFields, uri)
        else spark.range(1).select(lit(uri.render).as("asset_uri"))
      val withStatics = staticFields.foldLeft(evaluated) { (df, f) =>
        df.withColumn(f.fieldId, lit(f.fieldValue.getOrElse("")))
      }
      val fieldCols = config.fields.map { f =>
        struct(lit(f.fieldId).as("field_id"), lit(f.fieldType).as("field_type"),
          col(f.fieldId).cast("string").as("field_value"))
      }
      withStatics.select(col("asset_uri"),
          explode(array(fieldCols: _*)).as("f"))
        .select(col("asset_uri"), lit("").as("column"),
          lit(config.templateId).as("template_id"),
          col("f.field_id"), col("f.field_type"), col("f.field_value"))
    }
    perAsset.reduce(_ unionByName _)
  }

  /** Apply a dynamic-column config (DataCatalogController.py:363–485):
    * `included_columns_query` yields the target columns (a 1-row query —
    * driver metadata), then each column gets the combined field evaluation
    * with `$column` substitution; output is column-level tag rows.
    */
  def applyDynamicColumnConfig(spark: SparkSession, config: TagConfig,
                               uri: AssetUri): DataFrame = {
    val colsQuery = ConfigEval.substitute(
      config.includedColumnsQuery.getOrElse(
        throw new IllegalArgumentException("included_columns_query required")),
      uri)
    val columns = spark.sql(colsQuery).first().toSeq.map(_.toString)
    val perColumn = columns.map { c =>
      ConfigEval.evalCombined(spark, config.fields, uri, Some(c))
        .select(col("asset_uri"), lit(c).as("column"),
          lit(config.templateId).as("template_id"),
          explode(array(config.fields.map { f =>
            struct(lit(f.fieldId).as("field_id"),
              lit(f.fieldType).as("field_type"),
              col(f.fieldId).cast("string").as("field_value"))
          }: _*)).as("f"))
        .select(col("asset_uri"), col("column"), col("template_id"),
          col("f.field_id"), col("f.field_type"), col("f.field_value"))
    }
    perColumn.reduce(_ unionByName _)
  }

  /** Full job: evaluate + MERGE into the existing tag state, honoring
    * `overwrite=false` (skip assets already tagged with this template,
    * DataCatalogController.py:230–243) and delete-when-all-empty.
    */
  def runJob(spark: SparkSession, config: TagConfig, catalog: DataFrame,
             existingTags: DataFrame): DataFrame = {
    val computed = applyDynamicTableConfig(spark, config, catalog)
    val incoming =
      if (config.overwrite) computed
      else Expander.minusExisting(computed,
        existingTags.filter(col("template_id") === config.templateId)
          .select("asset_uri").distinct(),
        Seq("asset_uri"))
    TagStore.applyWithDeletes(existingTags, incoming)
  }
}
