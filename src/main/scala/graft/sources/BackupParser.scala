package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data Catalog JSONL backup/restore source (SURVEY.md §2 A5/B7;
  * BackupFileParser.py:54–126).
  *
  * A backup line holds one entry: identity fields, entry-level `tags`, and
  * per-column `columns[].tags[]`; the restore path keeps only tags of the
  * source template+project, strips `createTime/updateTime/snapshotTime`,
  * and rewrites the target template. All array surgery is done with
  * higher-order functions (`filter`/`transform`) on the nested structure —
  * no explode-regroup round trip, so each entry stays one row until the
  * final flatten.
  */
object BackupParser {

  val tagSchema: StructType = StructType(Seq(
    StructField("template", StringType),
    StructField("templateProject", StringType),
    StructField("fields", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("value", StringType)))))))

  val backupSchema: StructType = StructType(Seq(
    StructField("entryGroupId", StringType),
    StructField("id", StringType),
    StructField("locationId", StringType),
    StructField("projectId", StringType),
    StructField("createTime", StringType),   // stripped on restore
    StructField("updateTime", StringType),   // stripped on restore
    StructField("tags", ArrayType(tagSchema)),
    StructField("columns", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("tags", ArrayType(tagSchema))))))))

  /** Read a JSONL export. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(backupSchema).json(path)

  private def keep(templateId: String, projectId: String) =
    (t: org.apache.spark.sql.Column) =>
      t.getField("template") === templateId &&
        t.getField("templateProject") === projectId

  /** Keep only entries/columns carrying the source template+project; drop
    * non-matching tag objects (BackupFileParser.py:74–122).
    */
  def filterByTemplate(backup: DataFrame, templateId: String,
                       projectId: String): DataFrame = {
    val m = keep(templateId, projectId)
    backup
      .withColumn("tags", filter(col("tags"), m))
      .withColumn("columns",
        filter(
          transform(col("columns"), c => struct(
            c.getField("name").as("name"),
            filter(c.getField("tags"), m).as("tags"))),
          c => size(c.getField("tags")) > 0))
      .filter(size(col("tags")) > 0 || size(col("columns")) > 0)
      .drop("createTime", "updateTime")
  }

  /** Flatten to restore work rows: (entry id, column?, field name/type/
    * value) — the input to the import MERGE (DataCatalogController.py:
    * 1381–1465).
    */
  def toTagRows(filtered: DataFrame): DataFrame = {
    val entryLevel = filtered.select(
      col("projectId"), col("entryGroupId"), col("id").as("entry_id"),
      lit("").as("column"), explode(col("tags")).as("tag"))
    val columnLevel = filtered
      .select(col("projectId"), col("entryGroupId"), col("id").as("entry_id"),
        explode(col("columns")).as("c"))
      // column name arrives as "<entry>:<col>" — keep the column part
      .select(col("projectId"), col("entryGroupId"), col("entry_id"),
        element_at(split(col("c.name"), ":"), -1).as("column"),
        explode(col("c.tags")).as("tag"))
    entryLevel.unionByName(columnLevel)
      .select(col("projectId"), col("entryGroupId"), col("entry_id"),
        col("column"), explode(col("tag.fields")).as("f"))
      .select(col("projectId"), col("entryGroupId"), col("entry_id"),
        col("column"), col("f.name").as("field_id"),
        col("f.type").as("field_type"), col("f.value").as("field_value"))
  }
}
