package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.model.{FieldSpec, TagConfig, TagTemplate, TemplateField}
import graft.operators.{ConfigDispatch, EngineInputs}
import graft.sources.BackupParser

/** One dispatcher, nine reference config types (main.py:3597–3628): each
  * branch routes to the right operator pipeline and lands in the unified
  * tag-row (or report) shape.
  */
class ConfigDispatchSpec extends SparkSpec {
  import spark.implicits._

  private def catalog = Lake.tableNames.map(t => ("p", "lake", t))
    .toDF("project", "dataset", "table")

  private def noTags = Seq.empty[(String, String, String, String, String)]
    .toDF("asset_uri", "column", "template_id", "field_id", "field_value")

  private def base = EngineInputs(catalog, noTags)

  test("DYNAMIC_TAG_TABLE routes to the combined-query pipeline") {
    Lake.registerAll(spark, sf)
    val cfg = TagConfig("DYNAMIC_TAG_TABLE", "gov",
      Seq(FieldSpec("n_rows", "double", Some("select count(*) from $table"))),
      includedUris = Seq("bigquery/project/p/dataset/lake/region"))
    val out = ConfigDispatch.applyConfig(spark, cfg, base)
      .select("asset_uri", "field_id", "field_value")
      .as[(String, String, String)].collect()
    assert(out.toSeq === Seq(
      ("bigquery/project/p/dataset/lake/region", "n_rows", "5")))
  }

  test("STATIC_TAG_ASSET fans static fields over the expanded assets") {
    val cfg = TagConfig("STATIC_TAG_ASSET", "gov",
      Seq(FieldSpec("env", "enum", None, Some("PROD")),
        FieldSpec("owner", "string", None, Some("core"))),
      includedUris = Seq("bigquery/project/p/dataset/lake/nation",
        "bigquery/project/p/dataset/lake/region"))
    val out = ConfigDispatch.applyConfig(spark, cfg, base)
    assert(out.count() === 4) // 2 assets × 2 fields
    val skip = ConfigDispatch.applyConfig(spark, cfg.copy(overwrite = false),
      base.copy(existingTags = Seq(
        ("bigquery/project/p/dataset/lake/region", "", "gov", "env", "DEV"))
        .toDF("asset_uri", "column", "template_id", "field_id", "field_value")))
    assert(skip.count() === 2) // region skipped
  }

  test("GLOSSARY_TAG_ASSET marks mapped columns as bool fields") {
    val cfg = TagConfig("GLOSSARY_TAG_ASSET", "gloss", Nil)
    val out = ConfigDispatch.applyConfig(spark, cfg, base.copy(
      schemaColumns = Some(Seq(("a1", "email"), ("a1", "cust_id"), ("a2", "email"))
        .toDF("asset_uri", "column_name")),
      glossaryMapping = Some(Seq(("email", "Email Address"))
        .toDF("source_name", "canonical_name"))))
      .select("asset_uri", "field_id", "field_value")
      .as[(String, String, String)].collect().toSet
    assert(out === Set(("a1", "Email Address", "true"),
      ("a2", "Email Address", "true")))
  }

  test("SENSITIVE_TAG_ASSET picks the smallest-superset classification") {
    val cfg = TagConfig("SENSITIVE_TAG_ASSET", "dlp", Nil)
    val out = ConfigDispatch.applyConfig(spark, cfg, base.copy(
      dlpFindings = Some(Seq(("a1", "c1", Seq("EMAIL")))
        .toDF("asset_uri", "column", "infotypes")),
      infotypeSelection = Some(Seq(
        (Seq("EMAIL", "PHONE"), "PII_WIDE"), (Seq("EMAIL"), "EMAIL_ONLY"))
        .toDF("field_infotypes", "classification_result"))))
      .select("asset_uri", "column", "field_value")
      .as[(String, String, String)].collect()
    assert(out.toSeq === Seq(("a1", "c1", "EMAIL_ONLY")))
  }

  test("TAG_IMPORT melts CSV rows against the template (unknown field errors)") {
    val cfg = TagConfig("TAG_IMPORT", "gov", Nil)
    val rows = Seq(("p", "d", "t1", "pii_col", "TRUE "))
      .toDF("project", "dataset", "table", "column", "is_pii")
    val tpl = TagTemplate("gov", Seq(TemplateField("is_pii", "bool")))
    val out = ConfigDispatch.applyConfig(spark, cfg,
        base.copy(importRows = Some(rows), template = Some(tpl)))
      .select("asset_uri", "column", "field_id", "field_type", "field_value")
      .as[(String, String, String, String, String)].collect()
    assert(out.toSeq === Seq(("bigquery/project/p/dataset/d/t1", "pii_col",
      "is_pii", "bool", "TRUE"))) // rtrim'd (CsvParser.py rstrip)
    val bad = rows.withColumnRenamed("is_pii", "mystery")
    intercept[IllegalArgumentException] {
      ConfigDispatch.applyConfig(spark, cfg,
        base.copy(importRows = Some(bad), template = Some(tpl)))
    }
  }

  test("TAG_IMPORT enforces required fields (header + per-row)") {
    val cfg = TagConfig("TAG_IMPORT", "gov", Nil)
    val tpl = TagTemplate("gov", Seq(
      TemplateField("is_pii", "bool", isRequired = true),
      TemplateField("note", "string")))
    // per-row: t2 leaves required is_pii empty → its tags are dropped
    // (the reference raises per entry, failing that task)
    val rows = Seq(
      ("p", "d", "t1", "c", "TRUE", "x"),
      ("p", "d", "t2", "c", " ", "y"))
      .toDF("project", "dataset", "table", "column", "is_pii", "note")
    val out = ConfigDispatch.applyConfig(spark, cfg,
        base.copy(importRows = Some(rows), template = Some(tpl)))
      .select("asset_uri").distinct().as[String].collect()
    assert(out.toSeq === Seq("bigquery/project/p/dataset/d/t1"))
    // header-level: required field absent from the CSV errors the config
    intercept[IllegalArgumentException] {
      ConfigDispatch.applyConfig(spark, cfg,
        base.copy(importRows = Some(rows.drop("is_pii")), template = Some(tpl)))
    }
    // non-bigquery headers: the required-violation anti-join must key on
    // the INFERRED asset key (a fileset header has no dataset/table —
    // keying on the bigquery columns was an unresolved-USING crash)
    val fsRows = Seq(
      ("p", "eg", "fs1", "c", "TRUE", "x"),
      ("p", "eg", "fs2", "c", "", "y"))
      .toDF("project", "entry_group", "fileset", "column", "is_pii", "note")
    val fsOut = ConfigDispatch.applyConfig(spark, cfg,
        base.copy(importRows = Some(fsRows), template = Some(tpl)))
      .select("asset_uri").distinct().as[String].collect()
    assert(fsOut.toSeq === Seq("fileset/project/p/entry_group/eg/fs1"))
  }

  test("TAG_RESTORE rebuilds tag rows from a JSONL backup") {
    val cfg = TagConfig("TAG_RESTORE", "gov", Nil)
    val line = """{"entryGroupId":"eg","id":"t1","locationId":"us","projectId":"p1","createTime":"x","updateTime":"y","tags":[{"template":"gov","templateProject":"p1","fields":[{"name":"env","type":"string","value":"PROD"}]},{"template":"other","templateProject":"p1","fields":[{"name":"zz","type":"string","value":"drop-me"}]}],"columns":[]}"""
    val f = Files.createTempDirectory("graft_restore").resolve("b.jsonl")
    Files.writeString(f, line)
    val out = ConfigDispatch.applyConfig(spark, cfg, base.copy(
        backup = Some(BackupParser.read(spark, f.toString)),
        backupProjectId = Some("p1")))
      .select("asset_uri", "field_id", "field_value")
      .as[(String, String, String)].collect()
    assert(out.toSeq === Seq(("p1/eg/t1", "env", "PROD")))
  }

  test("TAG_EXPORT flattens the tag state into report rows") {
    val cfg = TagConfig("TAG_EXPORT", "", Nil)
    val tags = Seq(
      ("bigquery/project/p/dataset/d1/t1", "", "gov", "env", "PROD"),
      // dataset-level tag (5 parts) exports a null table (reference's
      // tagged_table = None); a MALFORMED bigquery-prefixed URI exports
      // null project/dataset instead of throwing under ANSI element_at
      // and killing the whole job on one bad row; fileset URIs never
      // reach export (apply_export_config is bigquery-only)
      ("bigquery/project/p/dataset/d2", "", "gov", "env", "DEV"),
      ("bigquery/junk", "", "gov", "env", "BAD"),
      ("fileset/f1", "", "gov", "env", "SKIP"))
      .toDF("asset_uri", "column", "template_id", "field_id", "field_value")
    val out = ConfigDispatch.applyConfig(spark, cfg,
        base.copy(existingTags = tags))
      .select("project", "dataset", "table", "tag_template", "tag_field",
        "tag_value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5))).toSeq.sortBy(_._6)
    assert(out === Seq(
      (null, null, null, "gov", "env", "BAD"),
      ("p", "d2", null, "gov", "env", "DEV"),
      ("p", "d1", "t1", "gov", "env", "PROD")))
  }

  test("unknown config_type is rejected") {
    intercept[IllegalArgumentException] {
      ConfigDispatch.applyConfig(spark,
        TagConfig("NOT_A_TYPE", "", Nil), base)
    }
  }

  test("ENTRY_CREATE emits file-metadata tag rows; non-parquet skipped") {
    val dir = java.nio.file.Files.createTempDirectory("entrycfg")
    java.nio.file.Files.writeString(dir.resolve("junk.parquet"), "not parquet")
    val out = ConfigDispatch.applyConfig(spark,
      TagConfig("ENTRY_CREATE", "file_metadata", Nil,
        includedUris = Seq(s"$sf/region.parquet", s"$dir/junk.parquet")),
      base)
    val rows = out.collect().map(r => (r.getString(0), r.getString(3), r.getString(5)))
    // the invalid file is skipped (reference's not-a-parquet ERROR path);
    // the full reference field loop (plus the num_cols extension) emitted
    // for the valid one
    assert(rows.map(_._1).distinct.toSeq === Seq("fileset/region"))
    assert(rows.map(_._2).sorted.toSeq ===
      Seq("bucket", "created_time", "name", "num_cols", "num_rows", "path",
        "size", "type", "updated_time"))
    assert(rows.collectFirst { case (_, "num_cols", v) => v }.get === "2")
    assert(rows.collectFirst { case (_, "name", v) => v }.get === "region.parquet")
    assert(rows.collectFirst { case (_, "path", v) => v }.get.endsWith("/region.parquet"))
    assert(rows.collectFirst { case (_, "bucket", v) => v }.get.nonEmpty)
    // both timestamps come from the same file status, like the reference's
    // blob.time_created
    assert(rows.collectFirst { case (_, "created_time", v) => v } ===
      rows.collectFirst { case (_, "updated_time", v) => v })
  }

  test("ENTRY_CREATE routes per format: parquet/ORC/Avro metadata, CSV header+count, JSONL infer, junk skipped") {
    val dir = java.nio.file.Files.createTempDirectory("entrycsv")
    // a real header CSV (2 cols, 3 data rows), a single-file ORC (footer
    // metadata like parquet), a junk .csv that still parses as
    // single-column CSV (CSV has no magic bytes — any text file with a
    // first line is a 1-column header), and a junk .txt that matches no
    // sniff
    java.nio.file.Files.writeString(dir.resolve("people.csv"),
      "id,name\n1,ada\n2,bob\n3,cid\n")
    java.nio.file.Files.writeString(dir.resolve("junk.txt"), "not a table")
    java.nio.file.Files.writeString(dir.resolve("notes.csv"), "not a table")
    java.nio.file.Files.writeString(dir.resolve("recs.jsonl"),
      "{\"a\":1,\"b\":\"x\"}\n{\"a\":2,\"b\":\"y\"}\n")
    java.nio.file.Files.writeString(dir.resolve("bad.jsonl"), "not json at all")
    // PARTIALLY corrupt: one junk line among valid records — the file is
    // tagged, the junk line doesn't inflate num_rows (this is the case
    // that throws QUERY_ONLY_CORRUPT_RECORD_COLUMN without the cache in
    // the sniff's counting path)
    java.nio.file.Files.writeString(dir.resolve("mixed.jsonl"),
      "{\"a\":1,\"b\":\"x\"}\nnot json\n{\"a\":2,\"b\":\"y\"}\n")
    // a real Avro container (avro-core writer; no Spark datasource needed
    // for the sniff — it reads header + block counts directly)
    locally {
      val schema = org.apache.avro.SchemaBuilder.record("r").fields()
        .requiredLong("id").requiredString("name").requiredDouble("score")
        .endRecord()
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema))
      w.create(schema, dir.resolve("events.avro").toFile)
      (1 to 7).foreach { i =>
        w.append(new org.apache.avro.generic.GenericRecordBuilder(schema)
          .set("id", i.toLong).set("name", s"n$i").set("score", i * 0.5)
          .build())
      }
      w.close()
    }
    val orcStage = dir.resolve("_stage_orc").toString
    Lake.table(spark, sf, "nation").coalesce(1)
      .write.mode("overwrite").orc(orcStage)
    val fs = new org.apache.hadoop.fs.Path(orcStage)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(orcStage))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/nation.orc"))
    fs.delete(new org.apache.hadoop.fs.Path(orcStage), true)
    val out = ConfigDispatch.applyConfig(spark,
      TagConfig("ENTRY_CREATE", "file_metadata", Nil,
        includedUris = Seq(s"$sf/region.parquet", s"$dir/*")),
      base)
    val rows = out.collect().map(r => (r.getString(0), r.getString(3), r.getString(5)))
    // bad.jsonl infers only _corrupt_record → rejected like junk.txt
    assert(rows.map(_._1).distinct.sorted.toSeq ===
      Seq("fileset/events", "fileset/mixed", "fileset/nation",
        "fileset/notes", "fileset/people", "fileset/recs",
        "fileset/region"))
    def field(uri: String, f: String): String =
      rows.collectFirst { case (`uri`, `f`, v) => v }.get
    // the any-text-file edge: .csv name + no magic bytes → its one line
    // becomes a 1-column header with zero data rows
    assert(field("fileset/notes", "type") === "CSV")
    assert(field("fileset/notes", "num_cols") === "1")
    assert(field("fileset/notes", "num_rows") === "0")
    assert(field("fileset/events", "type") === "AVRO")
    assert(field("fileset/events", "num_rows") === "7")
    assert(field("fileset/events", "num_cols") === "3")
    assert(field("fileset/recs", "type") === "JSONL")
    assert(field("fileset/recs", "num_rows") === "2")
    assert(field("fileset/recs", "num_cols") === "2")
    // the junk middle line is excluded from the count, not fatal
    assert(field("fileset/mixed", "type") === "JSONL")
    assert(field("fileset/mixed", "num_rows") === "2")
    assert(field("fileset/mixed", "num_cols") === "2")
    assert(field("fileset/people", "type") === "CSV")
    assert(field("fileset/people", "num_rows") === "3") // header excluded
    assert(field("fileset/people", "num_cols") === "2")
    assert(field("fileset/region", "type") === "PARQUET")
    assert(field("fileset/region", "num_cols") === "2")
    assert(field("fileset/nation", "type") === "ORC")
    assert(field("fileset/nation", "num_cols") === "3")
    assert(field("fileset/nation", "num_rows") ===
      Lake.table(spark, sf, "nation").count().toString)
  }

  test("ENTRY_CREATE over an empty glob is a no-op frame, not a crash") {
    val out = ConfigDispatch.applyConfig(spark,
      TagConfig("ENTRY_CREATE", "t", Nil,
        includedUris = Seq("/no/such/dir/*.parquet")), base)
    assert(out.isEmpty)
  }
}
