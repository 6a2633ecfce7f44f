package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expand.Expander
import graft.model.{AssetUri, TagConfig, TagTemplate}
import graft.sources.BackupParser

/** External inputs for config types whose data does not come from the
  * asset catalog itself (mirrors what the reference fetches from DLP
  * tables, mapping tables, CSV files, and backup files at task time).
  */
final case class EngineInputs(
    catalog: DataFrame,
    existingTags: DataFrame,
    /** (source_name, canonical_name) — glossary configs. */
    glossaryMapping: Option[DataFrame] = None,
    /** (asset_uri, column_name) — the schema columns of each asset. */
    schemaColumns: Option[DataFrame] = None,
    /** (asset_uri, column, infotypes: array<string>) — DLP findings. */
    dlpFindings: Option[DataFrame] = None,
    /** (field_infotypes: array<string>, classification_result). */
    infotypeSelection: Option[DataFrame] = None,
    /** Header-driven CSV rows: (project, dataset, table[, column], f...). */
    importRows: Option[DataFrame] = None,
    /** Template for import typing. */
    template: Option[TagTemplate] = None,
    /** BackupParser.read output — restore configs. */
    backup: Option[DataFrame] = None,
    /** Source project filter for restore. */
    backupProjectId: Option[String] = None,
    /** The physical lake table backing a SHARDED asset family plus the
      * expression mapping each source row to its asset's table name —
      * enables the set-based scale path ([[GroupedEval]]) for dynamic
      * configs whose expansion exceeds [[shardRouteThreshold]].
      */
    shardedSource: Option[(DataFrame, org.apache.spark.sql.Column)] = None,
    /** Expanded-asset count above which a dynamic-table config routes to
      * the set-based sharded evaluator instead of the per-distinct-
      * statement driver loop — the reference's own scale switch is one
      * shard per 1000 tasks (TaskManager.py:49), so beyond one shard's
      * worth of assets the per-asset form stops being metadata-sized.
      */
    shardRouteThreshold: Long = 1000L)

/** The reference's config-type dispatch (main.py:3597–3628: one
  * `apply_*_config` per ConfigType) as a single entry point. Every
  * tagging config type produces the UNIFIED tag-row shape
  * `(asset_uri, column, template_id, field_id, field_type, field_value)`
  * ready for [[TagStore.applyWithDeletes]]; export produces the report
  * shape ([[Sinks.reportRows]]).
  */
object ConfigDispatch {

  private val TagRowCols = TagEngine.TagRowCols

  /** Route a config to its pipeline (ConfigType.py:3–12 names). */
  def applyConfig(spark: SparkSession, config: TagConfig,
                  in: EngineInputs): DataFrame =
    // Locale.ROOT: under a Turkish default locale "dynamic".toUpperCase
    // yields a dotted capital I that matches no arm — every config with an
    // 'i' in its type would dispatch to the unknown-config error
    config.configType.toUpperCase(java.util.Locale.ROOT) match {
      case "DYNAMIC_TAG_TABLE" =>
        // Scale switch (TaskManager.py:49's shard granularity): the
        // per-distinct-statement driver loop collects the expansion and
        // builds one literal frame per asset — metadata-sized work for
        // catalog-sized expansions, plan explosion beyond it. When the
        // caller declared the sharded physical source, expansions larger
        // than the threshold compile set-based to ONE statement whose
        // plan width is O(#fields), independent of asset count. The
        // The expansion PLAN is built once; the per-asset route consumes
        // it directly (one collect — no second expansion job), while the
        // sharded route pays one guard count and re-derives the asset
        // view inside its own SQL rewrite (it must never collect — the
        // whole point is expansions beyond driver scale).
        val expanded = expandOnce(config, in)
        in.shardedSource match {
          case Some((source, shardExpr))
            if expanded.count() > in.shardRouteThreshold =>
            GroupedEval.applyDynamicTableConfigSharded(
              spark, config, in.catalog, source, shardExpr)
          case _ =>
            TagEngine.applyOverAssets(spark, config, collectUris(expanded))
        }
      case "DYNAMIC_TAG_COLUMN" =>
        // same scale switch as the table branch: above the threshold the
        // whole (asset × column × field) grid compiles to ONE statement.
        // The included-columns query resolves ONCE against a DETERMINISTIC
        // representative asset (the expansion ordered by key, so the pick
        // cannot drift run to run) — the sharded family's uniform-schema
        // contract. That contract is CHECKED, not assumed: the query also
        // resolves against the last asset in the same ordering, and a
        // mismatch fails loudly instead of silently diverging from the
        // reference's per-asset resolution the moment a catalog crosses
        // shardRouteThreshold. A columns query that genuinely varies per
        // asset needs the per-asset loop, i.e. no shardedSource.
        val expanded = expandOnce(config, in)
        def perAsset(): DataFrame = collectUris(expanded) match {
          case Seq() => TagEngine.emptyTagRows(spark) // empty expansion = no-op job
          case uris => TagEngine.balancedUnion(
            uris.map(uri => TagEngine.applyDynamicColumnConfig(spark, config, uri)))
        }
        in.shardedSource match {
          case Some((source, shardExpr)) =>
            // route count AND both probe assets in ONE aggregate job over
            // the expansion (struct min/max orders lexicographically by
            // (project, dataset, table) — the deterministic ordering the
            // probe contract pins); previously count + two sort-limit
            // collects re-ran the expansion three times
            val key = struct(col("project"), col("dataset"), col("table"))
            val stats = expanded.agg(count(lit(1)).as("n"),
              min(key).as("lo"), max(key).as("hi")).first()
            if (stats.getLong(0) > in.shardRouteThreshold) {
              def columnsFor(r: org.apache.spark.sql.Row): Seq[String] = {
                val uri = AssetUri("bigquery", r.getString(0),
                  Some(r.getString(1)), Some(r.getString(2)), None)
                // the TOLERANT resolver TagEngine's per-asset path uses:
                // a zero-row/NULL columns probe must no-op on this route
                // too, not crash the dispatch the moment the catalog
                // crosses the shard threshold
                TagEngine.resolveIncludedColumns(spark,
                  ConfigEval.substitute(
                    config.includedColumnsQuery.getOrElse(throw
                      new IllegalArgumentException("included_columns_query required")),
                    uri))
              }
              val columns = columnsFor(stats.getStruct(1))
              val columnsLast = columnsFor(stats.getStruct(2))
              require(columns == columnsLast,
                "included_columns_query is not asset-invariant across the " +
                  s"sharded family (first asset → $columns, last → " +
                  s"$columnsLast); the set-based route requires a uniform " +
                  "schema — drop shardedSource to use the per-asset loop")
              if (columns.isEmpty) TagEngine.emptyTagRows(spark)
              else GroupedEval.applyDynamicColumnConfigSharded(
                spark, config, in.catalog, source, shardExpr, columns)
            } else perAsset()
          case None => perAsset()
        }
      case "STATIC_TAG_ASSET"  => staticAsset(spark, config, in)
      case "GLOSSARY_TAG_ASSET" => glossary(config, in)
      case "SENSITIVE_TAG_ASSET" => sensitive(config, in)
      case "TAG_IMPORT" => importCsv(spark, config, in)
      case "TAG_RESTORE" => restore(config, in)
      case "TAG_EXPORT" =>
        Sinks.reportRows(exportableTags(in.existingTags), current_timestamp())
      case "ENTRY_CREATE" => entryCreate(spark, config)
      case other => throw new IllegalArgumentException(
        s"unknown config_type: $other")
    }

  /** ENTRY_CREATE / apply_entry_config (DataCatalogController.py:498–640):
    * expand the config's file globs (A2) and read each parquet FOOTER —
    * schema field count and record count are footer metadata, exactly what
    * the reference reads via `parquet.ParquetFile(tmp).metadata.num_rows`
    * (:578) — then emit the file-metadata tag the reference attaches to
    * the created entry. Pure driver-side metadata, zero Spark jobs,
    * bounded by physical file count like the reference's per-blob loop.
    * Entry id = file name up to the FIRST dot, '/'→'_' — the reference's
    * exact `filename.split('.')[0]` (:518), so `daily.01.parquet` and
    * `daily.02.parquet` deliberately collide on entry id `daily` just as
    * they do there;
    * files whose footer does not parse are skipped like the reference's
    * not-a-parquet ERROR path (:547–556). Emitted fields follow the
    * reference's field loop (:589–640): name/bucket/path/type/size/
    * num_rows/created_time/updated_time — `bucket` is the parent URI
    * (the GCS bucket's generic-filesystem analogue), `path` the full URI,
    * and both timestamps come from the file status (the reference uses
    * `blob.time_created` for both, :629–640). `storage_class` /
    * `content_encoding` are GCS blob metadata with no generic-Hadoop
    * equivalent and are NOT supported; `num_cols` (schema field count
    * from the same footer read) is an extension beyond the reference
    * loop. A non-empty `config.fields` restricts to the requested ids,
    * matching the `fields` parameter.
    *
    * CSV and ORC filesets (the reference's type sniff downloads the blob
    * and validates the format, :547–556 — it then ERRORs on non-parquet;
    * tagging the other formats it enumerates is the natural extension):
    * a file that fails the parquet footer read next tries the ORC footer
    * (row count + schema width are footer metadata exactly like parquet —
    * driver-side, zero jobs), then the Avro container (schema from the
    * file header, rows by summing per-block record counts without
    * decoding payloads — container metadata, driver-side like the
    * footer formats), then — for `.csv` names — the header-aware
    * Spark CSV reader: `num_cols` from the parsed header (schema width,
    * a driver-side sample read), `num_rows` a distributed count (CSV
    * keeps no footer row count, so unlike the footer formats this is a
    * data pass — one Spark job per CSV file, bounded by the fileset's
    * file count like the reference's per-blob loop). `.jsonl`/`.json`
    * names go through the same shape with the JSON reader (the format
    * of the reference's catalog backups, BackupFileParser.py:54–126):
    * schema width from the inferred object fields, rows a data pass.
    * Files matching no sniff stay skipped, mirroring the reference's
    * not-a-parquet ERROR path.
    */
  private def entryCreate(spark: SparkSession, config: TagConfig): DataFrame = {
    import graft.sources.FileScan
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val rows = config.includedUris
      .flatMap(g => FileScan.listFiles(spark, g).collect().map(r =>
        (r.getAs[String]("path"), r.getAs[String]("name"),
          r.getAs[Long]("size"), r.getAs[Long]("modification_time"))))
      .flatMap { case (path, name, size, mtime) =>
        // 0-byte files short-circuit to skipped: they carry no schema and
        // no rows, but the ORC reader would otherwise CLAIM them (ORC
        // treats zero-length files as valid empty ORC for Hive compat),
        // tagging junk as an ORC entry — caught by SniffPropertySpec
        if (size == 0L) None else
        // the footer read doubles as the is-it-parquet validation
        scala.util.Try {
          val reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf))
          try ("PARQUET", reader.getRecordCount,
            reader.getFileMetaData.getSchema.getFieldCount)
          finally reader.close()
        }.orElse(scala.util.Try {
          val reader = org.apache.orc.OrcFile.createReader(
            new org.apache.hadoop.fs.Path(path),
            org.apache.orc.OrcFile.readerOptions(conf))
          try ("ORC", reader.getNumberOfRows,
            reader.getSchema.getChildren.size)
          finally reader.close()
        }).orElse(scala.util.Try {
          // Avro: schema lives in the file HEADER and every data block
          // carries its record count, so schema width AND row count are
          // container metadata — driver-side like the parquet/ORC
          // footers, skipping block payloads without decoding a record.
          // Magic-byte validated (Obj\x01) by DataFileReader itself.
          val fsIn = new org.apache.avro.mapred.FsInput(
            new org.apache.hadoop.fs.Path(path), conf)
          // reader-ctor failure (every non-Avro file probed lands here)
          // must close the already-open stream — the finally below only
          // guards the post-construction read
          val rdr =
            try new org.apache.avro.file.DataFileReader[AnyRef](fsIn,
              new org.apache.avro.generic.GenericDatumReader[AnyRef]())
            catch { case e: Throwable => fsIn.close(); throw e }
          try {
            val sch = rdr.getSchema
            val nCols =
              if (sch.getType == org.apache.avro.Schema.Type.RECORD)
                sch.getFields.size
              else 1
            var n = 0L
            while (rdr.hasNext) { n += rdr.getBlockCount; rdr.nextBlock() }
            ("AVRO", n, nCols)
          } finally rdr.close()
        }).orElse(scala.util.Try {
          require(name.toLowerCase(java.util.Locale.ROOT).endsWith(".csv"),
            s"not a csv: $name")
          val df = spark.read.option("header", true).csv(path)
          // an EMPTY .csv infers a zero-column schema — a 0-col entry is
          // junk, rejected like the no-parseable-fields JSONL below
          require(df.schema.fields.nonEmpty, s"empty csv: $name")
          ("CSV", df.count(), df.schema.fields.length)
        }).orElse(scala.util.Try {
          // JSONL filesets (the reference round-trips jsonlines catalog
          // dumps, BackupFileParser.py:54–126): schema width from the
          // inferred object fields, row count a data pass like CSV.
          // A .jsonl whose lines never parse infers ONLY the
          // _corrupt_record column — rejected, so junk stays skipped.
          val lower = name.toLowerCase(java.util.Locale.ROOT)
          require(lower.endsWith(".jsonl") || lower.endsWith(".json"),
            s"not jsonl: $name")
          val df = spark.read.json(path)
          val cols = df.schema.fieldNames.filterNot(_ == "_corrupt_record")
          require(cols.nonEmpty, s"no parseable json fields: $name")
          // num_rows counts PARSEABLE records only: a junk line in an
          // otherwise-valid file lands in _corrupt_record and must not
          // inflate the tag (consistent with the all-corrupt rejection).
          // Spark refuses a query referencing ONLY the corrupt-record
          // column of a raw json scan (UNSUPPORTED_FEATURE.QUERY_ONLY_
          // CORRUPT_RECORD_COLUMN) — cache the parsed result first, the
          // documented workaround; these are single metadata-sized files.
          val nRows =
            if (df.schema.fieldNames.contains("_corrupt_record")) {
              val parsed = df.cache()
              try parsed.filter(col("_corrupt_record").isNull).count()
              finally parsed.unpersist()
            } else df.count()
          ("JSONL", nRows, cols.length)
        }).toOption
          .map { case (ftype, nRows, nCols) =>
            (path, name, size, mtime, ftype, nRows, nCols)
          }
      }
      .sortBy(_._1)
    if (rows.isEmpty) return TagEngine.emptyTagRows(spark)
    val wanted = config.fields.map(_.fieldId).toSet
    import spark.implicits._
    rows.flatMap { case (path, name, size, mtime, ftype, nRows, nCols) =>
      val entryId = name.split('.').head.replace("/", "_")
      val parent = new org.apache.hadoop.fs.Path(path).getParent
      val ts = java.time.Instant.ofEpochMilli(mtime).toString
      Seq(
        ("name", "string", name),
        ("bucket", "string", if (parent == null) "" else parent.toString),
        ("path", "string", path),
        ("type", "enum", ftype),
        ("size", "double", size.toString),
        ("num_rows", "double", nRows.toString),
        ("num_cols", "double", nCols.toString),
        ("created_time", "datetime", ts),
        ("updated_time", "datetime", ts))
        .filter { case (fid, _, _) => wanted.isEmpty || wanted.contains(fid) }
        .map { case (fid, ftype, v) =>
          (s"fileset/$entryId", "", config.templateId, fid, ftype, v)
        }
    }.toDF(TagRowCols: _*)
  }

  /** One expansion per dispatch call — reused for the route-decision count
    * and any representative-asset fetch (previously each use re-ran the
    * expansion job; metadata-sized but repeated per config in a bulk run).
    */
  private def expandOnce(config: TagConfig, in: EngineInputs): DataFrame =
    Expander.expand(in.catalog, config.includedUris, config.excludedUris)

  private def collectUris(expanded: DataFrame): Seq[AssetUri] =
    expanded.select("project", "dataset", "table").collect()
      .map(r => AssetUri("bigquery", r.getString(0), Some(r.getString(1)),
        Some(r.getString(2)), None)).toSeq

  /** Static fields fanned over the expanded asset set, honoring
    * `overwrite=false` (anti-join skip, DataCatalogController.py:230–243).
    */
  private def staticAsset(spark: SparkSession, config: TagConfig,
                          in: EngineInputs): DataFrame = {
    val assets = Expander
      .expand(in.catalog, config.includedUris, config.excludedUris)
      .select(concat_ws("/", lit("bigquery/project"), col("project"),
        lit("dataset"), col("dataset"), col("table")).as("asset_uri"))
    val work =
      if (config.overwrite) assets
      else Expander.minusExisting(assets,
        in.existingTags.filter(col("template_id") === config.templateId)
          .select("asset_uri").distinct(), Seq("asset_uri"))
    val fields = config.fields.map(f =>
      struct(lit(f.fieldId).as("field_id"), lit(f.fieldType).as("field_type"),
        lit(f.fieldValue.getOrElse("")).as("field_value")))
    work.select(col("asset_uri"), lit("").as("column"),
        lit(config.templateId).as("template_id"),
        explode(array(fields: _*)).as("f"))
      .select(col("asset_uri"), col("column"), col("template_id"),
        col("f.field_id"), col("f.field_type"), col("f.field_value"))
  }

  /** Glossary: per asset, mapping terms present among its columns become
    * bool=true fields (DataCatalogController.py:768–799) — broadcast the
    * tiny mapping against the schema-column table.
    */
  private def glossary(config: TagConfig, in: EngineInputs): DataFrame =
    in.schemaColumns.getOrElse(sys.error("glossary config needs schemaColumns"))
      .join(broadcast(in.glossaryMapping.getOrElse(
          sys.error("glossary config needs glossaryMapping"))),
        col("column_name") === col("source_name"))
      .select(col("asset_uri"), lit("").as("column"),
        lit(config.templateId).as("template_id"),
        col("canonical_name").as("field_id"),
        lit("bool").as("field_type"), lit("true").as("field_value"))
      .distinct()

  /** Sensitive: smallest-superset classification of each column's DLP
    * infotype set (DataCatalogController.py:909–984).
    */
  private def sensitive(config: TagConfig, in: EngineInputs): DataFrame = {
    val findings = in.dlpFindings.getOrElse(
      sys.error("sensitive config needs dlpFindings"))
      .withColumn("__key", concat_ws(":", col("asset_uri"), col("column")))
    val sel = in.infotypeSelection.getOrElse(
      sys.error("sensitive config needs infotypeSelection"))
    Classify.smallestSuperset(findings, sel, "__key", "infotypes",
        "field_infotypes", "classification_result")
      .select(col("asset_uri"), col("column"),
        lit(config.templateId).as("template_id"),
        lit("classification_result").as("field_id"),
        lit("string").as("field_type"),
        col("classification_result").as("field_value"))
  }

  /** Asset-key columns of an import header, per the inferred asset type
    * (main.py:3445–3461) — shared by [[importCsv]] and
    * [[requiredViolations]] so their anti-join always agrees on the
    * using-columns (a fileset/spanner header has no `dataset`/`table`).
    */
  private def importKeyCols(columns: Seq[String]): Seq[String] =
    (graft.model.ConfigIO.inferAssetType(columns) match {
      case "fileset" => Seq("project", "entry_group", "fileset", "column")
      case "spanner" => Seq("project", "instance", "database", "schema",
        "table", "column")
      case _         => Seq("project", "dataset", "table", "column")
    }).filter(columns.contains)

  /** The key of assets whose import row leaves a REQUIRED template field
    * empty (DataCatalogController.py:1347–1355: the reference raises per
    * entry, failing that task). Exposed so callers can surface the ERROR
    * task rows the reference would log.
    */
  def requiredViolations(rows: DataFrame, template: TagTemplate): DataFrame = {
    val keyCols = importKeyCols(rows.columns.toSeq)
    val required = template.fields.filter(_.isRequired).map(_.fieldId)
      .filter(rows.columns.contains)
    val anyEmpty = required.map(f =>
        coalesce(trim(col(f).cast("string")), lit("")) === "")
      .reduceOption(_ || _).getOrElse(lit(false))
    rows.filter(anyEmpty).select(keyCols.map(col): _*)
  }

  /** Import: melt the header-driven CSV rows against the template's field
    * types (DataCatalogController.py:1340–1368). Unknown CSV columns (not
    * in the template) error, mirroring the reference; a required field
    * missing from the header errors the whole config, and rows with an
    * EMPTY required value drop their asset's tags (the per-entry exception
    * path, :1347–1355 — see [[requiredViolations]] for the ERROR rows).
    */
  private def importCsv(spark: SparkSession, config: TagConfig,
                        in: EngineInputs): DataFrame = {
    import spark.implicits._
    import graft.model.ConfigIO
    val rows = in.importRows.getOrElse(sys.error("import config needs importRows"))
    val template = in.template.getOrElse(sys.error("import config needs template"))
    // asset type from the header keys (main.py:3445–3461): dataset →
    // bigquery; entry_group+fileset → fileset; instance+database → spanner
    val assetType = ConfigIO.inferAssetType(rows.columns.toSeq)
    val keyCols = importKeyCols(rows.columns.toSeq)
    val fieldCols = rows.columns.filterNot(keyCols.contains).toSeq
    val unknown = fieldCols.filterNot(template.byId.contains)
    require(unknown.isEmpty, s"unknown fields in import: ${unknown.mkString(",")}")
    val missingRequired = template.fields.filter(_.isRequired)
      .map(_.fieldId).filterNot(fieldCols.contains)
    require(missingRequired.isEmpty,
      s"required fields absent from import header: ${missingRequired.mkString(",")}")
    val valid = rows.join(requiredViolations(rows, template), keyCols, "left_anti")
    val melted = valid.unpivot(keyCols.map(col).toArray,
      fieldCols.map(col).toArray, "field_id", "field_value")
    val types = template.fields.map(f => (f.fieldId, f.fieldType))
      .toDF("field_id", "field_type")
    // typed URI per asset kind (DataCatalogController.py:1272–1292); a
    // Spanner schema qualifies the leaf as `schema.table` (:1265–1269)
    val uriCol = assetType match {
      case "fileset" => concat_ws("/", lit("fileset/project"), col("project"),
        lit("entry_group"), col("entry_group"), col("fileset"))
      case "spanner" =>
        val leaf = if (keyCols.contains("schema"))
          concat(lit("`"), col("schema"), lit("."), col("table"), lit("`"))
        else col("table")
        concat_ws("/", lit("spanner/project"), col("project"),
          lit("instance"), col("instance"), lit("database"), col("database"),
          leaf)
      case _ => concat_ws("/", lit("bigquery/project"), col("project"),
        lit("dataset"), col("dataset"), col("table"))
    }
    melted.join(broadcast(types), "field_id")
      .select(uriCol.as("asset_uri"),
        (if (keyCols.contains("column")) col("column") else lit(""))
          .as("column"),
        lit(config.templateId).as("template_id"),
        col("field_id"), col("field_type"),
        rtrim(col("field_value")).as("field_value"))
  }

  /** Restore: backup JSONL → template-filtered tag rows
    * (BackupFileParser.py:54–126).
    */
  private def restore(config: TagConfig, in: EngineInputs): DataFrame = {
    val backup = in.backup.getOrElse(sys.error("restore config needs backup"))
    val filtered = BackupParser.filterByTemplate(backup, config.templateId,
      in.backupProjectId.getOrElse(""))
    BackupParser.toTagRows(filtered)
      .select(concat_ws("/", col("projectId"), col("entryGroupId"),
          col("entry_id")).as("asset_uri"),
        col("column"), lit(config.templateId).as("template_id"),
        col("field_id"), col("field_type"), col("field_value"))
  }

  /** Tags keyed by `bigquery/project/P/dataset/D/T` URIs → the report
    * input shape (project, dataset, table, tag_template, tag_field,
    * tag_value[, tag_type]). The type rides along when present so
    * [[Sinks.reportRows]] can apply the richtext export swap.
    */
  private def exportableTags(tags: DataFrame): DataFrame = {
    val parts = split(col("asset_uri"), "/")
    // BigQuery URIs ONLY, like the reference (apply_export_config builds
    // `//bigquery.googleapis.com/projects/<uri>` unconditionally,
    // DataCatalogController.py:1125 — fileset/spanner tags never reach
    // export). Without the filter a store that has run ENTRY_CREATE
    // (2-part fileset URIs) or a spanner import would export null/garbage
    // project/dataset/table rows — or die on element_at under ANSI.
    // try_element_at on EVERY position, not just the leaf: a
    // DATASET-level tag URI has 5 parts and exports with a null table
    // (the reference's tagged_table = None), and a malformed
    // bigquery-prefixed URI with fewer than 5 segments must export null
    // project/dataset rather than throw under ANSI element_at and fail
    // the whole export job on one bad row.
    val base = Seq(
      try_element_at(parts, lit(3)).as("project"),
      try_element_at(parts, lit(5)).as("dataset"),
      try_element_at(parts, lit(6)).as("table"),
      col("template_id").as("tag_template"),
      col("field_id").as("tag_field"),
      col("field_value").cast("string").as("tag_value"))
    val withType =
      if (tags.columns.contains("field_type"))
        base :+ col("field_type").as("tag_type")
      else base
    tags.filter(col("asset_uri").startsWith("bigquery/"))
      .select(withType: _*)
  }
}
