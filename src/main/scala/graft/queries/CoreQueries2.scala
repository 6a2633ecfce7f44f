package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Lake
import graft.operators.{Classify, Sinks, TagStore}
import graft.queries.CoreQueries.Q

/** Tag-engine-parity queries, part 2 (SURVEY.md §2 C/D/E/F + sinks). */
object CoreQueries2 {

  /** C1: glossary broadcast semi-join — which glossary terms appear among
    * the asset's "columns" (here: customer market segments with a balance).
    */
  def q07Glossary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mapping = Seq(
      ("BUILDING", "segment_building"), ("AUTOMOBILE", "segment_auto"),
      ("ZipCode", "address_zip"), ("FURNITURE", "segment_furniture"))
      .toDF("source_name", "canonical_name")
    val columns = Lake.table(spark, dir, "customer")
      .filter(col("c_acctbal") > 0)
      .select(col("c_mktsegment").as("column_name")).distinct()
    Classify.glossaryMatch(mapping, columns).orderBy("canonical_name")
  }

  val q07Oracle: String =
    """WITH mapping(source_name, canonical_name) AS (VALUES
      |  ('BUILDING','segment_building'), ('AUTOMOBILE','segment_auto'),
      |  ('ZipCode','address_zip'), ('FURNITURE','segment_furniture'))
      |SELECT canonical_name, true AS field_value FROM mapping
      |WHERE source_name IN (SELECT DISTINCT c_mktsegment FROM customer
      |                      WHERE c_acctbal > 0)
      |ORDER BY canonical_name""".stripMargin

  /** C2/C3 + E1: smallest-superset containment classification. Observed
    * infotype sets are the distinct event types per user bucket (thinned by
    * a JSON-extracted predicate so the sets vary); the selection table is
    * the DLP-style reference (FIXTURES.md §2.2).
    */
  def q08SmallestSuperset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = Lake.table(spark, dir, "events")
      .filter(get_json_object(col("props"), "$.k").cast("int") > 80)
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(array_sort(collect_set(col("event_type"))).as("observed"))
    val sel = Seq(
      (Seq("click", "view"), "web_activity"),
      (Seq("click", "error", "purchase", "signup", "view"), "all_core"),
      (Seq("click", "error", "login", "purchase", "refund", "signup", "view"), "everything"),
      (Seq("error", "purchase"), "risky"),
      (Seq("click", "purchase", "signup", "view"), "no_errors"))
      .toDF("field_infotypes", "notable_infotype")
    Classify.smallestSuperset(obs, sel,
        "bucket", "observed", "field_infotypes", "notable_infotype")
      .select(col("bucket"), col("notable_infotype"),
              size(col("field_infotypes")).as("sel_size"))
      .orderBy("bucket")
  }

  val q08Oracle: String =
    """WITH obs AS (
      |  SELECT user_id % 10 AS bucket,
      |         list_sort(list(DISTINCT event_type)) AS observed
      |  FROM events
      |  WHERE CAST(json_extract_string(props, '$.k') AS INT) > 80
      |  GROUP BY 1),
      |sel(field_infotypes, notable_infotype) AS (VALUES
      |  (['click','view'], 'web_activity'),
      |  (['click','error','purchase','signup','view'], 'all_core'),
      |  (['click','error','login','purchase','refund','signup','view'], 'everything'),
      |  (['error','purchase'], 'risky'),
      |  (['click','purchase','signup','view'], 'no_errors')),
      |j AS (
      |  SELECT bucket, notable_infotype, len(field_infotypes) AS sel_size,
      |         row_number() OVER (PARTITION BY bucket
      |           ORDER BY len(field_infotypes), notable_infotype) AS rn
      |  FROM obs JOIN sel ON list_has_all(field_infotypes, observed))
      |SELECT bucket, notable_infotype, sel_size FROM j WHERE rn = 1
      |ORDER BY bucket""".stripMargin

  /** A12/C5: flattened report export — tags exploded to
    * (project, dataset, table, tag_template, tag_field, tag_value,
    * export_time), values stringified.
    */
  def q09ExportReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Lake.table(spark, dir, "documents")
    // the richtext `keywords` field is stored in catalog form
    // (`<br>`-joined) and must leave in EXPORT form (`, `-joined,
    // DataCatalogController.py:1177) — reportRows consumes tag_type
    val tags = docs.select(
      lit("p").as("project"), col("source").as("dataset"),
      concat(lit("doc_"), col("doc_id")).as("table"),
      lit("doc_quality").as("tag_template"),
      explode(array(
        struct(lit("lang").as("tag_field"),
          col("lang").cast("string").as("tag_value"),
          lit("string").as("tag_type")),
        struct(lit("n_chars").as("tag_field"),
          col("n_chars").cast("string").as("tag_value"),
          lit("string").as("tag_type")),
        struct(lit("keywords").as("tag_field"),
          concat_ws("<br>", col("lang"), col("source")).as("tag_value"),
          lit("richtext").as("tag_type"))
      )).as("f"))
      .select(col("project"), col("dataset"), col("table"),
              col("tag_template"), col("f.tag_field"), col("f.tag_value"),
              col("f.tag_type"))
    Sinks.reportRows(tags, lit("2024-02-01 00:00:00").cast("timestamp"))
      .orderBy("dataset", "table", "tag_field")
  }

  val q09Oracle: String =
    """SELECT 'p' AS project, source AS dataset, 'doc_' || doc_id AS "table",
      |  'doc_quality' AS tag_template, 'lang' AS tag_field, lang AS tag_value,
      |  TIMESTAMP '2024-02-01 00:00:00' AS export_time
      |FROM documents
      |UNION ALL
      |SELECT 'p', source, 'doc_' || doc_id, 'doc_quality', 'n_chars',
      |  CAST(n_chars AS VARCHAR), TIMESTAMP '2024-02-01 00:00:00'
      |FROM documents
      |UNION ALL
      |SELECT 'p', source, 'doc_' || doc_id, 'doc_quality', 'keywords',
      |  concat_ws(', ', lang, source), TIMESTAMP '2024-02-01 00:00:00'
      |FROM documents
      |ORDER BY dataset, "table", tag_field""".stripMargin

  /** A11: tag-history rows with the singular-segment asset name and the
    * day-partition column (BigQueryUtils.py:123–128, 344–387).
    */
  def q10History(spark: SparkSession, dir: String): DataFrame = {
    val docs = Lake.table(spark, dir, "documents").filter(col("doc_id") % 3 === 0)
    val rows = docs.select(
      timestamp_seconds(
        unix_timestamp(lit("2024-02-01 00:00:00").cast("timestamp")) +
          col("doc_id")).as("event_time"),
      concat(lit("p/dataset/"), col("source"), lit("/table/doc_"), col("doc_id"))
        .as("asset_name"),
      lit("job-1").as("job_uuid"),
      col("lang").as("lang"),
      col("n_chars").cast("double").as("n_chars"))
    Sinks.withHistoryPartition(rows).orderBy("asset_name")
  }

  val q10Oracle: String =
    """SELECT TIMESTAMP '2024-02-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS event_time,
      |  'p/dataset/' || source || '/table/doc_' || doc_id AS asset_name,
      |  'job-1' AS job_uuid, lang, CAST(n_chars AS DOUBLE) AS n_chars,
      |  CAST(TIMESTAMP '2024-02-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS DATE) AS event_date
      |FROM documents WHERE doc_id % 3 = 0
      |ORDER BY asset_name""".stripMargin

  /** A9/A10/B5: the full tag lifecycle MERGE — upsert + delete-when-all-empty
    * over an existing state (DataCatalogController.py:1468–1605).
    */
  def q11ReconcileMerge(spark: SparkSession, dir: String): DataFrame = {
    val docs = Lake.table(spark, dir, "documents")
    def tag(filterExpr: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column) =
      docs.filter(filterExpr).select(
        concat(lit("doc_"), col("doc_id")).as("asset_uri"),
        lit("").as("column"), lit("t").as("template_id"),
        lit("status").as("field_id"), value.as("field_value"))
    val existing = tag(col("doc_id") % 2 === 0, lit("v1"))
    val incoming = tag(col("doc_id") % 3 === 0,
      when(col("doc_id") % 9 === 0, lit("")).otherwise(lit("v2")))
    TagStore.applyWithDeletes(existing, incoming)
      .orderBy("asset_uri", "field_id")
  }

  val q11Oracle: String =
    """WITH old AS (
      |  SELECT 'doc_' || doc_id AS asset_uri, '' AS "column", 't' AS template_id,
      |         'status' AS field_id, 'v1' AS field_value
      |  FROM documents WHERE doc_id % 2 = 0),
      |new AS (
      |  SELECT 'doc_' || doc_id AS asset_uri, '' AS "column", 't' AS template_id,
      |         'status' AS field_id,
      |         CASE WHEN doc_id % 9 = 0 THEN '' ELSE 'v2' END AS field_value
      |  FROM documents WHERE doc_id % 3 = 0),
      |empty_keys AS (
      |  SELECT asset_uri, "column", template_id FROM new
      |  GROUP BY 1, 2, 3
      |  HAVING count(*) = count(CASE WHEN coalesce(field_value,'') = '' THEN 1 END)),
      |nonempty AS (SELECT n.* FROM new n WHERE NOT EXISTS (
      |  SELECT 1 FROM empty_keys e
      |  WHERE e.asset_uri IS NOT DISTINCT FROM n.asset_uri
      |    AND e."column" IS NOT DISTINCT FROM n."column"
      |    AND e.template_id IS NOT DISTINCT FROM n.template_id)),
      |kept AS (SELECT o.* FROM old o WHERE NOT EXISTS (
      |  SELECT 1 FROM empty_keys e
      |  WHERE e.asset_uri IS NOT DISTINCT FROM o.asset_uri
      |    AND e."column" IS NOT DISTINCT FROM o."column"
      |    AND e.template_id IS NOT DISTINCT FROM o.template_id))
      |SELECT coalesce(n.asset_uri, k.asset_uri) AS asset_uri,
      |       coalesce(n."column", k."column") AS "column",
      |       coalesce(n.template_id, k.template_id) AS template_id,
      |       coalesce(n.field_id, k.field_id) AS field_id,
      |       CASE WHEN n.asset_uri IS NOT NULL THEN n.field_value
      |            ELSE k.field_value END AS field_value
      |FROM nonempty n FULL OUTER JOIN kept k
      |  ON n.asset_uri IS NOT DISTINCT FROM k.asset_uri
      |     AND n."column" IS NOT DISTINCT FROM k."column"
      |     AND n.template_id IS NOT DISTINCT FROM k.template_id
      |     AND n.field_id IS NOT DISTINCT FROM k.field_id
      |ORDER BY asset_uri, field_id""".stripMargin

  /** D7/H4: job fan-in accounting — per-job task counters + pct_complete +
    * derived job status (JobManager.py:84–139), one groupBy instead of
    * distributed Firestore counters.
    */
  def q12JobRollup(spark: SparkSession, dir: String): DataFrame =
    Lake.spread(Lake.table(spark, dir, "events"), col("event_id"))
      .select((col("user_id") % 20).as("job_uuid"), col("event_type"))
      .groupBy("job_uuid")
      .agg(
        count(lit(1)).as("task_count"),
        count(when(col("event_type") =!= "view", 1)).as("tasks_ran"),
        // reference accounting (JobManager.py:84–139): SUCCESS is a
        // subset of RAN — a not-yet-ran ('view') task is neither a
        // success nor a failure, it is the reason the job is RUNNING
        count(when(col("event_type") =!= "view" &&
          col("event_type") =!= "error", 1)).as("tasks_success"),
        count(when(col("event_type") === "error", 1)).as("tasks_failed"))
      .withColumn("pct_complete",
        // 2 decimals — JobManager.py:112 `round(tasks_ran/task_count*100, 2)`
        round(col("tasks_ran") * lit(100.0) / col("task_count"), 2))
      .withColumn("job_status",
        // RUNNING until every task reported (the reference derives
        // SUCCESS/ERROR only at pct_complete = 100)
        when(col("tasks_ran") < col("task_count"), lit("RUNNING"))
          .when(col("tasks_failed") > 0, lit("ERROR"))
          .otherwise(lit("SUCCESS")))
      // A13: job-metadata JSON payload (BigQueryUtils.py:504–557 `to_json`)
      .withColumn("metadata",
        to_json(struct(col("task_count"), col("job_status"))))
      .orderBy("job_uuid")

  val q12Oracle: String =
    """SELECT user_id % 20 AS job_uuid,
      |  count(*) AS task_count,
      |  count(CASE WHEN event_type <> 'view' THEN 1 END) AS tasks_ran,
      |  count(CASE WHEN event_type NOT IN ('view', 'error') THEN 1 END)
      |    AS tasks_success,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS tasks_failed,
      |  round(count(CASE WHEN event_type <> 'view' THEN 1 END) * 100.0 / count(*), 2)
      |    AS pct_complete,
      |  CASE WHEN count(CASE WHEN event_type <> 'view' THEN 1 END) < count(*)
      |       THEN 'RUNNING'
      |       WHEN count(CASE WHEN event_type = 'error' THEN 1 END) > 0
      |       THEN 'ERROR' ELSE 'SUCCESS' END AS job_status,
      |  to_json(struct_pack(
      |    task_count := count(*),
      |    job_status := CASE
      |      WHEN count(CASE WHEN event_type <> 'view' THEN 1 END) < count(*)
      |      THEN 'RUNNING'
      |      WHEN count(CASE WHEN event_type = 'error' THEN 1 END) > 0
      |      THEN 'ERROR' ELSE 'SUCCESS' END)) AS metadata
      |FROM events
      |GROUP BY 1 ORDER BY job_uuid""".stripMargin

  /** E1/E3/E6: ranking + running frame — top-3 lineitems per supplier by
    * ship date with a running quantity (exact decimal accumulation).
    */
  def q13WindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    // spread: the pre-window scan+project of 600k rows is otherwise a
    // single-partition stage (Lake.spread no-ops at lake scale). Keyed on
    // the WINDOW's partition key, not the row key: hashpartitioning
    // (l_suppkey) satisfies the window's required distribution, so the
    // window reuses the spread's exchange instead of re-shuffling the
    // full row set a second time (round-20 verdict #2's rule, applied to
    // the window family: 2 Exchange → 1)
    val li = Lake.spread(Lake.table(spark, dir, "lineitem"),
      col("l_suppkey"))
    // null order EXPLICIT on both sides: Spark defaults ASC to NULLS
    // FIRST, DuckDB to NULLS LAST — inside a window this is
    // content-affecting (rn selection + running sums), not mere output
    // order, and a null-free fixture would mask the fork
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate").asc_nulls_last,
        col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)
    li.withColumn("rn", row_number().over(w))
      .withColumn("running_qty",
        sum(col("l_quantity").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .filter(col("rn") <= 3)
      .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "running_qty")
      .orderBy("l_suppkey", "rn")
  }

  val q13Oracle: String =
    """SELECT l_suppkey, rn, l_orderkey, l_linenumber, running_qty FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    row_number() OVER w AS rn,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER
      |      (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      AS running_qty
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_suppkey
      |               ORDER BY l_shipdate NULLS LAST, l_orderkey NULLS LAST,
      |                        l_linenumber NULLS LAST))
      |WHERE rn <= 3
      |ORDER BY l_suppkey, rn""".stripMargin

  /** A5/B7 JSON surface: extract + filter on JSON payloads (the restore
    * path's object filtering, BackupFileParser.py:54–126, over the events
    * `props` JSON).
    */
  def q14JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Lake.spread(Lake.table(spark, dir, "events"), col("event_id"))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k") % 2 === 0 && col("event_type").isin("click", "purchase"))
      .select("event_id", "event_type", "k")
      .orderBy("event_id")

  val q14Oracle: String =
    """SELECT event_id, event_type,
      |       CAST(json_extract_string(props, '$.k') AS INT) AS k
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS INT) % 2 = 0
      |  AND event_type IN ('click', 'purchase')
      |ORDER BY event_id""".stripMargin

  /** E2 first-row semantics, made deterministic: the reference's bare
    * `limit 1` per query (DataCatalogController.py:1797–1806) under a total
    * order — here: largest doc per source.
    */
  def q15FirstRow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    Lake.table(spark, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("source", "doc_id", "n_chars")
      .orderBy("source")
  }

  val q15Oracle: String =
    """SELECT source, doc_id, n_chars FROM (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id ASC) AS rn
      |  FROM documents)
      |WHERE rn = 1 ORDER BY source""".stripMargin

  /** F1–F4: the set-operation algebra — dedup-union minus, and intersect. */
  def q16SetOps(spark: SparkSession, dir: String): DataFrame = {
    val docs = Lake.table(spark, dir, "documents")
    def srcs(lang: String) = docs.filter(col("lang") === lang).select("source")
    val unionMinus = srcs("en").union(srcs("fr")).distinct()
      .except(srcs("de").distinct())
      .select(lit("union_minus").as("op"), col("source"))
    val inter = srcs("en").intersect(srcs("fr"))
      .select(lit("intersect").as("op"), col("source"))
    unionMinus.unionByName(inter).orderBy("op", "source")
  }

  val q16Oracle: String =
    """(SELECT 'union_minus' AS op, source FROM (
      |   SELECT source FROM documents WHERE lang IN ('en','fr')
      |   EXCEPT
      |   SELECT source FROM documents WHERE lang = 'de'))
      |UNION ALL
      |(SELECT 'intersect' AS op, source FROM (
      |   SELECT source FROM documents WHERE lang = 'en'
      |   INTERSECT
      |   SELECT source FROM documents WHERE lang = 'fr'))
      |ORDER BY op, source""".stripMargin

  /** A6: parquet-footer schema + row-count stats per file (the entry
    * config's source, DataCatalogController.py:543–582). Schema widths are
    * driver metadata (footers, no job); the counts are ONE Spark job — a
    * union of per-table aggregates evaluated together — not one driver
    * action per table (the r2 form ran a blocking `count()` per entry,
    * which serializes at a real entry-config's table count).
    */
  def q17EntryStats(spark: SparkSession, dir: String): DataFrame =
    Seq("region", "nation", "supplier").map { t =>
      val df = Lake.table(spark, dir, t)
      df.agg(count(lit(1)).as("num_rows"))
        .select(lit(t).as("table_name"),
          lit(df.columns.length).as("num_cols"), col("num_rows"))
    }.reduce(_ unionByName _).orderBy("table_name")

  val q17Oracle: String =
    """SELECT 'region' AS table_name, 2 AS num_cols,
      |       (SELECT count(*) FROM region) AS num_rows
      |UNION ALL
      |SELECT 'nation', 3, (SELECT count(*) FROM nation)
      |UNION ALL
      |SELECT 'supplier', 4, (SELECT count(*) FROM supplier)
      |ORDER BY table_name""".stripMargin

  /** C6: coverage report — assets per dataset vs tagged assets, with pct. */
  def q18Coverage(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "documents")
      .groupBy(col("source").as("dataset"))
      .agg(count(lit(1)).as("n_assets"),
           count(when(col("doc_id") % 3 === 0, 1)).as("n_tagged"))
      .withColumn("pct_tagged",
        round(col("n_tagged") * lit(100.0) / col("n_assets"), 1))
      .orderBy("dataset")

  val q18Oracle: String =
    """SELECT source AS dataset, count(*) AS n_assets,
      |  count(CASE WHEN doc_id % 3 = 0 THEN 1 END) AS n_tagged,
      |  round(count(CASE WHEN doc_id % 3 = 0 THEN 1 END) * 100.0 / count(*), 1)
      |    AS pct_tagged
      |FROM documents GROUP BY 1 ORDER BY dataset""".stripMargin

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q07_glossary", q07Glossary _, Some(q07Oracle)),
    ("q08_smallest_superset", q08SmallestSuperset _, Some(q08Oracle)),
    ("q09_export_report", q09ExportReport _, Some(q09Oracle)),
    ("q10_history", q10History _, Some(q10Oracle)),
    ("q11_reconcile_merge", q11ReconcileMerge _, Some(q11Oracle)),
    ("q12_job_rollup", q12JobRollup _, Some(q12Oracle)),
    ("q13_window_analytics", q13WindowAnalytics _, Some(q13Oracle)),
    ("q14_json_extract", q14JsonExtract _, Some(q14Oracle)),
    ("q15_first_row", q15FirstRow _, Some(q15Oracle)),
    ("q16_setops", q16SetOps _, Some(q16Oracle)),
    ("q17_entry_stats", q17EntryStats _, Some(q17Oracle)),
    ("q18_coverage", q18Coverage _, Some(q18Oracle)))
}
