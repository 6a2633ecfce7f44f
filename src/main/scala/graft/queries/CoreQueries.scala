package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Lake
import graft.expand.Expander
import graft.functions.Coerce
import graft.model.{AssetUri, FieldSpec}
import graft.operators.ConfigEval

/** Tag-engine-parity queries (SURVEY.md §2 inventory), each paired with a
  * DuckDB oracle over the same lake tables. Every query is deterministic:
  * totals ordered, aggregations over doubles routed through exact decimal
  * arithmetic, collect_* always sorted.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Materialize `df` into a driver-local frame, then recursively delete
    * `path` — for fixture queries whose result lazily reads files they
    * just wrote (q31/q34/q45): the read-back must not outlive its temp
    * dir, and without the delete every bench/verify invocation leaves
    * another directory under /tmp.
    */
  private[queries] def materializeThenDelete(spark: SparkSession,
      df: DataFrame, path: java.nio.file.Path): DataFrame =
    try spark.createDataFrame(df.collectAsList(), df.schema)
    finally deleteRec(path)

  private def deleteRec(path: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(path))
      java.nio.file.Files.walk(path).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
  }

  /** The staged-fixture bracket: create a temp dir, run `body`'s writes
    * and read-back against it, materialize, delete the dir. The delete
    * fires even when a WRITE inside `body` throws — the bare
    * materializeThenDelete form only guarded the read-back, so a failed
    * pre-read step (a store commit, an Avro append) leaked the dir on
    * every bench/verify retry.
    */
  private[queries] def withTempDir(spark: SparkSession, prefix: String)
      (body: java.nio.file.Path => DataFrame): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory(prefix)
    try materializeThenDelete(spark, body(path), path)
    finally deleteRec(path) // no-op when materializeThenDelete got there
  }

  /** The flagship dynamic-table config (FIXTURES.md §1.1 realized over
    * `orders`): N per-field SQL expressions with `$table` substitution,
    * evaluated as ONE combined scalar-subquery statement (A7/A8/G; combined
    * batching DataCatalogController.py:488–495). Catalyst collapses the
    * subqueries over the same table into shared scans.
    */
  def q01DynamicTable(spark: SparkSession, dir: String): DataFrame = {
    Lake.registerAll(spark, dir)
    val fields = Seq(
      FieldSpec("sum_total_requests", "double",
        Some("select count(*) from $table")),
      FieldSpec("unique_total_requests", "double",
        Some("select count(distinct o_custkey) from $table")),
      FieldSpec("avg_daily_total_requests", "double",
        Some("select ifnull(round(avg(daily_requests), 2), 0) from (" +
          "select date_created, count(*) as daily_requests from (" +
          "select cast(o_orderdate as date) as date_created from $table) " +
          "group by date_created)")))
    val uri = AssetUri("bigquery", "p", Some("lake"), Some("orders"), None)
    ConfigEval.evalCombined(spark, fields, uri)
  }

  val q01Oracle: String =
    """SELECT
      | (SELECT count(*) FROM orders) AS sum_total_requests,
      | (SELECT count(DISTINCT o_custkey) FROM orders) AS unique_total_requests,
      | (SELECT ifnull(round(avg(daily_requests), 2), 0) FROM (
      |    SELECT date_created, count(*) AS daily_requests FROM (
      |      SELECT CAST(o_orderdate AS DATE) AS date_created FROM orders)
      |    GROUP BY date_created)) AS avg_daily_total_requests,
      | 'bigquery/project/p/dataset/lake/orders' AS asset_uri""".stripMargin

  /** Synthetic asset catalog used by the expansion/tagging queries: each
    * document is an "asset" `(project p, dataset = source, table = doc_<id>)`
    * — the local stand-in for the live catalog listing (A1/A3).
    */
  private def docCatalog(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "documents").select(
      lit("p").as("project"), col("source").as("dataset"),
      concat(lit("doc_"), col("doc_id")).as("table"), col("doc_id"))

  /** A1/B1/B2: wildcard URI expansion with include−exclude. */
  def q02UriExpand(spark: SparkSession, dir: String): DataFrame =
    Expander.expand(
        docCatalog(spark, dir),
        included = Seq("bigquery/project/p/dataset/src1*/*"),
        excluded = Seq("bigquery/project/p/dataset/*/doc_1*"))
      .select("project", "dataset", "table")
      .orderBy("dataset", "table")

  val q02Oracle: String =
    """SELECT 'p' AS project, source AS dataset, 'doc_' || doc_id AS "table"
      |FROM documents
      |WHERE source LIKE '%src1%' AND NOT contains('doc_' || doc_id, 'doc_1')
      |ORDER BY dataset, "table"""".stripMargin

  /** H5/B5 + static-asset config: expand work set, anti-join away assets
    * already tagged (`overwrite=false`), attach coerced static field values
    * (FIXTURES.md §1.3).
    */
  def q03StaticOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val cat = docCatalog(spark, dir)
    val work = Expander.expand(cat,
      Seq("bigquery/project/p/dataset/src1*/*"), Nil)
    val existing = cat.filter(col("doc_id") % 3 === 0)
    Expander.minusExisting(work, existing, Seq("project", "dataset", "table"))
      .select(col("project"), col("dataset"), col("table"),
        Coerce.enumOf(lit("PROD"), Seq("DEV", "STAGING", "PROD")).as("env"),
        Coerce.bool(lit("TRUE")).as("is_sensitive"),
        Coerce.timestamp(lit("2024-03-27 14:27:00")).as("tagged_on"))
      .orderBy("dataset", "table")
  }

  val q03Oracle: String =
    """SELECT 'p' AS project, source AS dataset, 'doc_' || doc_id AS "table",
      | 'PROD' AS env, true AS is_sensitive,
      | TIMESTAMP '2024-03-27 14:27:00' AS tagged_on
      |FROM documents
      |WHERE source LIKE '%src1%' AND doc_id % 3 <> 0
      |ORDER BY dataset, "table"""".stripMargin

  /** Dynamic-column combined profiling (A8/C4 shape): one aggregation pass
    * computes every (column × field) statistic — the reference's
    * `combine_queries` batching, generalized to all columns at once — then
    * pivots to per-column rows. min/max/ndv only (no float summation →
    * bit-stable).
    */
  def q04ColumnProfile(spark: SparkSession, dir: String): DataFrame = {
    // spread: the ×3 melt + map-side distinct is per-row work above a
    // degenerate single-partition scan (Lake.spread no-ops at lake scale)
    val li = Lake.spread(Lake.table(spark, dir, "lineitem"),
      col("l_orderkey"))
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    // melt → dedup → one plain aggregate. THREE countDistincts in one
    // agg trigger Catalyst's multi-distinct rewrite (Expand ×3 of the
    // scan + grouping per distinct key set); melting to (column, value)
    // costs the same row blow-up but dedups map-side into ONE hash
    // shuffle of the distinct values, and min/max/ndv all fall out of
    // the distinct set (min over distinct == min overall). The shuffle
    // carries distinct values only — the shape that survives a wide scan.
    val melted = li.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).as("v"))): _*)).as("r"))
      .select("r.*")
    melted.distinct()
      .groupBy("column_name")
      // count(v), not count(1): a NULL survives the distinct as its own
      // row but COUNT(DISTINCT c) semantics exclude it from ndv
      .agg(min("v").as("min_val"), max("v").as("max_val"),
        count(col("v")).as("ndv"))
      .orderBy("column_name")
  }

  val q04Oracle: String =
    """SELECT 'l_quantity' AS column_name, min(l_quantity) AS min_val,
      |  max(l_quantity) AS max_val, count(DISTINCT l_quantity) AS ndv FROM lineitem
      |UNION ALL
      |SELECT 'l_extendedprice', min(l_extendedprice), max(l_extendedprice),
      |  count(DISTINCT l_extendedprice) FROM lineitem
      |UNION ALL
      |SELECT 'l_discount', min(l_discount), max(l_discount),
      |  count(DISTINCT l_discount) FROM lineitem
      |ORDER BY column_name""".stripMargin

  /** Import path (A4/C4; FIXTURES.md §1.5): CSV rows melted to
    * `(field_id, raw_value)`, joined to the template for types, coerced.
    * The fixture rows are inline so the DuckDB oracle can reproduce them as
    * VALUES.
    */
  private val importRows = Seq(
    ("p", "lake", "orders", "", "TRUE", "late delivery", "PROD", "2024-01-15"),
    ("p", "lake", "lineitem", "l_discount", "FALSE", "", "DEV", "2024-01-16 08:30:00"),
    ("p", "lake", "customer", "c_acctbal", "TRUE", "vip segment", "QA", "bogus"))

  def q05ImportMelt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.model.{TagTemplate, TemplateField}
    import graft.operators.ConfigDispatch
    val csv = importRows.toDF(
      "project", "dataset", "table", "column",
      "is_compliant", "reason", "env", "eval_time")
    // is_compliant + reason are REQUIRED: a row leaving one empty fails its
    // task (DataCatalogController.py:1347–1355) — surfaced as task_status
    val tmpl = TagTemplate("imp", Seq(
      TemplateField("is_compliant", "bool", isRequired = true),
      TemplateField("reason", "string", isRequired = true),
      TemplateField("env", "enum"), TemplateField("eval_time", "timestamp")))
    val keys = Seq("project", "dataset", "table", "column")
    val errored = ConfigDispatch.requiredViolations(csv, tmpl)
      .withColumn("task_status", lit("ERROR"))
    val melted = csv.unpivot(
      Array(col("project"), col("dataset"), col("table"), col("column")),
      Array(col("is_compliant"), col("reason"), col("env"), col("eval_time")),
      "field_id", "raw_value")
    val template = Seq(
      ("is_compliant", "bool"), ("reason", "string"),
      ("env", "enum"), ("eval_time", "timestamp"))
      .toDF("field_id", "field_type")
    melted.join(broadcast(template), "field_id")
      .join(broadcast(errored), keys, "left_outer")
      .select(col("project"), col("dataset"), col("table"), col("column"),
        col("field_id"), col("field_type"),
        coalesce(col("task_status"), lit("SUCCESS")).as("task_status"),
        when(col("field_type") === "bool", Coerce.bool(col("raw_value")))
          .as("v_bool"),
        when(col("field_type") === "string", col("raw_value"))
          .when(col("field_type") === "enum",
            Coerce.enumOf(col("raw_value"), Seq("DEV", "STAGING", "PROD")))
          .as("v_str"),
        when(col("field_type") === "timestamp",
          Coerce.timestamp(col("raw_value"))).as("v_ts"))
      .orderBy("table", "field_id")
  }

  val q05Oracle: String = {
    val values = importRows.map { case (p, d, t, c, b, r, e, ts) =>
      s"('$p','$d','$t','$c','$b','$r','$e','$ts')"
    }.mkString(", ")
    s"""WITH csv(project, dataset, "table", "column", is_compliant, reason, env, eval_time) AS (
       |  VALUES $values),
       |m AS (SELECT project, dataset, "table", "column", field_id, raw_value FROM csv
       |      UNPIVOT INCLUDE NULLS
       |        (raw_value FOR field_id IN (is_compliant, reason, env, eval_time))),
       |t(field_id, field_type) AS (VALUES ('is_compliant','bool'), ('reason','string'),
       |                                   ('env','enum'), ('eval_time','timestamp')),
       |s AS (SELECT project, dataset, "table", "column",
       |        CASE WHEN trim(is_compliant) = '' OR trim(reason) = ''
       |             THEN 'ERROR' ELSE 'SUCCESS' END AS task_status
       |      FROM csv)
       |SELECT m.project, m.dataset, m."table", m."column", m.field_id, t.field_type,
       | s.task_status,
       | CASE WHEN field_type = 'bool'
       |      THEN coalesce(upper(trim(raw_value)) = 'TRUE', false) END AS v_bool,
       | CASE WHEN field_type = 'string' THEN raw_value
       |      WHEN field_type = 'enum' THEN
       |        (CASE WHEN raw_value IN ('DEV','STAGING','PROD') THEN raw_value END)
       | END AS v_str,
       | CASE WHEN field_type = 'timestamp' THEN
       |   (CASE WHEN length(trim(raw_value)) = 10 THEN try_strptime(trim(raw_value), '%Y-%m-%d')
       |         WHEN length(trim(raw_value)) = 19 THEN try_strptime(trim(raw_value), '%Y-%m-%d %H:%M:%S')
       |         ELSE try_cast(raw_value AS TIMESTAMP) END)
       | END AS v_ts
       |FROM m JOIN t USING (field_id)
       |JOIN s ON s.project = m.project AND s.dataset = m.dataset
       |      AND s."table" = m."table" AND s."column" = m."column"
       |ORDER BY m."table", field_id""".stripMargin
  }

  /** §1.2 type-system sweep over real data: every coercion rule (bool,
    * double-via-decimal, enum, richtext join, 10/19-length timestamp
    * heuristic) exercised per order-priority group.
    */
  def q06Coercion(spark: SparkSession, dir: String): DataFrame = {
    val o = Lake.table(spark, dir, "orders")
      .withColumn("date_s", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .withColumn("dt_s", date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("bool_s",
        when(col("o_orderstatus") === "O", lit("TRUE")).otherwise(lit("false")))
      .withColumn("dbl_s",
        col("o_totalprice").cast("decimal(18,2)").cast("string"))
    o.groupBy("o_orderpriority").agg(
        count(lit(1)).as("n"),
        max(Coerce.timestamp(col("date_s"))).as("max_date_ts"),
        max(Coerce.timestamp(col("dt_s"))).as("max_dt_ts"),
        count(when(Coerce.bool(col("bool_s")), 1)).as("n_open"),
        sum(Coerce.double(col("dbl_s")).cast("decimal(18,2)"))
          .cast("double").as("sum_price"),
        count(Coerce.enumOf(col("o_orderpriority"),
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))).as("n_enum_valid"),
        Coerce.richtext(array_sort(collect_set(col("o_orderstatus"))))
          .as("statuses_richtext"))
      .orderBy("o_orderpriority")
  }

  val q06Oracle: String =
    """SELECT o_orderpriority, count(*) AS n,
      | max(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')) AS max_date_ts,
      | max(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')) AS max_dt_ts,
      | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
      | CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      | count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
      |            THEN o_orderpriority END) AS n_enum_valid,
      | string_agg(DISTINCT o_orderstatus, '<br>' ORDER BY o_orderstatus) AS statuses_richtext
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** name → (query, oracle). */
  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q01_dynamic_table", q01DynamicTable _, Some(q01Oracle)),
    ("q02_uri_expand", q02UriExpand _, Some(q02Oracle)),
    ("q03_static_overwrite", q03StaticOverwrite _, Some(q03Oracle)),
    ("q04_column_profile", q04ColumnProfile _, Some(q04Oracle)),
    ("q05_import_melt", q05ImportMelt _, Some(q05Oracle)),
    ("q06_coercion", q06Coercion _, Some(q06Oracle)))
}
