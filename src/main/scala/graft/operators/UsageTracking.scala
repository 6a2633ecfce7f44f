package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Usage-tracking extension parity (extensions/usage_tracking/): the
  * reference ships four cloud functions that turn Data Catalog AUDIT-LOG
  * entries into per-event usage streams — entry_clicks / tag_creates /
  * tag_updates / tag_deletes (…/entry_clicks/main.py:60–106 and
  * siblings): filter the log on one API method name, DISTINCT the
  * second-truncated event tuple, and resolve each entry id to its backing
  * BigQuery resource.
  *
  * Spark-first deltas from the reference:
  *  - the per-row `get_entry` lookup loop (an N+1 RPC per audit row,
  *    :91–95) is a BROADCAST join against the entry→resource mapping —
  *    catalog metadata, tiny by contract;
  *  - the four single-method functions compose into ONE pass over the log
  *    (method ∈ the four-name set, kind carried as a column), and the
  *    per-asset usage rollup lands in the unified tag-row shape, so the
  *    metrics flow into a `usage` tag template through the same TagStore
  *    MERGE as every other config type.
  */
object UsageTracking {

  /** The audit-log method names the reference's four functions filter on
    * (…/entry_clicks/main.py:71 and siblings), VERBATIM — including the
    * entry-click one: `TestUpdateTagPermission` is not a documented
    * public DataCatalog RPC, but it is the literal string the reference's
    * entry_clicks function matches, and parity means matching the rows
    * the reference would match, not the rows a cleaner filter might.
    */
  val MethodEntryClick = "google.cloud.datacatalog.v1.DataCatalog.TestUpdateTagPermission"
  val MethodTagCreate = "google.cloud.datacatalog.v1.DataCatalog.CreateTag"
  val MethodTagUpdate = "google.cloud.datacatalog.v1.DataCatalog.UpdateTag"
  val MethodTagDelete = "google.cloud.datacatalog.v1.DataCatalog.DeleteTag"

  /** kind → method, in the reference's reporting-table naming. */
  val Kinds: Seq[(String, String)] = Seq(
    "entry_clicks" -> MethodEntryClick,
    "tag_creates" -> MethodTagCreate,
    "tag_updates" -> MethodTagUpdate,
    "tag_deletes" -> MethodTagDelete)

  /** The reference's four reporting streams (one function per method,
    * each `select distinct timestamp_trunc(timestamp, SECOND) …`) in ONE
    * log pass: methods are disjoint, so the per-kind DISTINCT equals a
    * single DISTINCT with `kind` carried. Entries resolve to their
    * BigQuery resource via the broadcast lookup.
    * `audit(event_time, project, user_email, method, dc_entry)`;
    * `lookup(dc_entry, bq_resource)`.
    */
  def allUsageEvents(audit: DataFrame, lookup: DataFrame,
                     startDate: Option[String] = None): DataFrame = {
    val kindOf = Kinds.foldLeft(lit(null).cast("string")) { case (acc, (k, m)) =>
      when(col("method") === m, lit(k)).otherwise(acc)
    }
    // the reference's optional start_date window, with its exact DAY
    // truncation (`timestamp_trunc(timestamp, DAY) >= timestamp(start)`,
    // entry_clicks/main.py:73–74): an event at 03:00 on the start day is
    // IN even though its raw timestamp precedes a midnight start bound.
    // BigQuery's timestamp_trunc(DAY) is UTC, so the comparison is done
    // in epoch days (the Sinks.utcDay discipline) — date_trunc here
    // would silently re-anchor the window to the session timezone and
    // drop/admit boundary events on any non-UTC-configured cluster
    val windowed = startDate.fold(audit) { d =>
      audit.filter(Sinks.utcEpochDay(col("event_time")) >=
        datediff(to_date(lit(d)), to_date(lit("1970-01-01"))))
    }
    windowed.withColumn("kind", kindOf).filter(col("kind").isNotNull)
      .select(col("kind"),
        date_trunc("second", col("event_time")).as("event_time"),
        col("project"), col("user_email"), col("dc_entry"))
      .distinct()
      // one resolution per entry, like the reference's single get_entry
      // call: a duplicate dc_entry row in the mapping must not fan events
      // out and double-count the per-kind totals / n_users downstream.
      // min, not dropDuplicates: the surviving mapping must be the same
      // one on every run/partitioning, or the per-resource rollups drift
      .join(broadcast(lookup.groupBy("dc_entry")
          .agg(min(col("bq_resource")).as("bq_resource"))),
        Seq("dc_entry"), "left")
  }

  /** Per-asset usage metrics as unified TAG ROWS for a `usage` template:
    * one count field per kind, distinct-user count, and the last event
    * time — one map-side-combining aggregation over [[allUsageEvents]],
    * melted to the tag-row shape every sink already consumes.
    */
  def usageTagRows(audit: DataFrame, lookup: DataFrame,
                   templateId: String,
                   startDate: Option[String] = None): DataFrame = {
    val ev = allUsageEvents(audit, lookup, startDate)
    val counts = Kinds.map { case (k, _) =>
      count(when(col("kind") === k, lit(1))).as(k)
    }
    val summary = ev.filter(col("bq_resource").isNotNull)
      .groupBy("bq_resource")
      .agg(counts.head, counts.tail ++ Seq(
        countDistinct(col("user_email")).as("n_users"),
        max(col("event_time")).as("last_event")): _*)
    val fields =
      Kinds.map { case (k, _) =>
        struct(lit(k).as("field_id"), lit("double").as("field_type"),
          col(k).cast("double").cast("string").as("field_value"))
      } ++ Seq(
        struct(lit("n_users").as("field_id"), lit("double").as("field_type"),
          col("n_users").cast("double").cast("string").as("field_value")),
        struct(lit("last_event").as("field_id"),
          lit("datetime").as("field_type"),
          col("last_event").cast("string").as("field_value")))
    summary.select(col("bq_resource").as("asset_uri"), lit("").as("column"),
        lit(templateId).as("template_id"), explode(array(fields: _*)).as("f"))
      .select(col("asset_uri"), col("column"), col("template_id"),
        col("f.field_id"), col("f.field_type"), col("f.field_value"))
  }
}
