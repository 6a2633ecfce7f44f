package graft.sched

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AUTO-refresh scheduling + job/config state (SURVEY.md §2 H1–H4, A14,
  * B6, D7).
  *
  * The reference polls Firestore for due configs (Cloud Scheduler →
  * `read_ready_configs`, TagEngineStoreHandler.py:1374–1392), re-anchors
  * `next_run = now + refresh_frequency` and bumps `version += 1` per
  * launch (:290–309, 623–646), and fans jobs out over two Cloud Tasks queues with
  * per-shard counters (TaskManager.py, JobManager.py). Here config state is
  * a DataFrame (backing table: the `configs` lake table); selection is a
  * filter, the next-run advance is a MERGE-shaped transform, and the job
  * fan-in is one groupBy (see CoreQueries2.q12JobRollup). Driven either by
  * a plain driver loop or a Structured Streaming `Trigger.AvailableNow`
  * batch — no stateful streaming operators are required for parity.
  *
  * `configs` schema: (config_uuid, config_type, config_status, refresh_mode,
  * scheduling_status, refresh_frequency_minutes, next_run timestamp,
  * version).
  */
object Scheduler {

  /** H1: configs due to run at `now` (TagEngineStoreHandler.py:1374–1392):
    * `refresh_mode='AUTO' ∧ config_status='ACTIVE' ∧
    * scheduling_status='READY' ∧ next_run <= now`.
    */
  def readReadyConfigs(configs: DataFrame, now: Column): DataFrame =
    configs.filter(
      col("refresh_mode") === "AUTO" &&
      col("config_status") === "ACTIVE" &&
      col("scheduling_status") === "READY" &&
      col("next_run") <= now)

  /** H2: advance launched configs — `next_run = now + frequency`,
    * `version += 1`, scheduling_status back to READY. The anchor is `now`,
    * NOT the previous next_run: the reference computes
    * `datetime.utcnow() + timedelta(...)` (TagEngineStoreHandler.py:
    * 296–301), so a config that fell behind schedule drifts forward to
    * one full period from the launch instant rather than replaying every
    * missed slot — an overdue 5-minute config launches once, not
    * back-to-back until it catches up. MERGE semantics: only rows present
    * in `launched` (by config_uuid) change.
    */
  def advanceNextRun(configs: DataFrame, launched: DataFrame,
                     now: Column): DataFrame = {
    val hit = launched.select(col("config_uuid")).distinct()
      .withColumn("__launched", lit(true))
    val advanced = configs.join(hit, Seq("config_uuid"), "left_outer")
      .withColumn("next_run",
        // interval arithmetic, not unix_timestamp round-trip: the latter
        // floors to whole seconds, silently drifting a schedule with
        // sub-second next_run 0-1 s earlier per advance (and diverging
        // from the oracle's `+ n * INTERVAL 1 MINUTE`)
        when(col("__launched"),
          timestamp_add("MINUTE", col("refresh_frequency_minutes"), now))
          .otherwise(col("next_run")))
      .withColumn("version",
        when(col("__launched"), col("version") + 1).otherwise(col("version")))
    // the reference keeps launched configs READY through the whole cycle
    // (the launch only marks job_status PENDING, main.py:3097–3098, and
    // the fan-in path re-asserts READY, main.py:3645) — without this, the
    // moment a
    // launch path models the PENDING state, advanced configs would stay
    // non-READY forever and readReadyConfigs (which filters
    // scheduling_status = 'READY') would never select them again: a
    // schedule that silently halts after one tick. Conditional: narrow
    // projections without the column advance next_run/version only.
    val withStatus =
      if (!advanced.columns.contains("scheduling_status")) advanced
      else advanced.withColumn("scheduling_status",
        when(col("__launched"), lit("READY"))
          .otherwise(col("scheduling_status")))
    withStatus.drop("__launched")
  }

  /** Config identity for idempotence: md5 over the semantic content
    * (TagEngineStoreHandler.py:366–392 uses md5(uris)+template to INACTIVE
    * duplicate configs). New duplicate configs supersede old ones.
    */
  def deactivateSuperseded(configs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("content_md5").orderBy(col("version").desc,
      col("config_uuid").asc)
    configs.withColumn("__rn", row_number().over(w))
      .withColumn("config_status",
        when(col("__rn") > 1, lit("INACTIVE")).otherwise(col("config_status")))
      .drop("__rn")
  }
}
