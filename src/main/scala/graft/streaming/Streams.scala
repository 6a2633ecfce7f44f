package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Lake

/** Structured-Streaming surface (SURVEY.md §2 H).
  *
  * The reference has no true streaming — its time-driven behavior is a
  * poll-based scheduler (main.py:3075–3110). Beyond parity, a training-data
  * pipeline needs incremental ingest: the transforms here are written once
  * against a DataFrame and run identically in batch (the DuckDB-checked
  * query) and under `readStream` with a watermark (covered by ScalaTest with
  * `Trigger.AvailableNow`). Tumbling windows align to the epoch, matching
  * DuckDB's `time_bucket`.
  */
object Streams {

  /** Tumbling 5-minute counts + exact-decimal value sums per event type.
    * Works for both batch and streaming inputs (same plan; streaming adds
    * the watermark before calling).
    */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** The streaming form: parquet source → watermark → windowed agg.
    * Late data beyond 10 minutes is dropped once the watermark passes.
    */
  def streamingEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val schema = Lake.table(spark, dir, "events").schema
    val stream = spark.readStream.schema(schema)
      .parquet(s"$dir/events_stream") // directory of batch-shaped files
    windowedEventCounts(stream.withWatermark("ts", "10 minutes"))
  }

  /** Batch sessionization: a new session starts after a ≥ `gapMinutes`
    * silence per user (lag + running sum — the batch-equivalent of the
    * `flatMapGroupsWithState` session operator). Deterministic: events
    * tie-broken by event_id.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") >= gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
  }
}
