package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{Ingest, Streams}

/** Per-round streaming gate at BENCH scale: drives the six streaming
  * forms (st01–st03, st08–st10) as real Structured Streaming queries
  * over the full sf0.1 tables and asserts equivalence with their batch
  * forms — the oracle-gated equivalence specs run at fixture scale
  * only, and a state/watermark bug that manifests only at volume
  * (state-store growth, watermark lag across many keys, per-group
  * iterator ordering over thousands of users) would pass there.
  *
  * Prints one wall+status line per form and a final JSON summary line;
  * exits nonzero on any mismatch so a driver can gate on it.
  *
  * args: [sfDir] (default /root/testdata/sf0.1)
  */
object StreamingScale {

  private var failures = List.empty[String]

  private def form(name: String)(run: => Unit): (String, Double) = {
    val t0 = System.nanoTime()
    try run
    catch {
      case t: Throwable =>
        failures ::= s"$name: ${t.getMessage}"
        System.err.println(s"[stream-scale] $name FAILED: $t")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[stream-scale] $name%-6s ${if (failures.exists(_.startsWith(name))) "FAIL" else "ok"} $wall%.2f s")
    name -> (math.round(wall * 1000) / 1000.0)
  }

  private def check(name: String, cond: Boolean, msg: => String): Unit =
    if (!cond) throw new IllegalStateException(s"$name: $msg")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val events = graft.Lake.table(spark, sfDir, "events").localCheckpoint()
    val docs = graft.Lake.table(spark, sfDir, "documents").localCheckpoint()

    def awaitAll(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      q.awaitTermination(600000); ()
    }

    val walls = Seq(
      form("st01") {
        // windowed event counts: two staged arrival files, complete mode
        val stage = Files.createTempDirectory("scale_st01").toString
        events.filter(col("event_id") % 2 === 0).write.mode("append").parquet(stage)
        events.filter(col("event_id") % 2 === 1).write.mode("append").parquet(stage)
        awaitAll(Streams.streamingEventCounts(spark, stage, events.schema)
          .writeStream.outputMode("complete")
          .format("memory").queryName("scale_wincounts")
          .trigger(Trigger.AvailableNow()).start())
        val streamed = spark.table("scale_wincounts")
          .orderBy("window_start", "event_type").collect().toSeq
        val batch = Streams.windowedEventCounts(events)
          .orderBy("window_start", "event_type").collect().toSeq
        check("st01", streamed == batch,
          s"windowed counts diverge (${streamed.length} vs ${batch.length} rows)")
      },

      form("st02") {
        // stateful sessionize over EVERY user at volume. A sentinel event
        // 100 days past max(ts) drives the final watermark beyond every
        // real session's timeout, so the no-data flush emits ALL real
        // sessions — the streamed set (minus the sentinel user) must
        // equal the batch window form exactly.
        import Streams.{Session, SessionEvent}
        val stage = Files.createTempDirectory("scale_st02").toString
        val maxTs = events.agg(max("ts")).head().getTimestamp(0)
        val sess = events.select(col("user_id"), col("event_id"), col("ts"))
        sess.write.mode("append").parquet(stage)
        Seq((-1L, -1L, new java.sql.Timestamp(maxTs.getTime + 8640000000L)))
          .toDF("user_id", "event_id", "ts").write.mode("append").parquet(stage)
        val stream = spark.readStream.schema(sess.schema).parquet(stage)
          .as[SessionEvent]
        awaitAll(Streams.sessionizeStream(stream, gapMinutes = 30)
          .writeStream.outputMode("append")
          .format("memory").queryName("scale_sessions")
          .trigger(Trigger.AvailableNow()).start())
        val streamed = spark.table("scale_sessions").as[Session].collect()
          .filter(_.user_id >= 0)
          .map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
          .toSet
        val batch = Streams.sessionize(events, gapMinutes = 30)
          .select("user_id", "session_start", "session_end", "n_events")
          .collect()
          .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
            r.getLong(3)))
          .toSet
        check("st02", streamed == batch,
          s"sessions diverge: streamed=${streamed.size} batch=${batch.size} " +
            s"onlyStreamed=${(streamed -- batch).take(3)} " +
            s"onlyBatch=${(batch -- streamed).take(3)}")
      },

      form("st03") {
        // watermarked dedup: a full re-delivery of 10% of the table
        // across micro-batches must vanish
        val stage = Files.createTempDirectory("scale_st03").toString
        val base = events.select("event_id", "event_type", "ts")
        base.write.mode("append").parquet(stage)
        base.filter(col("event_id") % 10 === 3).write.mode("append").parquet(stage)
        awaitAll(spark.readStream.schema(base.schema).parquet(stage)
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream.outputMode("append")
          .format("memory").queryName("scale_dedup")
          .trigger(Trigger.AvailableNow()).start())
        val got = spark.table("scale_dedup").count()
        check("st03", got == base.count(),
          s"dedup count ${got} != ${base.count()}")
      },

      form("st08") {
        // event-driven re-tag: change events over two micro-batches
        // against the 100-shard dynamic config
        import graft.model.{FieldSpec, TagConfig}
        val n = 100
        val shardExpr = concat(lit("events_"),
          lpad((col("event_id") % n).cast("string"), 4, "0"))
        val catalog = spark.range(0, n)
          .select(lit("p").as("project"), lit("lake").as("dataset"),
            concat(lit("events_"), lpad(col("id").cast("string"), 4, "0"))
              .as("table"))
        val config = TagConfig(
          configType = "DYNAMIC_TAG_TABLE", templateId = "gov",
          fields = Seq(
            FieldSpec("n_rows", "double", Some("select count(*) from $table")),
            FieldSpec("n_clicks", "double",
              Some("select count(*) from $table where event_type = 'click'"))),
          includedUris = Seq("bigquery/project/p/dataset/lake/events_*"))
        val touched = events
          .filter(col("event_type") === "purchase" && col("value") >= 100)
          .select(shardExpr.as("table"))
        val stage = Files.createTempDirectory("scale_st08").toString
        touched.filter(xxhash64(col("table")) % 2 === 0)
          .write.mode("append").parquet(stage)
        touched.filter(xxhash64(col("table")) % 2 =!= 0)
          .write.mode("append").parquet(stage)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        awaitAll(spark.readStream.schema(touched.schema).parquet(stage)
          .writeStream.trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
            Streams.retagTouched(spark, config, catalog, events, shardExpr, batch)
              .collect().foreach(r => out += r.mkString("|"))
          }
          .start())
        val batchRows = Streams
          .retagTouched(spark, config, catalog, events, shardExpr, touched)
          .collect().map(_.mkString("|")).toSet
        check("st08", batchRows.nonEmpty && out.toSet == batchRows,
          s"re-tag rows diverge: streamed=${out.toSet.size} batch=${batchRows.size}")
      },

      form("st09") {
        // production ingest loop: three arrival waves folded through the
        // quality gate + novelty probes must equal the batch fold
        val stage = Files.createTempDirectory("scale_st09").toString
        (0 until 3).foreach { b =>
          docs.filter(col("doc_id") % 3 === b).coalesce(1)
            .write.mode("append").parquet(stage)
          Thread.sleep(150)
        }
        var store = Ingest.emptyStore(spark)
        awaitAll(spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(stage)
          .writeStream.trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
            store = store.unionByName(Ingest.ingestBatch(store, batch, id))
              .localCheckpoint()
          }
          .start())
        val fold = Ingest.ingestFold(spark, docs, col("doc_id") % 3, nBatches = 3)
        def keyed(df: DataFrame): Set[(Long, String, Long)] =
          df.select("doc_id", "content_hash", "simhash").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        check("st09", keyed(store) == keyed(fold) && store.count() == fold.count(),
          s"ingest store diverges from batch fold " +
            s"(${store.count()} vs ${fold.count()} rows)")
      },

      form("st10") {
        // loader coordinates: per-wave incremental (split,shard) positions
        // must equal st10's one-window form over the final store
        import org.apache.spark.sql.expressions.Window
        var store = Ingest.emptyStore(spark)
        var incremental = Set.empty[(Long, String, Long, Int)]
        var base = Map.empty[(String, Long), Int]
        (0 until 3).foreach { b =>
          val wave = docs.filter(col("doc_id") % 3 === b)
          val accepted = Ingest.ingestBatch(store, wave, b)
          store = store.unionByName(accepted).localCheckpoint()
          val waveAssigned = Ingest.loaderCoords(
              accepted.join(docs.select("doc_id", "text"), Seq("doc_id")))
            .withColumn("__rk", row_number().over(
              Window.partitionBy("split", "shard").orderBy(
                md5(concat(col("text"), col("doc_id").cast("string"))),
                col("doc_id"))))
            .select("doc_id", "split", "shard", "__rk").collect()
          waveAssigned.foreach { r =>
            val key = (r.getString(1), r.getLong(2))
            incremental += ((r.getLong(0), r.getString(1), r.getLong(2),
              base.getOrElse(key, 0) + r.getInt(3)))
          }
          waveAssigned.groupBy(r => (r.getString(1), r.getLong(2)))
            .foreach { case (k, rs) =>
              base += k -> (base.getOrElse(k, 0) + rs.length)
            }
        }
        val windowed = graft.queries.DataQueries6
          .st10LoaderReadyIngest(spark, sfDir)
          .select("doc_id", "split", "shard", "pos").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
          .toSet
        check("st10", incremental == windowed,
          s"loader coords diverge: incremental=${incremental.size} " +
            s"windowed=${windowed.size}")
      })

    val ok = failures.isEmpty
    println(s"""{"metric":"streaming_scale","sf":"$sfDir","ok":$ok,""" +
      s""""forms":{${walls.map { case (n, w) => s""""$n":$w""" }.mkString(",")}}""" +
      (if (ok) "}" else s""","failures":"${failures.mkString("; ")}"}"""))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
