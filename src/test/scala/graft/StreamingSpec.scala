package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

/** Structured-Streaming path: the same windowed transform must produce the
  * batch answer when fed the batch data incrementally.
  */
class StreamingSpec extends SparkSpec {

  test("streaming windowed counts (AvailableNow) == batch windowed counts") {
    val events = Lake.table(spark, sf, "events")
    val stage = Files.createTempDirectory("graft_stream").toString
    // stage the batch table as two incremental files
    events.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 0)
      .write.mode("append").parquet(stage)
    events.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 1)
      .write.mode("append").parquet(stage)

    val agg = Streams.streamingEventCounts(spark, stage, events.schema)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("wincounts")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("wincounts")
      .orderBy("window_start", "event_type").collect()
    val batch = Streams.windowedEventCounts(events)
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stateful streaming sessionize emits the sessions closed by observed gaps") {
    import spark.implicits._
    import graft.streaming.Streams.{Session, SessionEvent}
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val stage = Files.createTempDirectory("graft_sess").toString
    Seq(
      SessionEvent(1L, 1L, ts("2024-01-01 00:00:00")),
      SessionEvent(1L, 2L, ts("2024-01-01 00:10:00")),  // same session
      SessionEvent(1L, 3L, ts("2024-01-01 02:00:00")),  // gap → closes first
      SessionEvent(2L, 4L, ts("2024-01-01 00:00:00")))
      .toDF().write.mode("append").parquet(stage)

    val stream = spark.readStream
      .schema(spark.read.parquet(stage).schema).parquet(stage)
      .as[SessionEvent]
    val q = graft.streaming.Streams.sessionizeStream(stream, gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val closed = spark.table("sessions").as[Session].collect().toSet
    // user 1's first session closes via the observed gap; user 2's closes
    // via the event-time TIMEOUT once the watermark (max ts - 30min = 01:30)
    // passes its end+gap (00:30). User 1's 02:00 session stays open (its
    // timeout 02:30 is beyond the watermark) and is correctly NOT emitted.
    assert(closed === Set(
      Session(1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2L),
      Session(2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), 1L)))
  }

  test("sessionize stream: a cross-batch out-of-order event cannot regress session_end") {
    // an event from a later micro-batch only has to clear the WATERMARK
    // (which lags by gap), so it can be older than the open session's
    // tail. The merge must take min/max — an unconditional
    // `session_end = e.ts` emits a corrupt session AND pulls the
    // event-time timeout earlier. Batch sessionize (max ts per session)
    // is the contract.
    import spark.implicits._
    import graft.streaming.Streams.{Session, SessionEvent}
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val stage = Files.createTempDirectory("graft_sess_ooo").toString
    Seq( // batch 1: open session [00:00, 00:20]
      SessionEvent(1L, 1L, ts("2024-01-01 00:00:00")),
      SessionEvent(1L, 2L, ts("2024-01-01 00:20:00")))
      .toDF().coalesce(1).write.mode("append").parquet(stage)
    Thread.sleep(150)
    Seq( // batch 2: out-of-order 00:10 (within gap AND watermark) + a
      // sentinel far enough ahead to flush user 1 via timeout
      SessionEvent(1L, 3L, ts("2024-01-01 00:10:00")),
      SessionEvent(99L, 4L, ts("2024-01-01 10:00:00")))
      .toDF().coalesce(1).write.mode("append").parquet(stage)

    val stream = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .as[SessionEvent]
    val q = graft.streaming.Streams.sessionizeStream(stream, gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_ooo")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val closed = spark.table("sessions_ooo").as[Session].collect()
      .filter(_.user_id == 1L).toSet
    // end stays 00:20 (NOT the out-of-order 00:10) and the merged event
    // is counted — exactly what batch sessionize produces on the union
    assert(closed === Set(
      Session(1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:20:00"), 3L)))
  }

  test("stream-static join enriches streaming events with a dimension table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Lake.table(spark, sf, "events")
    val stage = Files.createTempDirectory("graft_enrich").toString
    events.write.mode("append").parquet(stage)
    val dim = (0L to 4L).map(i => (i, s"segment_$i")).toDF("seg_key", "segment")

    val stream = spark.readStream.schema(events.schema).parquet(stage)
      .withColumn("seg_key", col("user_id") % 5)
      .join(broadcast(dim), "seg_key") // stream-static broadcast join
      .groupBy("segment").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("enriched")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("enriched").as[(String, Long)].collect().toMap
    val batch = events.withColumn("seg_key", col("user_id") % 5)
      .join(dim, "seg_key").groupBy("segment").count()
      .as[(String, Long)].collect().toMap
    assert(streamed === batch)
  }

  test("enrichedWindowCounts (st07 transform) streaming == batch") {
    import org.apache.spark.sql.functions._
    val events = Lake.table(spark, sf, "events")
    val dim = Lake.table(spark, sf, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val stage = Files.createTempDirectory("graft_enrichwin").toString
    events.write.mode("append").parquet(stage)

    val stream = spark.readStream.schema(events.schema).parquet(stage)
      .withWatermark("ts", "10 minutes")
    val q = Streams.enrichedWindowCounts(stream, dim)
      .writeStream.outputMode("complete")
      .format("memory").queryName("enrichwin")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("enrichwin")
      .orderBy("window_start", "segment").collect()
    val batch = Streams.enrichedWindowCounts(events, dim)
      .orderBy("window_start", "segment").collect()
    assert(streamed.length === batch.length && streamed.toSeq === batch.toSeq)
  }

  test("dropDuplicatesWithinWatermark dedups repeated events across micro-batches") {
    import spark.implicits._
    val events = Lake.table(spark, sf, "events")
      .select("event_id", "event_type", "ts")
    val stage = Files.createTempDirectory("graft_dedup").toString
    events.write.mode("append").parquet(stage)   // batch 1
    events.limit(200).write.mode("append").parquet(stage) // batch 2: dupes

    val stream = spark.readStream.schema(events.schema).parquet(stage)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("deduped")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("deduped").count() === events.count())
  }

  test("stream-stream interval join (views before purchases) == batch") {
    import org.apache.spark.sql.functions._
    val events = Lake.table(spark, sf, "events")
    val stage = Files.createTempDirectory("graft_ivj").toString
    events.write.mode("append").parquet(stage)

    def side(tpe: String) = spark.readStream.schema(events.schema)
      .parquet(stage).filter(col("event_type") === tpe)
      .withWatermark("ts", "30 minutes")
    val joined = Streams.viewsBeforePurchases(
      side("view"), side("purchase"), minutes = 10)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ivjoin")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("event_id", "n_prior_views").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = pairs(spark.table("ivjoin"))
    val batch = pairs(Streams.viewsBeforePurchases(
      events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "purchase"), minutes = 10))
    assert(streamed === batch)
  }

  test("event-driven re-tag (st08 transform): streaming change events == batch") {
    import org.apache.spark.sql.functions._
    import graft.model.{FieldSpec, TagConfig}
    val events = Lake.table(spark, sf, "events")
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
    // change events arrive over TWO micro-batches
    val stage = Files.createTempDirectory("graft_retag").toString
    touched.filter(xxhash64(col("table")) % 2 === 0)
      .write.mode("append").parquet(stage)
    touched.filter(xxhash64(col("table")) % 2 =!= 0)
      .write.mode("append").parquet(stage)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val stream = spark.readStream.schema(touched.schema).parquet(stage)
    val q = stream.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Streams.retagTouched(spark, config, catalog, events, shardExpr, batch)
          .collect().foreach(r => out += r.mkString("|"))
      }
      .start()
    q.awaitTermination(120000)
    // a shard touched in both micro-batches re-tags twice — idempotent
    // under the MERGE sink, so compare the DISTINCT row sets
    val batchRows = Streams
      .retagTouched(spark, config, catalog, events, shardExpr, touched)
      .collect().map(_.mkString("|")).toSet
    assert(batchRows.nonEmpty)
    assert(out.toSet === batchRows)
  }

  test("re-tag family terminal: crash on the batch boundary + restart == crash-free run; replay-after-publish skips") {
    import org.apache.spark.sql.functions._
    import graft.model.{FieldSpec, TagConfig}
    import graft.operators.TagFamilyStore
    val events = Lake.table(spark, sf, "events")
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
    val fixedTime = to_timestamp(lit("2026-01-05 00:00:00"))
    // two deterministic micro-batches (one file per wave)
    val stage = Files.createTempDirectory("graft_retag_fam").toString
    touched.filter(org.apache.spark.sql.functions.xxhash64(col("table"))
        % 2 === 0).coalesce(1).write.mode("append").parquet(stage)
    Thread.sleep(150)
    touched.filter(org.apache.spark.sql.functions.xxhash64(col("table"))
        % 2 =!= 0).coalesce(1).write.mode("append").parquet(stage)

    def familyState(root: String): (Set[String], Map[String, Long]) = {
      val fam = TagFamilyStore.readFamily(spark, root)
      (fam.tags.select("asset_uri", "field_id", "field_value")
          .collect().map(_.mkString("|")).toSet,
        fam.history.groupBy("job_uuid").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    }
    def run(root: String, cp: String,
            crashOn: Option[Long]): org.apache.spark.sql.streaming.StreamingQuery = {
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      spark.readStream.schema(touched.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (crashOn.contains(id) && crashed.compareAndSet(false, true))
            // the crash the family cut must absorb: the wave's history
            // commit landed, the cut publish never reached, the
            // checkpoint offset is not committed
            TagFamilyStore.setTestMidJobHook(root, s =>
              if (s == "history")
                throw new RuntimeException("injected retag crash"))
          try Streams.retagCommitBatch(spark, config, catalog, events,
            shardExpr, batch, root, id, eventTime = fixedTime)
          finally TagFamilyStore.clearTestMidJobHook(root)
          ()
        }
        .start()
    }

    // reference: the crash-free run
    val rootA = Files.createTempDirectory("graft_retag_a").toString
    val qa = run(rootA, Files.createTempDirectory("graft_cp_a").toString,
      crashOn = None)
    qa.awaitTermination(120000)
    val (tagsA, histA) = familyState(rootA)
    assert(histA.keySet === Set("retag-0", "retag-1"))

    // the crashed run: batch 1's commit dies between its history commit
    // and the cut publish; the restart replays it from the checkpoint
    val rootB = Files.createTempDirectory("graft_retag_b").toString
    val cpB = Files.createTempDirectory("graft_cp_b").toString
    val q1 = run(rootB, cpB, crashOn = Some(1L))
    intercept[Exception] { q1.awaitTermination(120000) }
    // the torn wave is invisible: only batch 0 is served
    assert(familyState(rootB)._2.keySet === Set("retag-0"))
    val q2 = run(rootB, cpB, crashOn = None)
    q2.awaitTermination(120000)
    assert(familyState(rootB) === ((tagsA, histA)),
      "restart must converge to the crash-free run exactly")

    // the crash-AFTER-publish window: a replayed wave whose batch id the
    // cut already pins skips entirely (no doubled history)
    val again = Streams.retagCommitBatch(spark, config, catalog, events,
      shardExpr, spark.read.parquet(stage), rootB, batchId = 1L,
      eventTime = fixedTime)
    assert(again === Map.empty)
    assert(familyState(rootB) === ((tagsA, histA)))
  }

  test("ingestion pipeline (st09 transform): streaming arrivals == batch fold") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Ingest
    val docs = Lake.table(spark, sf, "documents")
    // three ordered arrival waves staged as separate files; the parquet
    // stream source processes files oldest-first, so each wave is its
    // own micro-batch
    val stage = Files.createTempDirectory("graft_ingest").toString
    (0 until 3).foreach { b =>
      // ONE file per wave (coalesce) so each wave is exactly one
      // micro-batch under maxFilesPerTrigger=1
      docs.filter(col("doc_id") % 3 === b).coalesce(1)
        .write.mode("append").parquet(stage)
      Thread.sleep(150) // distinct file mod-times → deterministic order
    }
    var store = Ingest.emptyStore(spark)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = stream.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        store = store.unionByName(Ingest.ingestBatch(store, batch, id))
          .localCheckpoint()
      }
      .start()
    q.awaitTermination(120000)
    val fold = Ingest.ingestFold(spark, docs, col("doc_id") % 3, nBatches = 3)
    // batch ids may differ in numbering; compare the decision set
    def keyed(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.select("doc_id", "content_hash", "simhash").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(keyed(store) === keyed(fold))
    assert(store.count() === fold.count())
  }

  test("ingest survives a crash mid-wave: restart converges to the batch fold") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Ingest
    import graft.sources.AtomicStore
    val docs = Lake.table(spark, sf, "documents")
    val stage = Files.createTempDirectory("graft_ingest_crash").toString
    (0 until 3).foreach { b =>
      docs.filter(col("doc_id") % 3 === b).coalesce(1)
        .write.mode("append").parquet(stage)
      Thread.sleep(150)
    }
    val storeDir = Files.createTempDirectory("graft_ingest_store").toString
    val cp = Files.createTempDirectory("graft_ingest_cp").toString
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (id == 1L && crashed.compareAndSet(false, true)) {
            // the crash the protocol must survive: the wave's accepted
            // rows LAND as data files, the manifest never publishes, the
            // checkpoint offset is not committed — a killed executor/JVM
            // between the two steps of the commit
            val store = AtomicStore.read(spark, storeDir)
            AtomicStore.writeData(Ingest.ingestBatch(store, batch, id), storeDir)
            throw new RuntimeException("simulated crash mid-wave")
          }
          Ingest.ingestBatchCommit(spark, storeDir, batch, id)
          ()
        }
        .start()
    val q1 = run()
    intercept[Exception] { q1.awaitTermination(120000) }
    // only wave 0 is visible — the half-written wave 1 must not be
    val afterCrash = AtomicStore.read(spark, storeDir)
    assert(afterCrash.select(max(col("batch"))).head.getLong(0) === 0L)
    // restart from the same checkpoint: wave 1 replays, then wave 2
    val q2 = run()
    q2.awaitTermination(120000)
    val fold = Ingest.ingestFold(spark, docs, col("doc_id") % 3, nBatches = 3)
    def keyed(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.select("doc_id", "content_hash", "simhash").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val store = AtomicStore.read(spark, storeDir)
    assert(keyed(store) === keyed(fold))
    assert(store.count() === fold.count())
  }

  test("st10 claim: per-wave incremental (split,shard) positions == one window") {
    // the production form assigns pos incrementally per wave (per-shard
    // base count + within-wave rank); st10 computes ONE window over the
    // final store ordered by (batch, md5, doc_id). Waves append
    // monotonically, so the two must agree exactly — this pins the
    // equivalence the query's scaladoc claims
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFns
    import graft.streaming.Ingest
    val docs = Lake.table(spark, sf, "documents")
    var store = Ingest.emptyStore(spark)
    var incremental = Seq.empty[(Long, String, Long, Int)] // doc, split, shard, pos
    var base = Map.empty[(String, Long), Int] // (split, shard) -> count so far
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
        incremental :+= ((r.getLong(0), r.getString(1), r.getLong(2),
          base.getOrElse(key, 0) + r.getInt(3)))
      }
      waveAssigned.groupBy(r => (r.getString(1), r.getLong(2)))
        .foreach { case (k, rs) => base += k -> (base.getOrElse(k, 0) + rs.length) }
    }
    val windowed = graft.queries.DataQueries6
      .st10LoaderReadyIngest(spark, sf)
      .select("doc_id", "split", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(incremental.toSet === windowed.toSet)
    assert(incremental.length === windowed.length)
  }

  test("ingest: a token-less doc passing the gate still lands (minTokens=0)") {
    import spark.implicits._
    import graft.streaming.Ingest
    val batch = Seq((1L, "   "), (2L, "real document text here"))
      .toDF("doc_id", "text")
    val accepted = Ingest
      .ingestBatch(Ingest.emptyStore(spark), batch, 0L, minTokens = 0)
      .orderBy("doc_id").collect()
    // doc 1 has no tokens → no simhash row; it must land with a NULL
    // signature, not vanish through an inner join against the signatures
    assert(accepted.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(accepted.head.isNullAt(3))
    assert(!accepted(1).isNullAt(3))
  }

  test("ingest: signature-less store row never falsely rejects a " +
      "low-popcount arrival") {
    import spark.implicits._
    // The hazard behind the NULL-signature rule, pinned at the probe
    // level with synthetic signatures: a genuine low-popcount arrival
    // (popcount 1 here) sits within hamming ≤ 4 of an all-zeros value, so
    // a 0L SENTINEL store row would match it and falsely reject it as a
    // near-dup of empty content — while the NULL row the store now writes
    // produces no candidate pair at all.
    val arrival = Seq((2L, 1L)).toDF("doc_id", "simhash")
    val sentinel = Seq((1L, 0L)).toDF("doc_id", "simhash")
    val nullSig = Seq((1L, Option.empty[Long])).toDF("doc_id", "simhash")
    def hits(store: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Dedup.simhashPairsBetween(
        arrival, store.filter(store("simhash").isNotNull), "doc_id",
        maxHamming = 4).count()
    assert(hits(sentinel) === 1L, "sanity: the sentinel WOULD match")
    assert(hits(nullSig) === 0L)
    // and end-to-end: ingest against a store holding the null row
    val store = Seq((1L, 0L, "h_empty", Option.empty[Long]))
      .toDF("doc_id", "batch", "content_hash", "simhash")
    val accepted = graft.streaming.Ingest.ingestBatch(store,
      Seq((2L, "tiny real doc")).toDF("doc_id", "text"), 1L, minTokens = 0)
    assert(accepted.select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("sessionize: gaps under threshold merge, over threshold split") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:10:00")),  // +10min → same session
      (3L, 1L, ts("2024-01-01 01:00:00")),  // +50min → new session
      (4L, 2L, ts("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = Streams.sessionize(df, gapMinutes = 30)
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("streaming scheduler tick (AvailableNow) == batch tick (H1 streaming form)") {
    import org.apache.spark.sql.functions._
    import graft.model.FieldSpec
    Lake.registerAll(spark, sf)
    val catalog = {
      import spark.implicits._
      Seq(("p", "lake", "region"), ("p", "lake", "nation"),
        ("p", "lake", "supplier"))
        .toDF("project", "dataset", "table")
    }
    val fields: Map[String, Seq[FieldSpec]] = Map(
      "cA" -> Seq(
        FieldSpec("n_rows", "double", Some("select count(*) from $table"))),
      "cB" -> Seq(
        FieldSpec("n_rows", "double", Some("select count(*) from $table"))),
      "cC" -> Seq(
        FieldSpec("n_rows", "double", Some("select count(*) from $table"))))
    def mkConfigs(rows: Seq[(String, String, String, Long, String, Long)]) = {
      import spark.implicits._
      rows.toDF("config_uuid", "template_id", "included_uris",
          "refresh_frequency_minutes", "next_run_s", "version")
        .withColumn("next_run", to_timestamp(col("next_run_s")))
        .drop("next_run_s")
        .withColumn("config_type", lit("DYNAMIC_TAG_TABLE"))
        .withColumn("config_status", lit("ACTIVE"))
        .withColumn("refresh_mode", lit("AUTO"))
        .withColumn("scheduling_status", lit("READY"))
    }
    // cA and cB due at the tick, cC not — cC must appear in NEITHER form
    val rows = Seq(
      ("cA", "gov", "bigquery/project/p/dataset/lake/region", 60L,
        "2024-03-01 10:00:00", 1L),
      ("cB", "ops",
        "bigquery/project/p/dataset/lake/nation, bigquery/project/p/dataset/lake/supplier",
        30L, "2024-03-01 11:00:00", 3L),
      ("cC", "gov", "bigquery/project/p/dataset/lake/region", 60L,
        "2024-03-01 14:00:00", 1L))
    val now = to_timestamp(lit("2024-03-01 12:00:00"))
    val emptyTags = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "asset_uri string, column string, template_id string, " +
          "field_id string, field_value string"))
    // config state lands over TWO micro-batches (cA+cC, then cB)
    val stage = Files.createTempDirectory("graft_tick").toString
    mkConfigs(rows.filter(r => r._1 != "cB")).write.mode("append").parquet(stage)
    mkConfigs(rows.filter(r => r._1 == "cB")).write.mode("append").parquet(stage)
    val schema = mkConfigs(rows).schema
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val stream = spark.readStream.schema(schema).parquet(stage)
    val q = stream.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Streams.schedulerTick(spark, batch, now, catalog, emptyTags, fields)
          .collect().foreach(r => out += r.mkString("|"))
      }
      .start()
    q.awaitTermination(120000)
    // per-config tick outputs are independent, so the micro-batch ticks
    // must union to exactly the one-shot batch tick
    val batchRows = Streams
      .schedulerTick(spark, mkConfigs(rows), now, catalog, emptyTags, fields)
      .collect().map(_.mkString("|")).toSet
    assert(batchRows.size === 2) // cA, cB due; cC absent
    assert(out.toSet === batchRows)

    // ...and the DURABLE form: the same config stream driven through
    // schedulerTickCommit — each micro-batch's due configs land as one
    // family-cut tick, and the emitted rollups still union to the
    // one-shot pure tick (the family terminal changes durability, not
    // the tick's contract)
    import graft.operators.TagFamilyStore
    val root = Files.createTempDirectory("graft_tick_fam").toString
    val out2 = scala.collection.mutable.ArrayBuffer.empty[String]
    val q2 = spark.readStream.schema(schema).parquet(stage)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Streams.schedulerTickCommit(spark, batch, now, catalog, root,
            fields, eventTime = to_timestamp(lit("2026-01-05 00:00:00")))
          .collect().foreach(r => out2 += r.mkString("|"))
      }
      .start()
    q2.awaitTermination(120000)
    assert(out2.toSet === batchRows)
    // one cut per non-empty wave (how the source groups the staged
    // files into waves is its business — what's invariant is that a
    // cut exists and the family history carries exactly the rollup's
    // md5 job identities, exactly once each)
    assert(TagFamilyStore.currentCutVersion(spark, root).isDefined)
    val fam = TagFamilyStore.readFamily(spark, root)
    val histKeys = fam.history.select("job_uuid").distinct()
      .collect().map(_.getString(0)).toSet
    val md5Of = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(histKeys === Set(md5Of("cA|1"), md5Of("cB|3")))
    assert(fam.tags.count() === 3L) // region (cA) + nation, supplier (cB)
  }

  test("durable tick stream: crash-after-publish replays exactly-once (sched_tick pin)") {
    import org.apache.spark.sql.functions._
    import graft.model.FieldSpec
    import graft.operators.TagFamilyStore
    Lake.registerAll(spark, sf)
    val catalog = {
      import spark.implicits._
      Seq(("p", "lake", "region"), ("p", "lake", "nation"),
        ("p", "lake", "supplier"))
        .toDF("project", "dataset", "table")
    }
    val fields: Map[String, Seq[FieldSpec]] = Map(
      "cA" -> Seq(
        FieldSpec("n_rows", "double", Some("select count(*) from $table"))),
      "cB" -> Seq(
        FieldSpec("n_rows", "double", Some("select count(*) from $table"))),
      "cC" -> Seq(
        FieldSpec("n_rows", "double", Some("select count(*) from $table"))))
    def mkConfigs(rows: Seq[(String, String, String, Long, String, Long)]) = {
      import spark.implicits._
      rows.toDF("config_uuid", "template_id", "included_uris",
          "refresh_frequency_minutes", "next_run_s", "version")
        .withColumn("next_run", to_timestamp(col("next_run_s")))
        .drop("next_run_s")
        .withColumn("config_type", lit("DYNAMIC_TAG_TABLE"))
        .withColumn("config_status", lit("ACTIVE"))
        .withColumn("refresh_mode", lit("AUTO"))
        .withColumn("scheduling_status", lit("READY"))
    }
    val wave0 = Seq(
      ("cA", "gov", "bigquery/project/p/dataset/lake/region", 60L,
        "2024-03-01 10:00:00", 1L),
      ("cC", "gov", "bigquery/project/p/dataset/lake/region", 60L,
        "2024-03-01 14:00:00", 1L)) // not due — must not commit
    val wave1 = Seq(
      ("cB", "ops",
        "bigquery/project/p/dataset/lake/nation, bigquery/project/p/dataset/lake/supplier",
        30L, "2024-03-01 11:00:00", 3L))
    val now = to_timestamp(lit("2024-03-01 12:00:00"))
    val fixedTime = to_timestamp(lit("2026-01-05 00:00:00"))
    val schema = mkConfigs(wave0).schema
    def familyState(root: String): (Set[String], Map[String, Long]) = {
      val fam = TagFamilyStore.readFamily(spark, root)
      (fam.tags.select("asset_uri", "field_id", "field_value")
          .collect().map(_.mkString("|")).toSet,
        fam.history.groupBy("job_uuid").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    }
    val md5Of = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    // crash-free reference: both waves staged, one drain — the durable
    // form of the pure tick whose per-config independence the previous
    // test pins
    val stageA = Files.createTempDirectory("graft_dtick_a").toString
    mkConfigs(wave0).write.mode("append").parquet(stageA)
    mkConfigs(wave1).write.mode("append").parquet(stageA)
    val rootA = Files.createTempDirectory("graft_dtick_fam_a").toString
    Streams.schedulerTickStream(spark, stageA, schema,
        Files.createTempDirectory("graft_dtick_cp_a").toString,
        now, catalog, rootA, fields, eventTime = fixedTime)
      .awaitTermination(120000)
    val (tagsA, histA) = familyState(rootA)
    assert(histA.keySet === Set(md5Of("cA|1"), md5Of("cB|3")))

    // crashed run: wave 0 drains clean; wave 1's foreachBatch throws
    // AFTER schedulerTickCommit returned — the family cut is published,
    // the checkpoint offset is NOT, exactly the window the pin closes
    val stageB = Files.createTempDirectory("graft_dtick_b").toString
    val cpB = Files.createTempDirectory("graft_dtick_cp_b").toString
    val rootB = Files.createTempDirectory("graft_dtick_fam_b").toString
    def drain(onTick: org.apache.spark.sql.DataFrame => Unit): Unit =
      Streams.schedulerTickStream(spark, stageB, schema, cpB, now, catalog,
        rootB, fields, eventTime = fixedTime, onTick = onTick)
        .awaitTermination(120000)
    mkConfigs(wave0).write.mode("append").parquet(stageB)
    drain(_ => ())
    mkConfigs(wave1).write.mode("append").parquet(stageB)
    intercept[Exception] { drain { _ =>
      throw new RuntimeException("injected crash after publish")
    } }
    // the wave's commit DID land (crash was after the cut publish)
    assert(familyState(rootB)._2.keySet === histA.keySet)
    // restart: the checkpoint replays wave 1, the sched_tick pin skips
    // its family commit, and the rollup still re-emits for the caller's
    // config-store merge
    val replayed = scala.collection.mutable.ArrayBuffer.empty[String]
    drain(df => df.collect().foreach(r => replayed += r.getString(0)))
    assert(replayed.toSeq === Seq("cB"),
      "the replayed wave must re-emit its rollup")
    assert(familyState(rootB) === ((tagsA, histA)),
      "replay must converge bit-identically to the crash-free run " +
        "(no doubled history under the same job_uuid)")
  }
}
