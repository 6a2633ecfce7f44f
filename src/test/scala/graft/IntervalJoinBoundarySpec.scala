package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

/** Adversarial watermark-boundary property test for the stream-stream
  * interval join (Streams.viewsBeforePurchases) — the join-side analogue
  * of SessionBoundarySpec. StreamingSpec proves streaming == batch when
  * every row arrives on time (one trigger, watermark never passes
  * anything); this spec drives rows INTO the late window across
  * micro-batches and pins the exact divergence contract of a watermarked
  * inner join + aggregation.
  *
  * The allowance is WIDER than the raw watermark, and exactly as wide as
  * the join's time-range condition: a view is dropped only below
  * `watermark - window` (its join-state watermark — it could still match
  * purchases up to `window` later), and a purchase only below the
  * watermark itself. A first draft of this spec planted rows one batch
  * late but INSIDE that allowance, and streaming still matched batch
  * exactly — the state watermark is not slack, it is precisely the
  * lateness the range condition obliges Spark to absorb. So:
  *
  *  - a row arriving late but within its side's allowance changes
  *    NOTHING — streaming == batch;
  *  - a view below `watermark - window` is dropped on INPUT, so every
  *    purchase batch would credit with it UNDERCOUNTS by exactly the
  *    dropped rows — never overcounts;
  *  - a purchase below the watermark is NOT dropped wholesale (a second
  *    draft asserted that and Spark disproved it): it still joins against
  *    whatever view state the batch-END eviction has not yet reclaimed —
  *    state cleanup runs after the batch that advances the watermark, so
  *    a same-trigger arrival sees the previous batch's state — and emits
  *    with a PARTIAL count. The load-bearing invariant is one-sided:
  *    streamed counts never exceed batch, streamed keys never leave
  *    batch's key set.
  *
  * Fixture (watermark delay 10 min, join window 10 min, minutes from a
  * fixed hour; sentinel users advance the watermark without joining):
  *   batch 1: view(u1,0), view(u1,8), purchase(u1,9); sentinels at 60
  *            → watermark 50 after the batch;
  *   batch 2: view(u1,51), purchase(u1,52) — on time; sentinels at 100
  *            → watermark 90, view-side allowance floor 80;
  *   batch 3: view(u1,45) — BELOW the allowance (45 < 80), dropped —
  *            and purchase(u1,55) — below the watermark (55 < 90),
  *            emitted with the partial count of surviving state;
  *   batch 4: sentinels at 200 flush the aggregation state.
  */
class IntervalJoinBoundarySpec extends SparkSpec {

  private val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def rows(spark: org.apache.spark.sql.SparkSession,
                   es: Seq[(Long, Long, String, Long)]): DataFrame = {
    import spark.implicits._
    es.map { case (eid, uid, tpe, min) =>
      (eid, uid, tpe, new java.sql.Timestamp(h0 + min * 60000L))
    }.toDF("event_id", "user_id", "event_type", "ts")
  }

  private val batch1 = Seq(
    (1L, 1L, "view", 0L), (2L, 1L, "view", 8L), (3L, 1L, "purchase", 9L),
    (4L, 99L, "view", 60L), (5L, 99L, "purchase", 60L))
  private val batch2 = Seq(
    (8L, 1L, "view", 51L), (9L, 1L, "purchase", 52L),
    (14L, 97L, "view", 100L), (15L, 97L, "purchase", 100L))
  private val batch3 = Seq(
    (6L, 1L, "view", 45L),      // 45 < 90 - 10: beyond the view allowance
    (12L, 1L, "purchase", 55L)) // 55 < 90: beyond the purchase allowance
  private val batch4 = Seq(
    (10L, 98L, "view", 200L), (11L, 98L, "purchase", 200L))

  private def allBatches = Seq(batch1, batch2, batch3, batch4)

  private def runStream(stage: String, name: String): Map[Long, Long] = {
    def side(tpe: String) = spark.readStream
      .schema(rows(spark, batch1).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .filter(col("event_type") === tpe)
      .withWatermark("ts", "10 minutes")
    val q = Streams.viewsBeforePurchases(side("view"), side("purchase"),
        minutes = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName(s"ivjb_$name")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(240000)
    spark.table(s"ivjb_$name")
      .select("event_id", "n_prior_views").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def stageBatches(batches: Seq[Seq[(Long, Long, String, Long)]],
                           name: String): String = {
    val stage = Files.createTempDirectory(s"graft_ivjb_$name").toString
    batches.foreach { b =>
      rows(spark, b).coalesce(1).write.mode("append").parquet(stage)
      Thread.sleep(150) // file mtime = trigger order (the repo harness rule)
    }
    stage
  }

  private def runBatch(): Map[Long, Long] = {
    val all = rows(spark, allBatches.flatten)
    Streams.viewsBeforePurchases(
        all.filter(col("event_type") === "view"),
        all.filter(col("event_type") === "purchase"), minutes = 10)
      .select("event_id", "n_prior_views").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pinned divergence: beyond-allowance rows drop, the rest match batch") {
    val streamed = runStream(stageBatches(allBatches, "pinned"), "pinned")
    val batch = runBatch()

    // batch ground truth first, so a fixture drift fails loudly here:
    // p3@9 sees {0,8}; p9@52 sees {45,51}; p12@55 sees {45,51}
    assert(batch === Map(3L -> 2L, 9L -> 2L, 12L -> 2L))

    // on-time purchase with on-time views: EXACT
    assert(streamed.get(3L) === Some(2L),
      "on-time purchase must match batch exactly")
    // on-time purchase that batch credits with a beyond-allowance view:
    // undercounts by EXACTLY that view
    assert(streamed.get(9L) === Some(1L),
      "the beyond-allowance view (and only it) must be missing")
    // beyond-watermark purchase: emitted with a PARTIAL count — it joins
    // view@51, which the batch-end eviction has not reclaimed yet when
    // the same trigger delivers the purchase, but NOT the input-dropped
    // view@45
    assert(streamed.get(12L) === Some(1L),
      "a late purchase joins surviving state only - partial, not batch's 2")

    // the general contract over the whole output: never an overcount,
    // never a purchase batch doesn't have
    streamed.foreach { case (eid, n) =>
      assert(batch.contains(eid), s"purchase $eid not in batch output")
      assert(n <= batch(eid), s"purchase $eid overcounted: $n > ${batch(eid)}")
    }
  }

  test("late-but-within-allowance rows change nothing: streaming == batch") {
    // the SAME rows, with the boundary rows arriving only ONE batch late:
    // view@45 lands while the allowance floor is 50-10=40 (45 ≥ 40) and
    // the purchase@55 while the watermark is 50 (55 ≥ 50) — the range
    // condition obliges the join to absorb exactly this much lateness
    val oneLate = Seq(batch1, batch2 ++ batch3, batch4)
    val streamed = runStream(stageBatches(oneLate, "allow"), "allow")
    assert(streamed === runBatch(),
      "within-allowance lateness must reproduce batch exactly")
  }

  test("all rows on time across micro-batches: streaming == batch (order-robust)") {
    // same rows re-staged in EVENT-TIME order (no row is ever late):
    // splitting into micro-batches alone must not cause divergence
    val all = allBatches.flatten.sortBy(_._4)
    val stage = stageBatches(all.grouped(4).toSeq, "ontime")
    val streamed = runStream(stage, "ontime")
    assert(streamed === runBatch(),
      "event-time-ordered arrival must reproduce batch exactly")
  }
}
