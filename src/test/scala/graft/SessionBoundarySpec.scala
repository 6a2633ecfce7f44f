package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams
import graft.streaming.Streams.{Session, SessionEvent}

/** Adversarial closed-boundary property test for the streaming
  * sessionizer (Streams.sessionizeStream). The min/max merge makes
  * merging into the OPEN session batch-consistent; the residual
  * divergence window is a late event landing within gap of an
  * ALREADY-EMITTED session's end — reachable only when the silence that
  * closed the session was < 2×gap, because an accepted event must also
  * clear the watermark: the window is [wm, closed_end + gap), nonempty
  * exactly then. StreamingSpec's generators never targeted that window;
  * this spec drives events INTO it and pins the divergence bound:
  *
  *  - events are conserved (every accepted event in exactly one emitted
  *    session) and sessions stay disjoint and ordered per user;
  *  - a user whose emitted sessions all respect ≥gap separation matches
  *    batch sessionize EXACTLY (divergence is always visible in the
  *    output as a < gap separation — never silent);
  *  - every divergent neighbor pair has the newer session starting
  *    inside (prev_end, prev_end + gap): the documented window, nothing
  *    else diverges.
  */
class SessionBoundarySpec extends SparkSpec {
  import spark.implicits._

  private val GapMin = 20
  private val GapMs = GapMin * 60000L

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  /** Run `batches` (arrival-ordered event waves) through the streaming
    * sessionizer one file per trigger; returns all emitted sessions
    * (observed-silence closes + event-time-timeout flushes).
    */
  private def runStream(batches: Seq[Seq[SessionEvent]],
                        name: String, exact: Boolean = false): Seq[Session] = {
    val stage = Files.createTempDirectory(s"graft_sessb_$name").toString
    batches.foreach { b =>
      b.toDF().coalesce(1).write.mode("append").parquet(stage)
      Thread.sleep(150) // file mtime = trigger order (the repo harness rule)
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .as[SessionEvent]
    val sessions =
      if (exact) Streams.sessionizeStreamExact(stream, gapMinutes = GapMin)
      else Streams.sessionizeStream(stream, gapMinutes = GapMin)
    val q = sessions
      .writeStream.outputMode("append")
      .format("memory").queryName(s"sessb_$name")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(240000)
    spark.table(s"sessb_$name").as[Session].collect().toSeq
  }

  test("pinned divergence: a late event in (closed_end, closed_end+gap) joins the newer session") {
    // gap=20min. Batch 1 closes [00:00,00:15] on the observed 35-min
    // silence and opens [00:50]; watermark after it is 00:30. Batch 2's
    // late 00:30 clears the watermark and sits within gap of the emitted
    // session's end (15 < 20) but a FULL gap before the open session's
    // start (50 − 30 = 20) — batch fuses it into the CLOSED session and
    // keeps [00:50] separate. The stream, having already emitted
    // [00:00, 00:15], can neither extend it nor (batch-consistently)
    // merge backwards across a full gap: the event becomes its own
    // singleton session. Divergence stays VISIBLE as the < gap
    // separation between [..00:15] and [00:30..]. (A late event strictly
    // INSIDE gap of the open start — e.g. 00:35 here — still merges into
    // the newer session; the generated-arrivals test drives that form.)
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(min: Long) = ts(h0 + min * 60000L)
    val events = Seq(
      SessionEvent(1L, 1L, t(0)), SessionEvent(1L, 2L, t(15)),
      SessionEvent(1L, 3L, t(50)),
      SessionEvent(1L, 4L, t(30)), // the boundary event, one batch late
      SessionEvent(99L, 5L, t(600))) // sentinel: flushes user 1 via timeout
    val got = runStream(
      Seq(events.take(3), events.slice(3, 5)), "pinned")
      .filter(_.user_id == 1L).toSet
    assert(got === Set(
      Session(1L, t(0), t(15), 2L),
      Session(1L, t(30), t(30), 1L),
      Session(1L, t(50), t(50), 1L)),
      "stream: eager close; the full-gap-backward late event is its own session")
    val batch = Streams.sessionize(
        events.filter(_.user_id == 1L).toDF(), gapMinutes = GapMin)
      .select("session_start", "session_end", "n_events")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    assert(batch === Set((t(0), t(30), 3L), (t(50), t(50), 1L)),
      "batch: the same late event extends the first session instead")
    // the divergence is exactly the documented bound: the stream pair
    // ([..15], [30..]) is separated by 15 min < gap, with the newer start
    // inside (prev_end, prev_end + gap); [50,50] matches batch exactly —
    // and events are conserved (4 == 4)
    assert(got.toSeq.map(_.n_events).sum ===
      batch.toSeq.map(_._3).sum)
  }

  test("backward boundary: an event exactly gap BEFORE the open session splits like batch") {
    // gap=20min. Batch 1 opens [40,40] for user 1; the watermark after it
    // is exactly 40-20=20. Batch 2's event at 20 clears the watermark by
    // equality and sits exactly gap before the open session's start —
    // batch SPLITS here (diff >= gap starts a new session), so the stream
    // must too. The bare forward merge test (e.ts - session_end < gap,
    // diff negative) would fuse them into one [20,40] session — a SILENT
    // divergence: the merged output shows no < gap separation for the
    // bound invariant to catch.
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(min: Long) = ts(h0 + min * 60000L)
    val got = runStream(Seq(
        Seq(SessionEvent(1L, 1L, t(40))),
        Seq(SessionEvent(1L, 2L, t(20))),
        Seq(SessionEvent(99L, 3L, t(600)))), "backward")
      .filter(_.user_id == 1L).toSet
    assert(got === Set(
      Session(1L, t(20), t(20), 1L),
      Session(1L, t(40), t(40), 1L)),
      "exactly-gap backward event must be its own session, as in batch")
    val batch = Streams.sessionize(
        Seq(SessionEvent(1L, 1L, t(40)), SessionEvent(1L, 2L, t(20)))
          .toDF(), gapMinutes = GapMin)
      .select("session_start", "session_end", "n_events")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    assert(batch === Set((t(20), t(20), 1L), (t(40), t(40), 1L)))
  }

  test("backward chain: equal-ts and chained backward events merge like batch") {
    // gap=20min. Batch 1 opens [40,40] for users 1 and 2 (watermark 20).
    // Batch 2 delivers, per user, a backward CHAIN at the boundary:
    //  - user 1: two events both at exactly t=20 — the old per-event fold
    //    emitted two overlapping singleton [20,20] sessions (a
    //    disjointness violation); batch emits ONE [20,20] n=2 session.
    //  - user 2: t=20 then t=25 — the chain's tail is within gap of the
    //    open start, so batch fuses everything into [20,40] n=3; the old
    //    fold left a split ([20,20] + [25,40]).
    // The sweep-merge makes both match batch exactly.
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(min: Long) = ts(h0 + min * 60000L)
    val got = runStream(Seq(
        Seq(SessionEvent(1L, 1L, t(40)), SessionEvent(2L, 2L, t(40))),
        Seq(SessionEvent(1L, 3L, t(20)), SessionEvent(1L, 4L, t(20)),
          SessionEvent(2L, 5L, t(20)), SessionEvent(2L, 6L, t(25))),
        Seq(SessionEvent(99L, 7L, t(600)))), "backchain")
    assert(got.filter(_.user_id == 1L).toSet === Set(
      Session(1L, t(20), t(20), 2L),
      Session(1L, t(40), t(40), 1L)),
      "equal-ts backward pair must be ONE closed session, as in batch")
    assert(got.filter(_.user_id == 2L).toSet === Set(
      Session(2L, t(20), t(40), 3L)),
      "a backward chain reaching within gap of the open start fuses")
    Seq(1L, 2L).foreach { u =>
      val batch = Streams.sessionize(
          (if (u == 1L) Seq(SessionEvent(1L, 1L, t(40)),
            SessionEvent(1L, 3L, t(20)), SessionEvent(1L, 4L, t(20)))
          else Seq(SessionEvent(2L, 2L, t(40)),
            SessionEvent(2L, 5L, t(20)), SessionEvent(2L, 6L, t(25))))
            .toDF(), gapMinutes = GapMin)
        .select("session_start", "session_end", "n_events")
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      assert(got.filter(_.user_id == u)
        .map(s => (s.session_start, s.session_end, s.n_events)).toSet
        === batch, s"user $u must match batch exactly")
    }
  }

  /** One global arrival sequence (the watermark is global, so scenarios
    * must share it): 24 users × session bursts separated by silences
    * drawn from BOTH regimes — ≥ 2×gap (boundary window empty: user
    * must match batch) and [gap, 2×gap) with a targeted late event
    * inside (closed_end ∨ wm, closed_end + gap) landing batches later
    * (the divergence window). Arrival lateness is bounded < gap vs the
    * running global max, so every generated event clears the watermark
    * — the stream processes exactly the batch comparator's event set.
    * Returns (arrival batches incl. the flush sentinel, accepted events).
    * Shared by the default-mode bound test and the exact-parity test —
    * the SAME generator that produces divergent users in default mode
    * must produce exact batch equality in exact mode.
    */
  private def generatedArrivals(): (Seq[Seq[SessionEvent]], Vector[SessionEvent]) = {
    val rnd = new scala.util.Random(20260814L)
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val minute = 60000L
    final case class Arrival(seq: Long, e: SessionEvent)
    val arrivals = scala.collection.mutable.ArrayBuffer.empty[Arrival]
    var seq = 0L
    def emit(u: Long, tMs: Long): Unit = {
      arrivals += Arrival(seq, SessionEvent(u, seq, ts(tMs))); seq += 1
    }
    // per-user timelines on a shared clock, interleaved by construction:
    // user u's bursts start at staggered offsets so the global running
    // max (≈ the densest user's frontier) stays ahead of everyone
    var lateTargets = 0
    (1L to 24L).foreach { u =>
      var t = h0 + (u % 6) * 3 * minute
      val bursts = 2 + rnd.nextInt(3)
      (0 until bursts).foreach { b =>
        val n = 1 + rnd.nextInt(4)
        var burstEnd = t // the burst's LAST EVENT ts = the session's end
        (0 until n).foreach { _ =>
          emit(u, t); burstEnd = t
          t = burstEnd + 1 + rnd.nextInt(5 * minute.toInt).toLong
        }
        // silence regime: even users always ≥ 2×gap (clean by
        // construction: the boundary window [wm, end+gap) is empty),
        // odd users draw [gap, 2×gap) and get a boundary-window late
        // event after the next burst opens
        if (u % 2 == 0) t = burstEnd + (2 * GapMs) + rnd.nextInt(30 * minute.toInt)
        else {
          val silence = GapMs + rnd.nextInt(GapMs.toInt - minute.toInt)
          t = burstEnd + silence
          if (b < bursts - 1) {
            // open the next burst first, then schedule the late boundary
            // event: inside (burstEnd, burstEnd + gap) and ≥ the opener
            // − gap (so it would clear even a user-local watermark)
            emit(u, t) // next burst's opener — closes the previous session
            val lo = math.max(burstEnd + minute, t - GapMs + minute)
            val hi = burstEnd + GapMs - minute
            if (lo <= hi) {
              val span = hi - lo
              emit(u, lo + (if (span > 0)
                (rnd.nextDouble() * span).toLong else 0L))
              lateTargets += 1
            }
            t += 1 + rnd.nextInt(3 * minute.toInt).toLong
          }
        }
      }
    }
    assert(lateTargets >= 8, s"generator must target the window ($lateTargets)")
    // arrival order: by event ts globally, then pull each odd-user
    // boundary event LATER so it crosses a batch boundary after its
    // session closed — but never later than (its ts + gap) worth of
    // global progress, keeping it above the watermark
    val inOrder = arrivals.sortBy(_.e.ts.getTime).toVector
    val reordered = scala.collection.mutable.ArrayBuffer.empty[SessionEvent]
    val held = scala.collection.mutable.PriorityQueue.empty[(Long, SessionEvent)](
      Ordering.by[(Long, SessionEvent), Long](_._1).reverse)
    inOrder.foreach { a =>
      // release held events whose deadline (ts + gap − 2min of global
      // progress) has arrived — BEFORE appending, so lateness < gap
      while (held.nonEmpty && held.head._1 <= a.e.ts.getTime) {
        reordered += held.dequeue()._2
      }
      val isBoundary = a.e.user_id % 2 == 1 && {
        // a boundary event is one whose ts sits < gap after a ≥gap
        // silence of its user — identify by construction: it was emitted
        // AFTER its successor in arrival seq (emit order) — i.e. its seq
        // is greater but its ts smaller than the previous arrival of the
        // same user
        val prev = arrivals.filter(x => x.e.user_id == a.e.user_id &&
          x.seq < a.seq).map(_.e.ts.getTime)
        prev.nonEmpty && prev.max > a.e.ts.getTime
      }
      if (isBoundary) held.enqueue((a.e.ts.getTime + GapMs - 2 * minute, a.e))
      else reordered += a.e
    }
    while (held.nonEmpty) reordered += held.dequeue()._2
    // sentinel flushes every open session via event-time timeout
    val globalMax = arrivals.map(_.e.ts.getTime).max
    val all = reordered.toVector
    val batches = all.grouped(math.max(1, all.size / 10)).toSeq :+
      Seq(SessionEvent(0L, 999999L, ts(globalMax + 10 * GapMs)))

    // watermark-acceptance invariant of the generated ARRIVAL sequence:
    // every event clears (running max before its batch) − gap, so the
    // stream drops nothing and the batch comparator sees the same set
    var runMax = Long.MinValue
    batches.foreach { b =>
      val wm = if (runMax == Long.MinValue) Long.MinValue else runMax - GapMs
      b.foreach { e =>
        assert(e.ts.getTime >= wm,
          s"generator violated its own watermark bound for ${e.user_id}")
      }
      runMax = math.max(runMax, b.map(_.ts.getTime).max)
    }
    (batches, all)
  }

  test("generated arrivals: clean users == batch exactly; divergence only in the documented window") {
    val (batches, all) = generatedArrivals()
    val emitted = runStream(batches, "gen").filter(_.user_id > 0L)
    val byUser = emitted.groupBy(_.user_id)
    val eventsByUser = all.groupBy(_.user_id)
    assert(byUser.keySet === eventsByUser.keySet, "every user flushed")

    var cleanUsers = 0
    var divergentUsers = 0
    (1L to 24L).foreach { u =>
      val ss = byUser(u).sortBy(_.session_start.getTime)
      val evs = eventsByUser(u).map(_.ts.getTime).sorted
      // conservation: every accepted event in exactly one session
      assert(ss.map(_.n_events).sum === evs.size.toLong, s"user $u lost events")
      // disjoint + ordered + interval-consistent
      ss.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.session_start.getTime >= a.session_end.getTime,
            s"user $u: overlapping sessions")
        case _ => ()
      }
      ss.foreach { s =>
        assert(evs.count(t => t >= s.session_start.getTime &&
          t <= s.session_end.getTime) === s.n_events.toInt,
          s"user $u: interval/count mismatch")
      }
      val violations = ss.sliding(2).collect {
        case Seq(a, b)
          if b.session_start.getTime - a.session_end.getTime < GapMs => (a, b)
      }.toSeq
      val batchSess = Streams.sessionize(
          eventsByUser(u).toDF(), gapMinutes = GapMin)
        .select("session_start", "session_end", "n_events")
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
        .map(r => (r._1.getTime, r._2.getTime, r._3)).sortBy(_._1).toSeq
      val streamSess = ss.map(s =>
        (s.session_start.getTime, s.session_end.getTime, s.n_events))
      if (violations.isEmpty) {
        cleanUsers += 1
        assert(streamSess === batchSess,
          s"user $u: gap-respecting sessions must equal batch sessionize")
      } else {
        divergentUsers += 1
        // the divergence bound: every violating neighbor starts inside
        // (prev_end, prev_end + gap) — the documented window, only there
        violations.foreach { case (a, b) =>
          assert(b.session_start.getTime > a.session_end.getTime &&
            b.session_start.getTime < a.session_end.getTime + GapMs,
            s"user $u: divergence outside the documented window")
        }
      }
    }
    // the run must exercise BOTH regimes or the property proves nothing
    assert(cleanUsers >= 8, s"want ≥8 clean users, got $cleanUsers")
    assert(divergentUsers >= 3,
      s"want ≥3 users driven into the boundary window, got $divergentUsers")
  }

  test("exact-parity mode: the pinned divergence case matches batch") {
    // the SAME scenario the first test pins as divergent in default mode:
    // holding emission until wm passes session_end + gap lets the late
    // 00:30 event fuse into the still-held [00:00, 00:15] session, so the
    // output is batch sessionize exactly — at one extra gap of latency
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(min: Long) = ts(h0 + min * 60000L)
    val events = Seq(
      SessionEvent(1L, 1L, t(0)), SessionEvent(1L, 2L, t(15)),
      SessionEvent(1L, 3L, t(50)),
      SessionEvent(1L, 4L, t(30)),
      SessionEvent(99L, 5L, t(600)))
    val got = runStream(
      Seq(events.take(3), events.slice(3, 5)), "pinned_exact", exact = true)
      .filter(_.user_id == 1L).toSet
    assert(got === Set(
      Session(1L, t(0), t(30), 3L),
      Session(1L, t(50), t(50), 1L)),
      "exact mode must fuse the late boundary event like batch")
  }

  test("sessionizer state survives a checkpointed restart, both modes") {
    // the one streaming leg the equivalence tests never exercised: a
    // query RESTART recovering per-user state from the checkpoint's
    // state store — the open-session tail in default mode, the
    // HeldSessions list (plural — two sessions held) in exact mode. The
    // post-restart batch must fuse into the RECOVERED state, not restart
    // sessions from scratch.
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(min: Long) = ts(h0 + min * 60000L)
    Seq(("default", false), ("exact", true)).foreach { case (label, exact) =>
      val stage = Files.createTempDirectory(s"graft_sessrst_src_$label").toString
      val out = Files.createTempDirectory(s"graft_sessrst_out_$label").toString
      val cp = Files.createTempDirectory(s"graft_sessrst_cp_$label").toString
      def addBatch(b: Seq[SessionEvent]): Unit = {
        b.toDF().coalesce(1).write.mode("append").parquet(stage)
        Thread.sleep(150)
      }
      def runOnce(): Unit = {
        val stream = spark.readStream
          .schema(spark.read.parquet(stage).schema)
          .option("maxFilesPerTrigger", 1).parquet(stage).as[SessionEvent]
        val sessions =
          if (exact) Streams.sessionizeStreamExact(stream, gapMinutes = GapMin)
          else Streams.sessionizeStream(stream, gapMinutes = GapMin)
        val q = sessions.writeStream.outputMode("append")
          .format("parquet").option("path", out)
          .option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(240000)
      }
      addBatch(Seq(SessionEvent(1L, 1L, t(0)), SessionEvent(1L, 2L, t(5))))
      addBatch(Seq(SessionEvent(1L, 3L, t(40))))
      runOnce() // stops with user 1's tail (default) / both sessions (exact) in state
      addBatch(Seq(SessionEvent(1L, 4L, t(45)), SessionEvent(99L, 5L, t(600))))
      runOnce() // restart: 45 must fuse into the RECOVERED [40,40]
      val got = spark.read.parquet(out).as[Session].collect()
        .filter(_.user_id == 1L).toSet
      assert(got === Set(
        Session(1L, t(0), t(5), 2L),
        Session(1L, t(40), t(45), 2L)),
        s"$label mode diverged after a checkpointed restart")
    }
  }

  test("exact-parity mode: generated arrivals == batch for EVERY user") {
    // same adversarial generator that drives ≥3 users into the
    // divergence window in default mode — exact mode must equal batch
    // sessionize for all 24, divergent regime included
    val (batches, all) = generatedArrivals()
    val emitted = runStream(batches, "gen_exact", exact = true)
      .filter(_.user_id > 0L)
    val byUser = emitted.groupBy(_.user_id)
    val eventsByUser = all.groupBy(_.user_id)
    assert(byUser.keySet === eventsByUser.keySet, "every user flushed")
    (1L to 24L).foreach { u =>
      val streamSess = byUser(u).sortBy(_.session_start.getTime).map(s =>
        (s.session_start.getTime, s.session_end.getTime, s.n_events))
      val batchSess = Streams.sessionize(
          eventsByUser(u).toDF(), gapMinutes = GapMin)
        .select("session_start", "session_end", "n_events")
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
        .map(r => (r._1.getTime, r._2.getTime, r._3)).sortBy(_._1).toSeq
      assert(streamSess === batchSess,
        s"user $u: exact mode must equal batch sessionize")
    }
  }
}
