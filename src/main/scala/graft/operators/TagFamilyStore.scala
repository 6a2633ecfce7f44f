package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.TagConfig
import graft.sources.{AtomicStore, StoreCut}

/** The CONSISTENT-CUT form of the tag-engine write family — tags,
  * history and (optionally) reports for one job published under ONE
  * store-level manifest ([[StoreCut]]), the same shape that closed the
  * index stores' torn-swap class in round 17.
  *
  * What it fixes: `TagEngine.runJob` + the standalone ACID sinks commit
  * the job's history append ([[Sinks.writeHistoryAtomic]]) and its tag
  * merge ([[TagStore.mergeCommit]]/[[TagStore.appendMergeCommit]]) as
  * SEPARATE AtomicStore commits — each internally atomic, but a crash
  * between them leaves history recording a write that never landed in
  * the tag store (or vice versa). The reference is equally non-atomic
  * there (the catalog RPC then the BQ history insert,
  * DataCatalogController.py:1608–1652 → BigQueryUtils.py:391–440 — a
  * crashed task simply leaves the pair torn), so this store is
  * beyond-parity hardening: the engine's own bar after round 17.
  *
  * Layout under a family root:
  * {{{
  *   <root>/tags       # TagStore delta-log batches (__op/__batch rows)
  *   <root>/history    # day-partitioned history appends
  *   <root>/reports    # export appends (only when jobs pass reports)
  *   <root>/manifest   # the StoreCut — ONE cut pins all parts per job
  *   <root>/_job_lease # single-writer job commits
  * }}}
  *
  * Protocol per job ([[commitJob]], under the job lease): commit the tag
  * delta batch, commit the history batch, commit the report batch, then
  * publish ONE cut pinning all of them. Readers ([[readTags]]/
  * [[readHistory]]/[[readReports]]) resolve every part through the cut,
  * so a crash at ANY inter-commit point leaves the previous cut fully
  * serving — none of the crashed job's commits visible in ANY table.
  *
  * Recovery is TRUNCATION, not adoption — the one place this store must
  * differ from the index stores' append semantics: an index append is a
  * self-contained batch ("delayed, not lost" — the next fold adopts it),
  * but a tag-family batch is HALF A JOB. Adopting a crashed job's
  * history batch without its tag merge is exactly the phantom-history
  * state the cut exists to kill. So every commit here resolves its
  * parent file set from the CUT PIN, never from the table's current
  * version: a crashed predecessor's orphan suffix is simply not listed
  * by the next job's manifest (its dirs age out under vacuum), and the
  * re-run of a crashed job lands its rows exactly once. For the same
  * reason the maintenance folds ([[compact]]) materialize from the pin,
  * not from current — never through [[StoreCut.foldAndAdvance]], whose
  * adopt-the-chain contract is right for index stores and wrong here.
  *
  * Scale notes (the 100 TB write family): tags take the delta-log form —
  * bytes per job scale with the BATCH (upserts + tombstones), never the
  * tag lake ([[TagStore.appendMergeCommit]]'s contract) — history and
  * reports are plain appends, and the cut publish is one metadata file
  * (one LIST + one create + one atomic claim). The job lease serializes
  * only the COMMIT section (metadata ops + batch-sized writes), not
  * evaluation; config evaluation runs before the lease in
  * [[commitJob]]'s callers and the whole-tick batch path stays on
  * `TagEngine.runJobs`.
  */
object TagFamilyStore {

  val TagsPart = "tags"
  val HistoryPart = "history"
  val ReportsPart = "reports"

  /** Cut-pin keys an idempotency pin must not shadow: the three part
    * names plus the manifest dir itself.
    */
  private val ReservedPinKeys =
    Set(TagsPart, HistoryPart, ReportsPart, "manifest")

  private def leasePath(root: String) = s"$root/_job_lease"

  /** TEST-ONLY crash seam, the family sibling of
    * `AnnIndexStore.testMidSwapHook`: invoked with the stage name after
    * each table commit inside [[commitJob]] ("tags", "history",
    * "reports") and at the tick path's inter-commit points
    * ("tags@`i`" / "job@`i`" per config index — [[commitTick]]), before
    * the single cut publish. SCOPED PER STORE ROOT (round-18 advice): a
    * JVM-global hook set by one oracle query would crash unrelated
    * family commits if the driver ever ran queries concurrently — here a
    * hook only ever fires for the root that installed it. Production
    * never sets one.
    */
  private val testHooks =
    new java.util.concurrent.ConcurrentHashMap[String, String => Unit]()

  private[graft] def setTestMidJobHook(root: String,
                                       h: String => Unit): Unit =
    testHooks.put(root, h)

  private[graft] def clearTestMidJobHook(root: String): Unit =
    testHooks.remove(root)

  private def fireHook(root: String, stage: String): Unit =
    Option(testHooks.get(root)).foreach(_(stage))

  private def withJobLease[T](spark: SparkSession, root: String,
                              ttlMs: Long)(body: => T): T = {
    val lease = AtomicStore.claimLease(spark, leasePath(root), ttlMs,
      "TagFamilyStore job commit (exclusive multi-table publish)")
    try body
    finally AtomicStore.releaseLease(spark, lease)
  }

  // ------------------------------------------------------------ writes

  /** Atomically commit one job's write family: the tag MERGE change set
    * (`incoming` in the unified tag-row shape — upserts plus the
    * delete-when-all-empty trigger, exactly [[TagStore.mergeDelta]]'s
    * encoding), its history rows (must carry `event_time`; the
    * `event_date` day column is derived here, same rule as the
    * standalone sinks) and optionally its report rows (must carry
    * `export_time`). All parts land as separate table commits and become
    * visible together via ONE cut publish — or not at all.
    *
    * `incoming` is consumed more than once (the delta build and the
    * tombstone split) — callers producing it from an expensive
    * evaluation should localCheckpoint first ([[runJob]] does).
    */
  def commitJob(spark: SparkSession, root: String, incoming: DataFrame,
                history: DataFrame, reports: Option[DataFrame] = None,
                leaseTtlMs: Long = AtomicStore.DefaultLeaseTtlMs,
                compactAboveBatches: Int = 64): Map[String, Long] =
    withJobLease(spark, root, leaseTtlMs) {
      commitJobLocked(spark, root, incoming, history, reports,
        compactAboveBatches)
    }

  private def commitJobLocked(spark: SparkSession, root: String,
                              incoming: DataFrame, history: DataFrame,
                              reports: Option[DataFrame],
                              compactAboveBatches: Int): Map[String, Long] =
    commitTickLocked(spark, root,
      Seq(JobBatch("job", incoming, history, reports)), compactAboveBatches)

  /** One job's write family in batch form — the unit [[commitTick]]
    * chains: the tag MERGE change set (`incoming`,
    * [[TagStore.mergeDelta]]'s encoding), the history rows
    * (`event_time`-bearing) and optional report rows (`export_time`).
    * `jobId` labels crash-spec hooks and errors only; history identity
    * stays in the rows (`job_uuid`).
    */
  final case class JobBatch(jobId: String, incoming: DataFrame,
                            history: DataFrame,
                            reports: Option[DataFrame] = None)

  /** ATOMIC WHOLE-TICK commit — the scheduler-tick grain of
    * [[commitJob]] (round-18 verdict #1): N due configs' evaluated
    * batches land as chained per-config table commits and become
    * visible via ONE cut publish, or not at all. A crash at ANY
    * inter-commit point — including BETWEEN configs, the tear
    * [[graft.streaming.Streams.schedulerTick]]'s reference analogue
    * (`/scheduled_auto_updates` launching N tasks, main.py:3075–3110)
    * simply lives with — leaves the pre-tick cut serving in every
    * table: configs that already committed inside the crashed tick are
    * orphan suffixes the re-run truncates, so the re-run lands every
    * config exactly once.
    *
    * Chaining, not merging: config `i`'s batch manifests list the cut
    * pin's files plus configs `0..i`'s batches, so per-config batch
    * identity (history attribution, latest-wins order — a later config
    * in the tick wins conflicts, the deterministic rendering of
    * `TagEngine.runJobs`' intra-tick semantics) is preserved while the
    * tick's visibility stays all-or-nothing. Scale: the tick publish is
    * ONE metadata file regardless of N; per-config cost is the same
    * 2–3 batch commits a lone [[commitJob]] pays; the final cut CAS is
    * the only coordination point.
    *
    * Returns the final per-part versions plus the published cut
    * (`"manifest"`). Crash hooks fire as `"<part>"` and `"<part>@<i>"`
    * after each table commit and `"job@<i>"` after each config's full
    * batch set (the inter-config points).
    */
  def commitTick(spark: SparkSession, root: String, jobs: Seq[JobBatch],
                 leaseTtlMs: Long = AtomicStore.DefaultLeaseTtlMs,
                 compactAboveBatches: Int = 64): Map[String, Long] =
    if (jobs.isEmpty) Map.empty
    else withJobLease(spark, root, leaseTtlMs) {
      commitTickLocked(spark, root, jobs, compactAboveBatches)
    }

  private def commitTickLocked(spark: SparkSession, root: String,
                               jobs: Seq[JobBatch],
                               compactAboveBatches: Int,
                               extraPins: Map[String, Long] = Map.empty)
      : Map[String, Long] = {
    // extra pins ride the SAME cut as the part versions, so a key
    // colliding with a part name (or the manifest dir) would max-merge a
    // bogus version into the cut and break strict pinned reads with a
    // vacuum-style failure far from the cause — reject it here, at the
    // one place every pin passes through (round-19 advice)
    extraPins.keys.foreach(k => require(!ReservedPinKeys(k),
      s"TagFamilyStore: idempotency-pin key '$k' collides with a family " +
        "part / manifest name — pick a key outside " +
        ReservedPinKeys.mkString("{", ", ", "}")))
    val baseCut = StoreCut.cutVersion(spark, root)
    val pins = baseCut.map(v => StoreCut.cutAt(spark, root, v))
      .getOrElse(Map.empty)
    checkOrphanBound(spark, root, pins)
    // running parent file lists per part: the cut pin's files, extended
    // by each committed batch of THIS tick — never the table's current
    // chain (the truncation rule: a crashed predecessor's suffix is not
    // a parent)
    var parents: Map[String, Seq[String]] =
      Seq(TagsPart, HistoryPart, ReportsPart).map { p =>
        p -> pins.get(p).toSeq
          .flatMap(pv => AtomicStore.filesAt(spark, s"$root/$p", pv))
          .map(x => new org.apache.hadoop.fs.Path(x).getName)
      }.toMap
    var versions = Map.empty[String, Long]
    // per-part commit counts of THIS attempt — on a crash anywhere below
    // they become the attempt's expected orphan contribution
    val attemptCommits = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    // ---- §2.6 overlap: pre-write every batch, publish strictly in order.
    // A data dir is INVISIBLE until its manifest publishes (writeData is
    // protocol step 1, visibility is step 2) — so the tick's batch writes,
    // the only data-sized Spark jobs in the commit section, are
    // independent of each other and of the publish order the crash specs
    // pin. The round-20 tick path ran them back-to-back: N configs × 2–3
    // parts of sequential write-job latency per tick. Here they fan out
    // concurrently at tick entry; the PUBLISHES — the visibility points
    // the hooks bracket — stay chained in exactly the old order.
    // Versions are PREDICTED from one entry-time resolve per part (under
    // the job lease this tick is the only publisher, so part p's j-th
    // commit lands at base(p)+1+j); the consume step verifies the
    // prediction before each publish and falls back to the in-line
    // commitChained write+publish on any mismatch — an out-of-protocol
    // writer degrades to the old path, never to a wrong __batch stamp.
    import scala.concurrent.{Await, Future, blocking}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    final case class Planned(part: String, predictedV: Long,
                             mk: Long => DataFrame, fut: Future[String]) {
      @volatile var consumed = false
    }
    val nextV = scala.collection.mutable.Map.empty[String, Long]
    def plan(part: String, mk: Long => DataFrame): Planned = {
      val v = nextV.getOrElse(part,
        AtomicStore.currentVersion(spark, s"$root/$part").getOrElse(-1L) + 1)
      nextV(part) = v + 1
      Planned(part, v, mk,
        Future(blocking(AtomicStore.writeData(mk(v), s"$root/$part"))))
    }
    val planned: Seq[Seq[Planned]] = jobs.map { job =>
      Seq(plan(TagsPart, v =>
          TagStore.mergeDelta(job.incoming).withColumn("__batch", lit(v))),
        plan(HistoryPart, _ => Sinks.withHistoryPartition(job.history))) ++
        job.reports.map(r =>
          plan(ReportsPart, _ => Sinks.withReportPartition(r)))
    }
    // a crashed/aborted tick must not leak background write jobs into
    // whatever runs next, nor leave known-unpublished dirs for vacuum:
    // await every unconsumed write and reclaim it before rethrowing —
    // the post-crash table state is then byte-identical to the old
    // sequential path's (published versions only)
    def reclaimUnconsumed(): Unit =
      planned.flatten.filterNot(_.consumed).foreach { p =>
        try AtomicStore.reclaimData(spark, s"$root/${p.part}",
          Await.result(p.fut, Duration.Inf))
        catch { case scala.util.control.NonFatal(_) => () }
      }
    try {
    jobs.zipWithIndex.foreach { case (job, i) =>
      planned(i).foreach { p =>
        val table = s"$root/${p.part}"
        val (v, rel) = {
          val pre =
            try Some(Await.result(p.fut, Duration.Inf))
            catch { case t: Throwable => p.consumed = true; throw t }
          p.consumed = true
          val actualNext =
            AtomicStore.currentVersion(spark, table).getOrElse(-1L) + 1
          if (actualNext == p.predictedV &&
              AtomicStore.publish(spark, table,
                parents(p.part) :+ pre.get, p.predictedV))
            (p.predictedV, pre.get)
          else {
            // prediction missed (out-of-protocol writer) — degrade to
            // the sequential write+publish path with its loud bound
            pre.foreach(AtomicStore.reclaimData(spark, table, _))
            commitChained(spark, root, p.part, parents(p.part), p.mk)
          }
        }
        parents += p.part -> (parents(p.part) :+ rel)
        versions += p.part -> v
        attemptCommits(p.part) += 1
        // hooks fire at the same post-publish points as always
        p.part match {
          case TagsPart =>
            fireHook(root, TagsPart); fireHook(root, s"$TagsPart@$i")
          case HistoryPart =>
            fireHook(root, HistoryPart); fireHook(root, s"$HistoryPart@$i")
          case _ => ()
        }
      }
      // the reports hook fires whether or not this job carries reports:
      // for a report-less job it is the "both tables committed, the cut
      // publish never reached" point — the widest tear window, and the
      // stage name the crash specs/gate already key on
      fireHook(root, ReportsPart); fireHook(root, s"$ReportsPart@$i")
      fireHook(root, s"job@$i")
    }
    } catch { case t: Throwable =>
      reclaimUnconsumed()
      // this attempt is now a crashed tick: its committed versions are
      // the orphan suffix the next commit will truncate — record them so
      // the entry-time bound check above can tell in-protocol residue
      // from a leak (an out-of-protocol writer, a chain parented on
      // current instead of the pin)
      attemptCommits.foreach { case (p, n) =>
        expectedOrphans.merge(s"$root/$p", n, (a, b) => a + b)
      }
      throw t
    }
    // THE atomicity point: one cut pinning every part's LAST committed
    // version — CAS'd against the cut version the whole tick's parents
    // derive from. Mandatory (not best-effort): before it, the tick
    // never happened; a failure here is a crashed tick whose re-run
    // truncates all of these commits and re-lands them. The CAS closes
    // the fenced-zombie hole the lease alone cannot: a holder stalled
    // past its TTL (GC pause, VM freeze) whose lease a successor
    // legally broke would otherwise blind-merge table versions whose
    // chains were parented on the PRE-successor pins — numerically
    // higher, so max-merge would adopt them and drop the successor's
    // published batches from the served cut. Losing the CAS instead
    // orphans this zombie's commits (the next tick truncates them) and
    // fails loudly with the re-run remedy.
    val cutV =
      try StoreCut.advanceIfBase(spark, root, versions ++ extraPins, baseCut)
        .getOrElse(throw new java.util.ConcurrentModificationException(
          s"TagFamilyStore: the cut at $root moved while this " +
            s"${if (jobs.sizeIs > 1) "tick" else "job"} was committing — " +
            "its lease was broken (holder stalled past the TTL?) and " +
            "another publisher advanced. These commits are orphaned (the " +
            "next commit truncates them); re-run"))
      catch { case t: Throwable =>
        // a failed/lost publish orphans the whole attempt — same
        // accounting as a crash inside the commit loop
        attemptCommits.foreach { case (p, n) =>
          expectedOrphans.merge(s"$root/$p", n, (a, b) => a + b)
        }
        throw t
      }
    // published: the pin now covers every version this attempt wrote AND
    // everything beneath; any crash residue beneath the new pin is no
    // longer a suffix, so the root's expectation resets — and the root
    // is now fully accounted in this process, arming the bound check
    Seq(TagsPart, HistoryPart, ReportsPart)
      .foreach(p => expectedOrphans.remove(s"$root/$p"))
    seenRoots.add(root)
    // post-publish maintenance, best-effort (the tick is committed AND
    // published — a maintenance hiccup must not fail it): fold any part
    // whose pinned chain outgrew the dir threshold, so a long-lived
    // store's read cost stays flat in JOB count instead of decaying one
    // manifest + one small batch dir per job (the appendMergeCommit
    // policy, family-cut flavored)
    if (compactAboveBatches > 0)
      try versions.foreach { case (part, v) =>
        if (AtomicStore.filesAt(spark, s"$root/$part", v)
            .lengthCompare(compactAboveBatches) > 0)
          foldPartLocked(spark, root, part)
      } catch { case scala.util.control.NonFatal(_) =>
        // a crashed fold may have published its fold version without
        // advancing the cut — one more in-protocol orphan per part
        Seq(TagsPart, HistoryPart, ReportsPart)
          .foreach(p => expectedOrphans.merge(s"$root/$p", 1L, (a, b) => a + b))
      }
    lastPublish.put(root, s"cut=v$cutV jobs=${jobs.size} " +
      versions.toSeq.sortBy(_._1)
        .map { case (p, v) => s"$p=v$v" }.mkString(" "))
    versions + ("manifest" -> cutV)
  }

  /** Commit `mk(v)` as a batch whose manifest lists exactly `parents`
    * plus this batch — the truncating append: a crashed predecessor's
    * committed-but-never-published suffix is deliberately NOT adopted
    * as a parent (see the object doc — a family batch is half a job,
    * and adopting half a job is the torn state). Publishes at the
    * table's next version so the CAS name is always free; under the
    * job lease nothing else publishes, so the bounded retry exists
    * only to fail loudly on a lease-bypassing writer.
    */
  private def commitChained(spark: SparkSession, root: String, part: String,
                            parents: Seq[String],
                            mk: Long => DataFrame): (Long, String) = {
    val table = s"$root/$part"
    var attempt = 0
    while (attempt < 8) {
      val v = AtomicStore.currentVersion(spark, table).getOrElse(-1L) + 1
      val rel = AtomicStore.writeData(mk(v), table)
      if (AtomicStore.publish(spark, table, parents :+ rel, v))
        return (v, rel)
      AtomicStore.reclaimData(spark, table, rel)
      attempt += 1
      Thread.sleep(20L * attempt)
    }
    throw new IllegalStateException(
      s"TagFamilyStore: lost 8 straight publishes at $table while holding " +
        "the job lease — another writer is committing to this table " +
        "outside the family protocol")
  }

  // ------------------------------------------------------------- reads

  /** Resolve one part at the CURRENT cut. No pin for the part means no
    * job ever published it — an existing table underneath is crash
    * residue, and falling back to its current version (readPinned's
    * legacy contract, right for pre-manifest index stores) would serve
    * exactly the orphans this store exists to hide. So: pinned read or
    * None, never current — which is also why the read is STRICT:
    * readPinned's non-strict arm handles an aged-out pin by reading
    * the table's current version, the one fallback this store must
    * never take (in-protocol it is unreachable anyway — the retention
    * floor keeps every retained cut's pins resolvable — so strictness
    * costs nothing and converts a protocol violation into a loud
    * error). A pin vacuumed between the cut read and the resolve (the
    * store moved on mid-read) retries once at the freshest cut; the
    * strict failure's cause chain carries the race, so the retry guard
    * sees it.
    */
  private def pinnedPart(spark: SparkSession, root: String,
                         part: String): Option[DataFrame] = {
    def attempt(pins: Map[String, Long]): Option[DataFrame] =
      pins.get(part).map(_ =>
        StoreCut.readPinned(spark, root, part, pins, strict = true))
    StoreCut.cut(spark, root).flatMap { pins =>
      try attempt(pins)
      catch { case e: Throwable if AtomicStore.isVacuumRace(e) =>
        attempt(StoreCut.cut(spark, root).getOrElse(Map.empty))
      }
    }
  }

  private def noCut(root: String, part: String): Nothing =
    throw new IllegalStateException(
      s"TagFamilyStore: no published cut pins '$part' at $root — no job " +
        "ever committed it (crash residue under the table, if any, is " +
        "deliberately unreadable)")

  /** The current tag state: latest-wins replay of the cut-pinned tag
    * log ([[TagStore.latestStateOf]] — exactly `applyWithDeletes` in
    * batch order).
    */
  def readTags(spark: SparkSession, root: String): DataFrame =
    pinnedPart(spark, root, TagsPart).map(TagStore.latestStateOf)
      .getOrElse(noCut(root, TagsPart))

  /** One job-consistent view of tags AND history. */
  final case class Family(tags: DataFrame, history: DataFrame)

  /** BOTH tables resolved through ONE cut — the read a consumer needs
    * when tags and history must agree about which jobs happened.
    * [[readTags]] + [[readHistory]] each resolve the CURRENT cut
    * independently, so a pair of calls racing a job commit can span two
    * cuts (tags pre-job, history post-job) — each table individually
    * consistent, the PAIR not (the concurrent-reader soak caught
    * exactly that). Here the cut resolves once, each part's file list
    * pins eagerly at construction, and the returned (lazy) frames stay
    * a consistent pair however late they are collected. Same strict +
    * one-retry discipline as [[pinnedPart]].
    */
  def readFamily(spark: SparkSession, root: String): Family = {
    def attempt(pins: Map[String, Long]): Family = {
      if (!pins.contains(TagsPart)) noCut(root, TagsPart)
      if (!pins.contains(HistoryPart)) noCut(root, HistoryPart)
      Family(
        TagStore.latestStateOf(
          StoreCut.readPinned(spark, root, TagsPart, pins, strict = true)),
        StoreCut.readPinned(spark, root, HistoryPart, pins, strict = true))
    }
    val pins = StoreCut.cut(spark, root)
      .getOrElse(noCut(root, TagsPart))
    try attempt(pins)
    catch { case e: Throwable if AtomicStore.isVacuumRace(e) =>
      attempt(StoreCut.cut(spark, root).getOrElse(Map.empty))
    }
  }

  /** [[readTags]], or an empty frame in `schemaLike`'s schema for a
    * store no job ever committed to (the fresh-store read every first
    * job's overwrite filter needs).
    */
  def readTagsOr(spark: SparkSession, root: String,
                 schemaLike: DataFrame): DataFrame =
    pinnedPart(spark, root, TagsPart).map(TagStore.latestStateOf)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaLike.schema))

  /** The cut-pinned history table (every committed job's rows, none of
    * any crashed job's).
    */
  def readHistory(spark: SparkSession, root: String): DataFrame =
    pinnedPart(spark, root, HistoryPart).getOrElse(noCut(root, HistoryPart))

  /** The cut-pinned report table, empty-on-absent like [[readTagsOr]]
    * (reports are optional per job, so "no job ever passed reports" is
    * an ordinary state, not an error).
    */
  def readReports(spark: SparkSession, root: String,
                  schemaLike: DataFrame): DataFrame =
    pinnedPart(spark, root, ReportsPart)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaLike.schema))

  // ------------------------------------------------------- time travel

  /** The current cut version — the [[readTagsAt]]/[[readHistoryAt]]
    * handle: capture it at a job boundary and re-read that boundary's
    * state bit-identically later (within the retention window —
    * [[compact]] keeps the last 8 cuts and floors every part's vacuum
    * at the oldest retained cut's pin, [[StoreCut.retentionFloor]]).
    */
  def currentCutVersion(spark: SparkSession, root: String): Option[Long] =
    StoreCut.cutVersion(spark, root)

  private def strictPartAt(spark: SparkSession, root: String, part: String,
                           cutVersion: Long): DataFrame = {
    val pins = StoreCut.cutAt(spark, root, cutVersion)
    if (!pins.contains(part))
      throw new IllegalStateException(
        s"TagFamilyStore: cut v$cutVersion at $root pins no '$part'")
    StoreCut.readPinned(spark, root, part, pins, strict = true)
  }

  /** TIME TRAVEL: the tag state exactly as cut `cutVersion` served it —
    * the audit/repro read history could only approximate by replay. An
    * aged-out pin fails loudly (strict), never silently serves newer
    * files under the pinned label.
    */
  def readTagsAt(spark: SparkSession, root: String,
                 cutVersion: Long): DataFrame =
    TagStore.latestStateOf(strictPartAt(spark, root, TagsPart, cutVersion))

  /** TIME TRAVEL: the history table as cut `cutVersion` pinned it. */
  def readHistoryAt(spark: SparkSession, root: String,
                    cutVersion: Long): DataFrame =
    strictPartAt(spark, root, HistoryPart, cutVersion)

  // -------------------------------------------------------- porcelain

  /** One family store's health at a glance — the exact-listing
    * porcelain the index stores grew in round 17, family-flavored:
    * the served cut, each part's pin vs its table's CURRENT version,
    * and the ORPHAN SUFFIX per part (committed versions above the pin
    * — in this store every in-protocol publish advances the cut, so a
    * non-zero suffix is precisely crash residue awaiting truncation by
    * the next job; bounded at one job's commits by the recovery
    * contract). `retainedCuts` lists the time-travel window actually
    * readable ([[readTagsAt]]'s handles).
    */
  final case class FamilyHealth(cutVersion: Option[Long],
                                pins: Map[String, Long],
                                currentVersions: Map[String, Long],
                                orphanSuffix: Map[String, Long],
                                retainedCuts: Seq[Long])

  /** Live health probe — metadata-only (one cut read + one version
    * LIST per part + the retained manifest listing; nothing
    * data-sized).
    */
  def porcelain(spark: SparkSession, root: String): FamilyHealth = {
    val cutV = StoreCut.cutVersion(spark, root)
    val pins = cutV.map(v => StoreCut.cutAt(spark, root, v))
      .getOrElse(Map.empty)
      .filter { case (k, _) => Set(TagsPart, HistoryPart, ReportsPart)(k) }
    val current = Seq(TagsPart, HistoryPart, ReportsPart).flatMap { p =>
      AtomicStore.currentVersion(spark, s"$root/$p").map(p -> _)
    }.toMap
    val orphans = current.map { case (p, cur) =>
      p -> math.max(0L, cur - pins.getOrElse(p, -1L))
    }.filter(_._2 > 0)
    val retained = cutV.toSeq.flatMap { latest =>
      (math.max(0L, latest - StoreCut.RetainedCuts + 1) to latest)
        .filter { v =>
          try { StoreCut.cutAt(spark, root, v); true }
          catch { case e: Throwable if AtomicStore.isVacuumRace(e) => false }
        }
    }
    FamilyHealth(cutV, pins, current, orphans, retained)
  }

  /** LAST-PUBLISH registry, the Verify-facing porcelain: every family
    * publish records a one-line summary per root (JVM-global, zero
    * extra IO — the versions are in hand at publish time), so a Verify
    * run's `storecut_health.json` can list which family stores this
    * process committed and where their cuts landed, without re-probing
    * stores whose temp dirs are already gone.
    */
  private val lastPublish =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def publishedFamilies: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    lastPublish.asScala.toMap
  }

  private[graft] def resetPublishRegistry(): Unit = lastPublish.clear()

  /** ORPHAN-SUFFIX accounting (round-19 verdict #7 — the porcelain's
    * "bounded by the recovery contract" claim turned into a checked
    * invariant): within one process, every version above the cut pin
    * must have been committed by an attempt that then crashed/lost its
    * publish in THIS process — [[commitTickLocked]] records each failed
    * attempt's per-part commit counts, clears them on a successful
    * publish (the new pin subsumes the residue), and at every commit's
    * entry compares the OBSERVED suffix (current table version − pin)
    * against that expectation. An over-bound suffix means the store's
    * truncation contract leaked — an out-of-protocol writer, or a chain
    * parented on current instead of the pin — and is recorded here
    * (plus one stderr line); Verify turns a non-empty registry into a
    * failed run. Recording, not throwing, at the store layer: the
    * serving cut is still correct (readers resolve through pins), so
    * the commit itself must not be held hostage by the diagnostic.
    */
  private val expectedOrphans =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private val suffixViolations =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // the expectation is only complete for roots THIS process has already
  // published to: a fresh process re-running a KILLED commit (the gate
  // tools' regime) legitimately finds residue it never recorded, so the
  // first commit at a root only arms the check for later ones
  private val seenRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def orphanSuffixViolations: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    suffixViolations.asScala.toMap
  }

  private[graft] def resetOrphanAccounting(): Unit = {
    expectedOrphans.clear(); suffixViolations.clear(); seenRoots.clear()
  }

  private def checkOrphanBound(spark: SparkSession, root: String,
                               pins: Map[String, Long]): Unit =
    try if (seenRoots.contains(root))
      Seq(TagsPart, HistoryPart, ReportsPart).foreach { p =>
      AtomicStore.currentVersion(spark, s"$root/$p").foreach { cur =>
        val observed = cur - pins.getOrElse(p, -1L)
        val allowed = Option(expectedOrphans.get(s"$root/$p"))
          .map(_.longValue).getOrElse(0L)
        if (observed > allowed) {
          val msg = s"observed=$observed allowed=$allowed (pin=" +
            s"${pins.get(p).map(_.toString).getOrElse("none")} current=$cur)"
          suffixViolations.put(s"$root/$p", msg)
          System.err.println(s"[tagfamily] ORPHAN-SUFFIX BOUND VIOLATION " +
            s"at $root/$p: $msg — versions above the pin exceed what " +
            "crashed attempts in this process committed; an " +
            "out-of-protocol writer or a truncation leak")
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () } // diagnostic only

  // ------------------------------------------------------ maintenance

  /** Fold one part's PINNED chain back to a single snapshot and adopt
    * the fold into the cut. Materializes from the PIN (see the object
    * doc: folding from current would adopt a crashed job's orphan
    * batches — the family inversion of the index stores' fold), reduces
    * tags to their latest-wins state (the log-semantics fold,
    * `TagStore.compactLog`'s analogue) and squashes history/reports
    * row-preserving. Publishes fold-marked at the table's next version,
    * advances the cut, and vacuums with the retained-cuts floor so
    * time-travel pins stay readable.
    */
  private def foldPartLocked(spark: SparkSession, root: String, part: String,
                             graceMs: Long = 15 * 60 * 1000L): Option[Long] =
    StoreCut.fold(spark, root, part,
      StoreCut.TruncateToPin((pinned, v) =>
        if (part == TagsPart)
          // the log-semantics fold (TagStore.compactLog's analogue):
          // squash the pinned chain to its latest-wins state, re-marked
          // as one upsert batch at the fold's version
          TagStore.latestStateOf(pinned)
            .withColumn("__op", lit("upsert")).withColumn("__batch", lit(v))
        else pinned), // history/reports squash row-preserving
      graceMs)

  /** Periodic maintenance (claims the job lease — folds must not race a
    * live job commit's version arithmetic): fold every published part,
    * then vacuum old cuts (the last 8 stay readable for time travel).
    */
  def compact(spark: SparkSession, root: String,
              graceMs: Long = 15 * 60 * 1000L,
              leaseTtlMs: Long = AtomicStore.DefaultLeaseTtlMs)
      : Map[String, Option[Long]] =
    withJobLease(spark, root, leaseTtlMs) {
      val folded = Seq(TagsPart, HistoryPart, ReportsPart)
        .map(p => p -> foldPartLocked(spark, root, p, graceMs)).toMap
      StoreCut.vacuumCuts(spark, root, graceMs = graceMs)
      folded
    }

  // ------------------------------------------------------ the full job

  /** `TagEngine.runJob` with the family-cut terminal: evaluate the
    * config over the catalog, apply the `overwrite=false` restriction
    * against the CUT-PINNED tag state, derive the history rows
    * (`TagEngine.historyRows` — the written instances only, the
    * reference's create/update rule) and commit tags + history as ONE
    * atomic family publish. Runs entirely under the job lease so the
    * overwrite filter's read and the commit see one serialization
    * point; evaluation cost under the lease is the incoming batch's
    * own evaluation, exactly the work the job must do anyway.
    */
  def runJob(spark: SparkSession, config: TagConfig, catalog: DataFrame,
             root: String,
             eventTime: Column = current_timestamp(),
             jobUuid: Column = lit(""),
             leaseTtlMs: Long = AtomicStore.DefaultLeaseTtlMs): Map[String, Long] =
    commitComputed(spark, root, config,
      TagEngine.applyDynamicTableConfig(spark, config, catalog),
      eventTime, jobUuid, leaseTtlMs)

  /** [[runJob]] for a PRE-EVALUATED tag-row set — the terminal the
    * event-driven re-tag stream needs (`Streams.retagCommitBatch`):
    * `computed` is the job's computed rows in the unified shape (lazy —
    * evaluation runs under the lease at the one materialization point);
    * the `overwrite=false` restriction, the history pivot and the
    * atomic family publish are exactly [[runJob]]'s.
    *
    * `idempotencyPin` makes a CHECKPOINT-REPLAYED commit exactly-once:
    * `Some(key -> n)` publishes `key=n` into the job's cut (max-merged,
    * so a monotonic micro-batch id fits the cut's contract), and a
    * later call whose cut already carries `key >= n` SKIPS the commit
    * entirely (returns Map.empty). The check runs under the job lease,
    * so a replayed `foreachBatch` wave after a crash-after-publish
    * cannot double its history rows — the family sibling of the ingest
    * path's content-hash replay idempotence, at O(1) metadata cost
    * (one cut read the commit pays anyway) instead of a history scan.
    */
  def commitComputed(spark: SparkSession, root: String, config: TagConfig,
                     computed: DataFrame,
                     eventTime: Column = current_timestamp(),
                     jobUuid: Column = lit(""),
                     leaseTtlMs: Long = AtomicStore.DefaultLeaseTtlMs,
                     idempotencyPin: Option[(String, Long)] = None)
      : Map[String, Long] =
    withJobLease(spark, root, leaseTtlMs) {
      val replayed = idempotencyPin.exists { case (k, n) =>
        StoreCut.cut(spark, root).exists(_.get(k).exists(_ >= n))
      }
      if (replayed) Map.empty
      else {
        val existing = readTagsOr(spark, root, TagEngine.emptyTagRows(spark))
        // one materialization: the incoming set feeds the delta build,
        // the tombstone split AND the history pivot — and history must
        // never record values that differ from the batch actually merged
        val incoming = TagEngine.incomingFor(config, computed, existing)
          .localCheckpoint()
        commitTickLocked(spark, root,
          Seq(evaluatedBatch("job", config, incoming, eventTime, jobUuid)),
          compactAboveBatches = 64, extraPins = idempotencyPin.toMap)
      }
    }

  /** One evaluated config's [[JobBatch]]: the history pivot over the
    * WRITTEN instances (create/update only — an all-empty instance fires
    * the delete trigger and must not leave a phantom history row) and,
    * when the config asks for export ([[graft.model.TagConfig.exportTags]]),
    * the A12 report rows for the same written set
    * ([[TagEngine.reportRowsFor]]) — so the report lands as the THIRD
    * part of the batch, under the same cut as the tags+history it
    * describes (round-19 verdict #1: previously only a hand-built
    * JobBatch could carry reports through the tick terminal, leaving the
    * evaluated scheduler paths' report export OUTSIDE the atomicity
    * domain). Shared by [[commitComputed]] and [[runTickDetailed]] so
    * the job and tick grains cannot diverge on what a batch contains.
    */
  private def evaluatedBatch(jobId: String, config: TagConfig,
                             incoming: DataFrame, eventTime: Column,
                             jobUuid: Column): JobBatch = {
    val written = TagStore.dropAllEmptyTags(incoming)
    JobBatch(jobId, incoming,
      TagEngine.historyRows(written, config, eventTime, jobUuid),
      reports =
        if (config.exportTags)
          Some(TagEngine.reportRowsFor(written, eventTime))
        else None)
  }

  /** The WHOLE scheduler tick with the family-cut terminal —
    * `TagEngine.runJobs`' evaluation (ONE catalog expansion for every
    * due config, each config's merge set derived against the SAME
    * pre-tick cut-pinned tag state: sibling jobs' writes invisible to
    * each other, `runJobs`' documented intra-tick isolation) committed
    * through [[commitTick]]'s one-cut-per-tick publish. A crash
    * anywhere — mid-config or between configs — leaves the pre-tick
    * state serving everywhere; the re-run lands every config exactly
    * once. Runs entirely under the job lease, so the overwrite
    * filters' read and the tick's commits see one serialization point;
    * evaluation cost under the lease is the due configs' own
    * evaluation, exactly the work the tick must do anyway.
    *
    * `jobUuidOf` names each config's job in its history rows (the
    * scheduler's convention is `md5(config_uuid|version)` — see
    * `Streams.schedulerTick`); the default labels by config uuid.
    */
  def runTick(spark: SparkSession, configs: Seq[(String, TagConfig)],
              catalog: DataFrame, root: String,
              eventTime: Column = current_timestamp(),
              jobUuidOf: String => Column = id => lit(id),
              leaseTtlMs: Long = AtomicStore.DefaultLeaseTtlMs,
              idempotencyPin: Option[(String, Long)] = None): Map[String, Long] =
    runTickDetailed(spark, configs, catalog, root, eventTime, jobUuidOf,
      leaseTtlMs, idempotencyPin)._1

  /** [[runTick]] returning the committed [[JobBatch]]es too — each
    * batch's `incoming` is localCheckpoint'd, so a caller can roll the
    * tick up (per-job counts over the PRODUCED rows, the
    * `Streams.schedulerTickCommit` contract) without re-evaluating
    * anything or mis-counting store rows the jobs never touched.
    *
    * `idempotencyPin` is [[commitComputed]]'s contract at the TICK
    * grain (round-19 advice): `Some(key -> n)` publishes `key=n` into
    * the tick's cut (max-merged — a monotonic tick id fits the cut
    * contract), and a later call whose cut already carries `key >= n`
    * SKIPS the whole commit (versions Map.empty) — so a replayed tick
    * (a `foreachBatch` wave re-fired from its checkpoint, or a re-run
    * after the caller LOST the config-store advance while the family
    * publish survived) cannot double every config's history under the
    * same `md5(uuid|version)` job_uuid. The check runs under the job
    * lease, at O(1) metadata cost. On a skip the batches are still
    * evaluated and returned (the caller's rollup/advance must re-emit
    * so the lost config-store merge can complete); with the window
    * being a crashed tick's immediate re-run, the re-evaluation sees
    * the same data — and `overwrite=true` configs (the scheduler-batch
    * shape) re-derive identical rows regardless of the already-landed
    * commit.
    */
  def runTickDetailed(spark: SparkSession, configs: Seq[(String, TagConfig)],
                      catalog: DataFrame, root: String,
                      eventTime: Column = current_timestamp(),
                      jobUuidOf: String => Column = id => lit(id),
                      leaseTtlMs: Long = AtomicStore.DefaultLeaseTtlMs,
                      idempotencyPin: Option[(String, Long)] = None)
      : (Map[String, Long], Seq[JobBatch]) =
    if (configs.isEmpty) (Map.empty, Seq.empty)
    else withJobLease(spark, root, leaseTtlMs) {
      val replayed = idempotencyPin.exists { case (k, n) =>
        StoreCut.cut(spark, root).exists(_.get(k).exists(_ >= n))
      }
      val existing = readTagsOr(spark, root, TagEngine.emptyTagRows(spark))
      // one materialization per config: the incoming set feeds the
      // delta build, the tombstone split, the history pivot AND the
      // report flatten — and history/reports must never record values
      // that differ from the batch actually merged. The N checkpoints
      // are independent READS of pre-tick state (intra-tick isolation),
      // so they run concurrently (optimization guide §2.6: overlap
      // independent jobs) — the tick's sequential section stays just
      // the chained per-part commits below, which the protocol demands.
      val ckpts = {
        import scala.concurrent.{Await, Future, blocking}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        Await.result(
          Future.sequence(
            TagEngine.perConfigIncoming(spark, configs, catalog, existing)
              .map { case (id, inc0) =>
                Future(blocking((id, inc0.localCheckpoint())))
              }),
          Duration.Inf)
      }
      val batches = ckpts.zip(configs).map { case ((id, inc), (_, cfg)) =>
        evaluatedBatch(id, cfg, inc, eventTime, jobUuidOf(id))
      }
      if (replayed) (Map.empty, batches)
      else (commitTickLocked(spark, root, batches, compactAboveBatches = 64,
        extraPins = idempotencyPin.toMap), batches)
    }
}
