package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Dedup

/** The PRODUCTION ingestion loop, composed end-to-end: every arriving
  * document batch runs quality gate → exact-novelty probe against the
  * persisted corpus → near-dup probe against the corpus's simhash index,
  * and only the survivors append to the store. This is the INCREMENTAL
  * counterpart of the d24 batch pipeline — the steady-state shape of a
  * training-data lake, where re-running corpus-wide dedup per arrival is
  * the anti-pattern the probes exist to avoid.
  *
  * Scale shape per batch: the quality gate is a row-local predicate; the
  * exact probe is an anti-join against a 1-row-per-hash projection
  * (broadcast when the batch ≪ store — or a Bloom sketch first,
  * [[graft.operators.Bloom]], when even the hash projection is big); the
  * near-dup probe is the pigeonhole chunk equi-join of
  * [[Dedup.simhashPairsBetween]] — batch-sized work against the bucketed
  * index, NEVER a corpus self-join. The store carries (content_hash,
  * simhash) only — fingerprints, not text.
  *
  * Batch == stream by construction: st09 gates the ordered batch fold
  * ([[ingestFold]]) against the DuckDB oracle; StreamingSpec drives
  * [[ingestBatch]] from a `Trigger.AvailableNow` foreachBatch over the
  * same arrivals and proves the final store is identical.
  *
  * Semantics (mirrored exactly by the oracle): within a batch, exact
  * duplicates collapse first-wins by doc_id; near-dup novelty is judged
  * against the STORE only (in-batch near-dups both land — a periodic d24
  * sweep owns intra-corpus clustering, reference: Lee et al. 2022 run
  * dedup as a batch stage for the same reason).
  */
object Ingest {

  /** d07's content-hash split (80/10/10 cuts) + d19's reshuffle-proof
    * shard, as one row-local projection over (doc_id, text) — the single
    * definition of the training-loader coordinates, shared by the d25
    * batch prep, the st10 loader-ready ingest, and the StreamingSpec
    * equivalence test so the cuts and shard count stay in lockstep.
    */
  def loaderCoords(df: DataFrame): DataFrame =
    df.withColumn("bucket", TextFns.hash28(col("text")) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .withColumn("shard", TextFns.hash28(col("doc_id").cast("string")) % 8)

  /** Store schema: (doc_id, batch, content_hash, simhash). */
  def emptyStore(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType), StructField("batch", LongType),
        StructField("content_hash", StringType),
        StructField("simhash", LongType))))
  }

  /** One batch through the gauntlet; returns the ACCEPTED rows in store
    * shape (caller appends them to the store).
    */
  def ingestBatch(store: DataFrame, batch: DataFrame, batchId: Long,
                  minTokens: Int = 20, maxHamming: Int = 4): DataFrame = {
    val gated = batch
      .filter(size(TextFns.words(col("text"))) >= minTokens)
      .select(col("doc_id"), col("text"), md5(col("text")).as("content_hash"))
    // in-batch exact collapse: first-wins by doc_id per content hash
    val w = Window.partitionBy("content_hash").orderBy("doc_id")
    val firstWins = gated.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val exactNovel = firstWins.join(
      store.select("content_hash").distinct(), Seq("content_hash"),
      "left_anti")
    val sigs = Dedup.simhash(exactNovel, "doc_id", "text")
    // the index side carries only rows with a REAL signature: a
    // signature-less doc (null simhash, see below) must not sit in the
    // index, where its absent bits would read as a valid all-zeros
    // signature and falsely reject any later low-popcount arrival
    val nearDupIds = Dedup.simhashPairsBetween(sigs,
        store.select("doc_id", "simhash").filter(col("simhash").isNotNull),
        "doc_id", maxHamming)
      .select(col("a_id").as("doc_id")).distinct()
    // LEFT join: a doc that passed the gate but has no tokens (reachable
    // at minTokens = 0 — simhash's tokenizer emits nothing for it, so it
    // has no signature row) is still an arrival; it lands with a NULL
    // signature instead of vanishing through an inner join. NULL, not a
    // 0L sentinel: 0 is a legal signature value, and a sentinel in the
    // store is indistinguishable from the real thing.
    exactNovel.join(sigs, Seq("doc_id"), "left")
      .join(nearDupIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(batchId).as("batch"), col("content_hash"),
        col("simhash"))
  }

  /** DURABLE wave commit — the `foreachBatch` body of the production
    * ingest: read the COMMITTED fingerprint store, run the wave through
    * [[ingestBatch]], and land the accepted rows as one atomic append
    * ([[graft.sources.AtomicStore.commitAppend]] — data files first,
    * manifest published by atomic rename).
    *
    * Crash/replay contract (what checkpointed streaming requires of its
    * sink): a crash BEFORE the manifest publishes leaves the store at the
    * previous committed version — the half-written batch is invisible —
    * and the checkpoint replays the wave. Replay is IDEMPOTENT by
    * construction, no transaction log of batch ids needed: every doc the
    * crashed attempt did commit is in the store, so the exact-novelty
    * content-hash probe rejects it on the retry; a doc it didn't commit
    * is genuinely novel and lands. StreamingSpec kills a query mid-wave
    * (data landed, manifest not) and proves the restarted stream
    * converges to the batch fold.
    *
    * The accepted set DERIVES from a read of the store (the novelty
    * probes), so the commit is compare-and-swap, not a blind append
    * (the Delta conflict rule, [[AtomicStore.commitSnapshotIfUnchanged]]
    * doc): when another writer — a backfill job racing the live stream,
    * or two streams sharing one store — commits between our read and
    * our publish, the probes ran against a stale base and a doc the
    * winner just committed would land a SECOND time, silently breaking
    * the store's one-row-per-fingerprint invariant every later probe
    * relies on. On conflict the wave recomputes against the new state
    * and retries; IngestRaceSpec races two writers over the same docs.
    *
    * Steady-state maintenance is WIRED IN, not left to an operator who
    * remembers to run it: every append commit leaves one more manifest
    * line + one more small batch dir, so a long-lived stream's probe
    * joins would pay a file-listing/open cost linear in wave count.
    * Once the committed manifest lists more than `compactAboveDirs`
    * data dirs, the wave folds the store back to one snapshot
    * ([[graft.sources.AtomicStore.compact]]) before returning.
    * Best-effort by design: the fold is CAS'd (a racing appender winning
    * the version makes it give up, never lose rows) and a fold failure
    * is swallowed — correctness never depends on compaction, only
    * steady-state probe cost does. Amortized fold cost per wave is
    * O(store/compactAboveDirs); raise the threshold if the fold's
    * full-store rewrite dominates a latency-sensitive stream.
    */
  def ingestBatchCommit(spark: SparkSession, storePath: String,
                        batch: DataFrame, batchId: Long,
                        minTokens: Int = 20, maxHamming: Int = 4,
                        maxAttempts: Int = 16,
                        compactAboveDirs: Int = 64): Long = {
    import graft.sources.AtomicStore
    var committed: Option[Long] = None
    var attempt = 0
    while (committed.isEmpty) {
      // BOUNDED retry: each lost race re-runs the full novelty-probe join,
      // so a co-writer committing continuously (or a conflict-detection
      // bug) would otherwise livelock the stream silently. Past the cap
      // the wave fails LOUDLY — checkpointed streaming replays it, and
      // replay is idempotent (the probes reject already-landed docs).
      attempt += 1
      if (attempt > maxAttempts)
        throw new IllegalStateException(
          s"ingestBatchCommit: lost the append CAS $maxAttempts times in a " +
            s"row at $storePath — a co-writer is committing continuously " +
            "(or conflict detection is broken); failing the wave for replay")
      if (attempt > 1) // linear backoff so racing writers interleave
        Thread.sleep(50L * (attempt - 1))
      val base = AtomicStore.currentVersion(spark, storePath)
      val store =
        if (base.isDefined) AtomicStore.read(spark, storePath)
        else emptyStore(spark)
      committed = AtomicStore.commitAppendIfUnchanged(
        ingestBatch(store, batch, batchId, minTokens, maxHamming),
        storePath, base)
    }
    AtomicStore.compactIfAbove(spark, storePath, committed.get,
      compactAboveDirs)
    committed.get
  }

  /** Ordered batch fold (the oracle-gated form): documents arrive in
    * `nBatches` waves keyed by `batchOf`; each wave ingests against the
    * store state the previous waves produced. The store is eagerly
    * localCheckpoint'd per wave — the same lineage-truncation rule as the
    * CC loop (each wave references the prior store twice).
    */
  def ingestFold(spark: SparkSession, docs: DataFrame,
                 batchOf: org.apache.spark.sql.Column, nBatches: Int,
                 minTokens: Int = 20, maxHamming: Int = 4): DataFrame = {
    var store = emptyStore(spark)
    (0 until nBatches).foreach { b =>
      val wave = docs.filter(batchOf === b)
      store = store
        .unionByName(ingestBatch(store, wave, b, minTokens, maxHamming))
        .localCheckpoint()
    }
    store
  }
}
