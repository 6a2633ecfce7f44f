package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.AtomicStore

/** PERSISTED form of the document-signature index: the artifacts the
  * in-session memo (`graft.queries.DocIndex`) keeps as localCheckpoints —
  * simhash signatures and minhash signatures/band hashes — written as
  * [[AtomicStore]] tables under one root, the d-side sibling of
  * [[AnnIndexStore]]. A production near-dup service computes signatures
  * ONCE at ingest time and persists them; every later dedup query (batch
  * or incremental probe) joins against the signature TABLE instead of
  * re-running the corpus text pass. The shingle SETS are deliberately not
  * persisted: they are ~8× the text bytes (one long per character
  * position), while both signature tables are O(bytes per doc) — the
  * verify joins that need sets re-derive them for the CANDIDATE subset
  * only, which is the cheaper trade at lake scale.
  *
  * Each component is its own atomically-versioned table (readers never
  * see a half-written component; a crashed write leaves the previous
  * version readable). Signatures are pure per-row functions of the text,
  * so incremental ingest is [[appendSimhash]]/[[appendMinhash]]: the new
  * batch's signature rows land as an appended batch — commit bytes scale
  * with the BATCH, never the corpus (the same write-path contract as
  * `TagStore.appendMergeCommit`).
  */
object DocIndexStore {

  final case class Components(
      simhash: DataFrame,     // (doc_id, simhash)
      minhashSigs: DataFrame) // (doc_id, mh_0..mh_7, band_0, band_1)

  /** Write both components as atomic tables under `root`. Returns the
    * committed version per component. (No session parameter: the write
    * executes on the components' own session, like every commit.)
    *
    * `sigSpec` names the signature DEFINITION the rows were computed
    * with (shingle k, hash/band counts, simhash width — an opaque
    * caller-declared string; [[graft.queries.DocIndex.SigSpec]] is the
    * session producer's). Signatures are caller-computed, so this store
    * has the same seam [[AnnIndexStore.appendVectors]] guards on its
    * params table: a later ingest session computing signatures under a
    * DIFFERENT definition appends rows that merge silently and make
    * every banded join under-detect duplicates — silently-degraded
    * dedup, not an error. Declared on writes, checked on appends;
    * empty = unspecified (the pre-spec caller contract).
    */
  def write(root: String, c: Components,
            sigSpec: String = ""): Map[String, Long] = {
    val spark = c.simhash.sparkSession
    import spark.implicits._
    // COMMIT-ORDER INVARIANT: the spec DECLARATION commits FIRST, the
    // component tables after — the mirror image of AnnIndexStore's
    // params-LAST rule, because appends VALIDATE against the spec
    // rather than stamping from it. (Interruption residual, same family
    // as AnnIndexStore.refreshIndex's: a crash between the spec commit
    // and the component snapshots leaves a declaration describing rows
    // that never landed — re-run the write to completion; every commit
    // is an idempotent snapshot.) An append's guard is CAS'd against
    // the component-table version it read; components-first would open
    // a window where that version is already the rebuild's but the
    // declaration is still the old store's, so a stale-definition
    // append could pass the guard AND win its CAS. Spec-first closes
    // it: any append that sees a rebuilt component table sees the
    // rebuild's declaration too (seeing the new spec with the OLD
    // components is harmless — the rebuild's snapshot replaces whatever
    // lands on the old table).
    val spec: Map[String, Long] =
      if (sigSpec.nonEmpty)
        Map("spec" -> AtomicStore.commitSnapshot(
          Seq(sigSpec).toDF("sig_spec"), s"$root/spec"))
      else if (loadSpec(spark, root).isDefined)
        // an undeclared REBUILD of a store that declared a spec: the old
        // declaration must not keep standing — it describes signatures
        // the rebuild just replaced, and a later append declaring the
        // OLD spec would pass the guard while mixing incompatible
        // signatures. Overwrite with the unspecified sentinel (the
        // empty declaration); loadSpec maps it back to None — which is
        // also why the check is loadSpec, not a bare table-exists
        // probe: once the sentinel stands, later undeclared rebuilds
        // skip this commit instead of re-landing it forever.
        Map("spec" -> AtomicStore.commitSnapshot(
          Seq("").toDF("sig_spec"), s"$root/spec"))
      else Map.empty
    spec ++ Map(
      "simhash" -> AtomicStore.commitSnapshot(c.simhash, s"$root/simhash"),
      "minhash" -> AtomicStore.commitSnapshot(c.minhashSigs, s"$root/minhash"))
  }

  /** The persisted signature definition, if the store declares one.
    * The empty string is the "unspecified" sentinel an undeclared
    * rebuild writes over a stale declaration — reported as None.
    */
  def loadSpec(spark: SparkSession, root: String): Option[String] =
    AtomicStore.currentVersion(spark, s"$root/spec")
      .map(_ => AtomicStore.read(spark, s"$root/spec").head().getString(0))
      .filter(_.nonEmpty)

  /** Reject an append whose signature definition or schema disagrees
    * with the store's. The schema leg is unconditional (a hash/band
    * COUNT change shows up as different columns, which commitAppend
    * would merge as nulls); the spec leg fires whenever the STORE
    * declares one (a shingle-k or seed change produces the SAME schema
    * with incompatible values — only the declaration can catch it). An
    * UNDECLARED append into a spec-declared store is rejected too: the
    * producer that never heard of SigSpec is exactly the one the guard
    * exists for — silently accepting its rows would re-open the
    * mixed-signature under-detection hole from the undeclared side.
    * Pre-spec stores (no spec table, or the unspecified sentinel) keep
    * accepting undeclared appends — the original caller contract.
    */
  private def guardAppend(batch: DataFrame, table: String, root: String,
                          declaredSpec: String, what: String): Unit = {
    val spark = batch.sparkSession
    if (AtomicStore.currentVersion(spark, table).isDefined) {
      val stored = AtomicStore.read(spark, table).columns.toSeq
      require(batch.columns.toSeq == stored,
        s"$what: batch schema (${batch.columns.mkString(", ")}) != stored " +
          s"schema (${stored.mkString(", ")}) — the batch was computed " +
          "under a different signature definition; fix the producer or " +
          "rebuild with write()")
    }
    loadSpec(spark, root).foreach { storedSpec =>
      require(declaredSpec.nonEmpty,
        s"$what: the store declares signature spec '$storedSpec' but this " +
          "append declares none — an undeclared batch may have been " +
          "computed under a different definition, which would mix " +
          "incompatible signatures and silently under-detect duplicates; " +
          "pass the producer's sigSpec (or rebuild with write())")
      require(storedSpec == declaredSpec,
        s"$what: declared signature spec '$declaredSpec' != the store's " +
          s"'$storedSpec' — appending would mix incompatible signatures " +
          "and silently under-detect duplicates; rebuild with write()")
    }
  }

  /** Load the persisted components (each at its current version). */
  def load(spark: SparkSession, root: String): Components =
    Components(
      AtomicStore.read(spark, s"$root/simhash"),
      AtomicStore.read(spark, s"$root/minhash"))

  /** Append a new ingest batch's simhash signatures: one atomic commit
    * whose bytes scale with the batch. Signatures are per-row pure
    * functions, so append is the whole incremental ROW story — no
    * rebuild, no merge — but steady-state FILE maintenance is wired in
    * rather than left to an operator who remembers to run [[compact]]:
    * once the component's manifest lists more than `compactAboveDirs`
    * batch dirs, the append folds it back to one snapshot (best-effort,
    * CAS'd — same policy as `Ingest.ingestBatchCommit`; a long-lived
    * ingest store otherwise pays probe-join listing/open cost linear in
    * wave count).
    */
  def appendSimhash(root: String, newSigs: DataFrame,
                    compactAboveDirs: Int = 64,
                    sigSpec: String = ""): Long =
    appendGuarded(newSigs, s"$root/simhash", root, sigSpec,
      "appendSimhash", compactAboveDirs)

  /** Same, for the minhash signature/band table. */
  def appendMinhash(root: String, newSigs: DataFrame,
                    compactAboveDirs: Int = 64,
                    sigSpec: String = ""): Long =
    appendGuarded(newSigs, s"$root/minhash", root, sigSpec,
      "appendMinhash", compactAboveDirs)

  /** Guard-then-commit, atomically enough to survive a racing REBUILD:
    * a blind-retry append ([[AtomicStore.commitAppend]]) whose guard
    * passed against the OLD store could retry itself onto a store
    * [[write]] just rebuilt under a NEW signature definition — the
    * d-side analog of AnnIndexStore's straggler append, except
    * signature rows carry no model stamp to fence them at load. So the
    * commit is CAS'd against the component-table version the guard
    * validated, and a lost CAS RE-RUNS the guard before retrying: if
    * the table moved because of a rebuild, the re-guard sees the
    * rebuild's declaration ([[write]] commits it first) and rejects; if
    * it moved because of a sibling append, the re-guard passes and the
    * retry lands. Costs one batch rewrite per lost race (the TagStore
    * appendMergeCommit trade) — appends race rarely, rebuilds almost
    * never, and the alternative is silent under-detection forever.
    */
  private def appendGuarded(batch: DataFrame, table: String, root: String,
                            declaredSpec: String, what: String,
                            aboveDirs: Int): Long = {
    val spark = batch.sparkSession
    var committed: Option[Long] = None
    while (committed.isEmpty) {
      val base = AtomicStore.currentVersion(spark, table)
      guardAppend(batch, table, root, declaredSpec, what)
      committed = AtomicStore.commitAppendIfUnchanged(batch, table, base)
    }
    AtomicStore.compactIfAbove(spark, table, committed.get, aboveDirs)
    committed.get
  }

  /** Periodic maintenance for a long-lived ingest store: fold each
    * component's accumulated append batches back into one snapshot
    * ([[AtomicStore.compact]] — CAS against racing appenders, vacuum of
    * the superseded batch dirs). Without it every ingest wave leaves one
    * manifest + one small batch dir forever, so probe joins pay a
    * file-listing + open cost linear in wave count; after the fold the
    * probe cost is flat again. Signatures are pure per-row functions, so
    * the fold is exactly row-preserving — loaded components and every
    * banded join off them are identical before and after
    * (DocIndexStoreSpec pins this, plus a racing appender/compactor
    * soak). Returns the fold version per component (None = that
    * component was already compact or lost its CAS budget to appenders).
    */
  def compact(spark: SparkSession, root: String,
              graceMs: Long = 15 * 60 * 1000L): Map[String, Option[Long]] =
    Map(
      "simhash" -> AtomicStore.compact(spark, s"$root/simhash", graceMs = graceMs),
      "minhash" -> AtomicStore.compact(spark, s"$root/minhash", graceMs = graceMs),
      // snapshot-only when present (compact returns None harmlessly for
      // a store that never declared one) — the value is the vacuum
      "spec" -> AtomicStore.compact(spark, s"$root/spec", graceMs = graceMs))
}
