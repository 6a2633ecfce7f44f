package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.AtomicStore

/** PERSISTED form of the ANN index: the artifacts the in-session memo
  * (`graft.queries.AnnEval`) keeps as localCheckpoints — coarse
  * centroids, IVF assignments (single- and multi-probe), PQ code table,
  * LSH signatures — written as [[AtomicStore]] tables under one root, so
  * a production deployment builds the index ONCE at write time and every
  * later query session (or cluster) serves lookups from the lake instead
  * of re-scoring the corpus. This is the claim SCALING.md makes for the
  * 100 TB shape ("on a real lake the same artifacts persist as tables
  * written at index time") as a working code path.
  *
  * Each component is its own atomically-versioned table (readers never
  * see a half-written index component; a crashed write leaves the
  * previous version readable — AtomicStore's contract). PER-TABLE
  * atomicity is the protocol's unit; CROSS-table consistency is layered
  * on top by the refresh lease (writers), the model-version fence
  * (appended rows), and the commit-order invariants (components before
  * model, params last) — and those close the CONCURRENCY seams, not
  * interruption: a refresh that crashes between its component commits
  * and its model commit leaves tables from two generations standing
  * (see [[refreshIndex]] for the residual and its remedy), and a reader
  * that resolves tables while a refresh is mid-swap can pin a mixed
  * cut. The structural fix is a store-level MANIFEST — one single-row
  * atomic table pinning (component version × model version) per cut,
  * CAS'd once per swap, resolved by load() — the Iceberg
  * snapshot-of-snapshots shape; recorded in SCALING.md Round-16 as the
  * designed next step. Until then the refresh-race gate's repair
  * discipline (diff served vs expected, re-append, or re-run
  * refreshIndex) is the operational remedy.
  *
  * Scale notes: the assignment tables are bytes per corpus row (two
  * longs), the codes table a few small ints per row; centroids are
  * model-sized. Writes are one pass each; loads are parquet scans that
  * prune to the probed buckets via the same pushed filters the served
  * (in-session) form enjoys.
  */
object AnnIndexStore {

  final case class Components(
      centroids: DataFrame,       // (centroid_id, cvec)
      assigned: DataFrame,        // (vec_id, centroid_id) single-probe
      assignedMulti: DataFrame,   // (vec_id, centroid_id) nprobe rows/vec
      codes: DataFrame,           // pqEncode output
      sigs: DataFrame)            // (vec_id, bucket_sig)

  private val parts = Seq("centroids", "assigned", "assigned_multi",
    "codes", "sigs")

  /** Write every component as its own atomic table under `root`.
    * Returns the committed version per component. (No session parameter:
    * the write executes on the components' own session.)
    *
    * On a store that already persists a MODEL, a bare components
    * rewrite is refused unless the refresh lease is held (i.e. unless
    * called from [[refreshIndex]]): rewriting centroids WITHOUT bumping
    * the generation leaves previously appended rows — stamped with the
    * still-current generation but assigned under the OLD centroids —
    * passing the load fence into a store whose centroid table no longer
    * matches them, the exact silent mixing the fence exists to prevent
    * (and one it cannot catch, because the stamps look current). Fresh
    * and model-less (rebuild-only) stores are unaffected.
    */
  def write(root: String, c: Components): Map[String, Long] = {
    val spark = c.centroids.sparkSession
    // unconditional, not lease-gated: leaseHeld cannot distinguish THIS
    // caller holding the refresh lease from a bystander racing someone
    // else's refresh — and the bystander is the dangerous case. The one
    // legitimate model-ful rewrite path is refreshIndex, which calls
    // the private writeComponents below while holding the lease.
    if (AtomicStore.currentVersion(spark, s"$root/params").isDefined)
      throw new IllegalStateException(
        s"AnnIndexStore.write: $root persists a model — a bare components " +
          "rewrite would leave current-generation append stamps pointing " +
          "at replaced centroids, which the load fence cannot catch. Use " +
          "refreshIndex(root, components, model) to swap components and " +
          "model together under the refresh lease")
    writeComponents(root, c)
  }

  private def writeComponents(root: String, c: Components): Map[String, Long] = {
    // canonical column selects everywhere the schema is fixed: a caller
    // frame carrying extra columns would otherwise persist them, and
    // every later APPEND (canonical-shaped) would merge-as-nulls into
    // reads — the silent degradation the appendVectors schema guards
    // reject. codes stays as-is (its shape is the model's numSub, which
    // the append path checks against the stored table).
    val frames = Map(
      "centroids" -> c.centroids.select("centroid_id", "cvec"),
      "assigned" -> c.assigned.select("vec_id", "centroid_id"),
      "assigned_multi" -> c.assignedMulti.select("vec_id", "centroid_id"),
      "codes" -> c.codes,
      "sigs" -> c.sigs.select("vec_id", "bucket_sig"))
    parts.map(p => p -> AtomicStore.commitSnapshot(frames(p), s"$root/$p")).toMap
  }

  /** Load the persisted components (each at its current version).
    *
    * Model-version fencing: per-row batches landed by [[appendVectors]]
    * carry the `model_version` they were ENCODED against. An append
    * that passed the lease check and was mid-commit when a
    * [[refreshIndex]] swapped the model can still land its old-model
    * batch on top of the new snapshots (the one-append-commit residual
    * the lease cannot close) — those rows are assignments to centroids
    * and codewords that no longer exist, a silent recall corruption if
    * served. So the load drops any stamped row whose version predates
    * the CURRENT model's and strips the bookkeeping column; rows with
    * no stamp are snapshot rows written by [[write]]/[[refreshIndex]]
    * itself (by definition current — they ARE the swap).
    */
  def load(spark: SparkSession, root: String): Components = {
    def t(p: String) = AtomicStore.read(spark, s"$root/$p")
    lazy val current = currentModelVersion(spark, root)
    def perRow(p: String): DataFrame = {
      val df = t(p)
      if (!df.columns.contains("model_version")) df
      else df.filter(col("model_version").isNull ||
          col("model_version") === current)
        .drop("model_version")
    }
    Components(t("centroids"), perRow("assigned"), perRow("assigned_multi"),
      perRow("codes"), perRow("sigs"))
  }

  /** The persisted model's generation: bumped by every [[writeModel]]
    * (so every [[refreshIndex]]); 0 for a store whose params predate
    * version stamping or that has no model at all. Only the
    * no-params-table case maps to 0 — a real read failure PROPAGATES,
    * because defaulting the version on a transient error would make the
    * fence in [[load]] silently drop every stamped row (stamps are ≥ 1).
    */
  def currentModelVersion(spark: SparkSession, root: String): Long =
    try {
      val p = AtomicStore.read(spark, s"$root/params")
      if (p.columns.contains("model_version"))
        p.head().getAs[Long]("model_version")
      else 0L
    } catch {
      case e: IllegalStateException if e.getMessage != null &&
          e.getMessage.contains("no commits") => 0L
    }

  /** The frozen MODEL behind the per-row components — everything
    * [[appendVectors]] needs to extend the index consistently with how
    * it was built: the PQ sub-quantizer codewords, the LSH hyperplanes,
    * and the build parameters (probe width, subspace count). Centroids
    * are already a [[Components]] table; the rest previously lived only
    * in the building session, which is exactly why the store was
    * rebuild-only: a later ingest session had no way to encode a new
    * batch the same way the corpus was encoded.
    */
  final case class Model(
      codebook: DataFrame,    // (code_id, cvec) — PQ codewords, id-ordered
      hyperplanes: DataFrame, // (hp_id, hvec)   — LSH bit hyperplanes
      nprobe: Int,            // assigned_multi probe width
      numSub: Int,            // PQ subspace count
      version: Long = 0L)     // persisted generation (loadModel fills it)

  private val modelParts = Seq("codebook", "hyperplanes", "params")

  /** Persist the model under the same root (each piece its own atomic
    * table — all model-sized: a few codeword/hyperplane rows plus one
    * params row). Write it alongside [[write]] at build time to make the
    * index APPENDABLE; stores without it remain valid but rebuild-only.
    *
    * Every call bumps the model GENERATION, which [[load]] fences
    * appended batches by — so a standalone writeModel (without the
    * [[refreshIndex]] components rewrite) deliberately INVALIDATES
    * previously appended batches: they were encoded under codewords and
    * centroids that no longer exist, and serving them against the new
    * model is silent recall corruption. Snapshot rows from [[write]]
    * are unstamped and keep serving; use refreshIndex to swap model and
    * components together.
    */
  def writeModel(root: String, m: Model): Map[String, Long] = {
    val spark = m.codebook.sparkSession
    import spark.implicits._
    // COMMIT-ORDER INVARIANT (structural, not an evaluation-order
    // accident): codebook and hyperplanes commit BEFORE params, and
    // params commits LAST. The fence's safety against mixed reads
    // depends on it — an appender stamps its batch with the generation
    // it read from params, so the generation must never be visible
    // before the model pieces it advertises; params-first would let an
    // append observe a NEW stamp with OLD codewords and land
    // wrongly-encoded rows the fence cannot drop. refreshIndex relies on
    // the same ordering one level up (components before model).
    //
    // The generation bump is a CAS'd read-increment-write: two
    // concurrent writeModels (or one racing refreshIndex, a legitimate
    // standalone-invalidation use) must never mint the SAME number for
    // two DIFFERENT models — old-model append batches stamped with it
    // would pass the load fence and serve silently corrupt assignments.
    // So params commits via commitSnapshotIfUnchanged against the table
    // version the bump was read from, and a lost race retries the WHOLE
    // sequence — codebook and hyperplanes included, not just params:
    // re-committing only params would publish our re-minted generation
    // over the RACING WINNER's codebook/hyperplanes snapshots (a
    // generation describing pieces that aren't ours). Re-running all
    // three keeps the final state coherent (the last params writer's
    // pieces end up behind its generation), and any append that read a
    // mixed transient window carries a stamp that predates the final
    // generation — fenced at load.
    var versions: Option[Map[String, Long]] = None
    while (versions.isEmpty) {
      val paramsBase = AtomicStore.currentVersion(spark, s"$root/params")
      val newVersion = currentModelVersion(spark, root) + 1L
      val vCodebook = AtomicStore.commitSnapshot(
        m.codebook.select(col("code_id").cast("long"), col("cvec")),
        s"$root/codebook")
      val vHyperplanes = AtomicStore.commitSnapshot(
        m.hyperplanes.select(col("hp_id").cast("long"), col("hvec")),
        s"$root/hyperplanes")
      versions = AtomicStore.commitSnapshotIfUnchanged(
        Seq((m.nprobe, m.numSub, newVersion))
          .toDF("nprobe", "num_sub", "model_version"),
        s"$root/params", paramsBase)
        .map(vParams => Map("codebook" -> vCodebook,
          "hyperplanes" -> vHyperplanes, "params" -> vParams))
    }
    versions.get
  }

  /** Load the persisted model. The params row is one driver-side read;
    * codebook/hyperplanes stay lazy frames for the batch-side joins.
    */
  def loadModel(spark: SparkSession, root: String): Model = {
    val p = AtomicStore.read(spark, s"$root/params").head()
    Model(
      AtomicStore.read(spark, s"$root/codebook"),
      AtomicStore.read(spark, s"$root/hyperplanes"),
      nprobe = p.getInt(p.fieldIndex("nprobe")),
      numSub = p.getInt(p.fieldIndex("num_sub")),
      version =
        if (p.schema.fieldNames.contains("model_version"))
          p.getLong(p.fieldIndex("model_version"))
        else 0L)
  }

  /** Incremental index maintenance — the ingest-wave path that was
    * missing while [[write]] was the only way to change the store (a
    * growing corpus re-paid a FULL assignment/codes/sigs rewrite per
    * wave). Assigns/encodes/signs the NEW BATCH ONLY against the pinned
    * persisted model — centroids, PQ codebook, LSH hyperplanes, and the
    * build parameters all come from the store, so a later session (or a
    * different cluster) extends the index bit-identically to how the
    * base was built — and lands each per-row component as one appended
    * batch via the [[DocIndexStore]] auto-fold pattern: commit bytes
    * scale with the batch, never the corpus, and once a component's
    * manifest lists more than `compactAboveDirs` batch dirs the append
    * folds it back to one snapshot (best-effort, CAS'd against racing
    * appenders).
    *
    * Assignment/encoding/signatures are pure per-row functions of
    * (vector, pinned model), so append-then-load is EXACTLY equal to a
    * from-scratch rebuild of the grown corpus under the same model —
    * s17's oracle pins that. What appends can NOT refresh is the model
    * itself: centroids drift as the corpus grows, and the recall gap
    * between the pinned-model index and a refreshed rebuild is the
    * STALENESS the s18 eval measures (the refresh decision — retrain
    * centroids, then one [[write]] — stays an operator policy, gated on
    * that measurement, exactly like a FAISS index rebuild).
    *
    * `newEmb` is (vec_id, vec) with caller-owned id uniqueness, the
    * DocIndexStore append contract (exactly-once sits with the ingest
    * commit protocol, `Ingest.ingestBatchCommit`).
    */
  private def refreshLeasePath(root: String) = s"$root/.refresh_lease"

  /** Atomically-intentioned MODEL REFRESH — the "retrain + rewrite"
    * operation the s18 staleness eval gates: new centroids (and codebook/
    * hyperplanes/params) plus the re-derived per-row components, written
    * as the next snapshot of every table. The danger this method exists
    * to contain: a refresh racing [[appendVectors]] would mix OLD-model
    * batches into the NEW-model store — assignment rows bucketed under
    * centroids that no longer exist, a SILENT recall degradation no
    * single-table CAS can catch because the inconsistency spans tables.
    * So the refresh runs under an exclusive lease
    * ([[AtomicStore.claimLease]]) and [[appendVectors]] REFUSES loudly
    * while it is held. The residual the lease cannot close — an append
    * that resolved the old model and is already mid-commit when the
    * refresh claims the lease lands old-model batches on top of the new
    * snapshots — is closed by the model-version FENCE: every append
    * batch is stamped with the generation it encoded against, [[load]]
    * drops stamped rows that predate the current model, and [[compact]]
    * purges their bytes. The straggler's VECTORS are simply absent until
    * re-appended (an ingest that keeps a served-set check, like
    * AnnStoreScale's race regime, repairs that in one pass). The
    * components/model are snapshot commits, so readers never see a
    * half-written TABLE at any point.
    *
    * KNOWN RESIDUAL — interruption, not concurrency: the swap spans
    * eight single-table commits, so a crash (or unretried IO error)
    * partway through leaves a store whose tables straddle two
    * generations — worst, new components behind the OLD generation,
    * where previously appended rows stamped with that still-current
    * generation serve against replaced centroids and the fence cannot
    * object. The lease makes this window single-writer but cannot make
    * it atomic. Remedy: a refreshIndex that fails must be RE-RUN to
    * completion (it is idempotent — every commit is a snapshot), and
    * the race gate's served-vs-rebuilt diff detects the state. The
    * structural fix is the store-level manifest described in the class
    * header.
    */
  def refreshIndex(root: String, c: Components, m: Model,
                   leaseTtlMs: Long = AtomicStore.DefaultLeaseTtlMs): Map[String, Long] = {
    val spark = c.centroids.sparkSession
    val lease = AtomicStore.claimLease(spark, refreshLeasePath(root),
      leaseTtlMs, "AnnIndexStore.refreshIndex (exclusive model swap)")
    try {
      // COMMIT-ORDER INVARIANT: components FIRST, model SECOND (and
      // inside writeModel, params last) — see writeModel. The new
      // generation must never be observable before every table it
      // describes; an appender that reads the new model_version must
      // find the new centroids/codewords behind it. writeComponents,
      // not write(): the public write refuses model-ful stores
      // unconditionally — this lease-holding swap is the one legitimate
      // rewrite path.
      val componentVersions = writeComponents(root, c)
      val modelVersions = writeModel(root, m)
      componentVersions ++ modelVersions
    } finally AtomicStore.releaseLease(spark, lease)
  }

  def appendVectors(root: String, newEmb: DataFrame,
                    compactAboveDirs: Int = 64): Map[String, Long] = {
    val spark = newEmb.sparkSession
    // refuse while a model refresh holds the lease: our batch would be
    // encoded under the OLD model and mix silently into the NEW store
    // (see refreshIndex). Checked before any read so the loud path is
    // also the cheap path. The deadline is the REFRESH HOLDER's own TTL,
    // persisted inside its lease file at claim time — a long retrain
    // claimed with a 60-minute TTL keeps excluding appends for the full
    // 60 minutes, not until some appender-side constant expires.
    if (AtomicStore.leaseHeld(spark, refreshLeasePath(root)))
      throw new java.util.ConcurrentModificationException(
        s"appendVectors: a model refresh holds ${refreshLeasePath(root)} — " +
          "an append encoded under the outgoing model would mix into the " +
          "refreshed store; retry after the refresh releases the lease")
    appendEncoded(root, newEmb, loadModel(spark, root), compactAboveDirs)
  }

  /** The encode-and-commit half of [[appendVectors]], against a model
    * the CALLER already resolved — `private[graft]` so the residual-
    * window spec can force the exact interleaving the lease cannot
    * close (model resolved, refresh completes, append commits) without
    * a test seam in the public API. Every committed row is stamped with
    * `m.version`, which is what makes that interleaving HARMLESS: the
    * straggler's rows land physically but [[load]] fences them out as
    * predating the refreshed model.
    */
  private[graft] def appendEncoded(root: String, newEmb: DataFrame,
                                   m: Model,
                                   compactAboveDirs: Int): Map[String, Long] = {
    val spark = newEmb.sparkSession
    val centroids = AtomicStore.read(spark, s"$root/centroids")
    val codebook = m.codebook.orderBy("code_id").select("cvec")
      .collect().map(_.getSeq[Double](0).toArray).toSeq
    require(codebook.nonEmpty,
      s"appendVectors: persisted codebook at $root/codebook is empty")
    // the batch feeds FOUR independent encode+commit passes (assign,
    // multi-assign, PQ codes, LSH sigs); without a persist each pass
    // re-executes whatever upstream lineage produced the embeddings —
    // roughly 4× the ingest cost per wave when that lineage is an
    // expensive pipeline. Persisted for the scope of this call only.
    val batch = newEmb.select("vec_id", "vec").persist()
    try {
      def stamped(df: DataFrame): DataFrame =
        df.withColumn("model_version", lit(m.version))
      // write() and writeModel() are separate calls, so the seam where a
      // params row disagrees with the components it describes EXISTS —
      // and commitAppend imposes no schema check, so a numSub mismatch
      // would land a codes batch whose columns merge as nulls into every
      // later read (a silently-degraded ADC scan, not an error). Check
      // the batch's code schema against the stored table's before
      // committing (modulo the model_version stamp, which is load-side
      // bookkeeping a pre-stamping store legitimately lacks). sigs gets
      // the same guard: writeComponents canonicalizes its shape now, but
      // stores written before that canonicalization may persist extra
      // columns the appended batches lack.
      val newCodes = Similarity.pqEncode(batch, codebook, m.numSub)
      def requireSchema(batchDf: DataFrame, table: String,
                        why: String): Unit = {
        val stored = AtomicStore.read(spark, s"$root/$table")
          .columns.toSeq.filterNot(_ == "model_version")
        require(batchDf.columns.toSeq == stored,
          s"appendVectors: batch $table schema " +
            s"(${batchDf.columns.mkString(", ")}) != stored schema " +
            s"(${stored.mkString(", ")}) — $why; fix the model or rebuild " +
            "with write()")
      }
      requireSchema(newCodes, "codes",
        "the params table (num_sub) disagrees with the codes the store " +
          "was built with")
      val newSigs = Similarity.hyperplaneSignatures(batch, m.hyperplanes)
      requireSchema(newSigs, "sigs",
        "the store's signature table was written with a non-canonical shape")
      Map(
        "assigned" -> appendCompacting(
          stamped(Similarity.ivfAssign(batch, centroids)
            .select("vec_id", "centroid_id")),
          s"$root/assigned", compactAboveDirs),
        "assigned_multi" -> appendCompacting(
          stamped(Similarity.ivfAssignMulti(batch, centroids, m.nprobe)
            .select("vec_id", "centroid_id")),
          s"$root/assigned_multi", compactAboveDirs),
        "codes" -> appendCompacting(
          stamped(newCodes),
          s"$root/codes", compactAboveDirs),
        "sigs" -> appendCompacting(
          stamped(newSigs),
          s"$root/sigs", compactAboveDirs))
    } finally batch.unpersist()
  }

  private def appendCompacting(batch: DataFrame, table: String,
                               aboveDirs: Int): Long = {
    val v = AtomicStore.commitAppend(batch, table)
    AtomicStore.compactIfAbove(batch.sparkSession, table, v, aboveDirs)
    v
  }

  /** Periodic maintenance, the [[DocIndexStore.compact]] sibling: fold
    * any accumulated batch dirs per component and vacuum superseded
    * manifests/dirs. [[write]] commits whole snapshots, so for a
    * snapshot-only store the fold is a no-op (one data dir already) and
    * the value is the vacuum — every index REBUILD otherwise leaves its
    * superseded manifest + full-size data dirs on the lake forever. For
    * a store grown by [[appendVectors]], the fold is the real
    * steady-state work the append path also self-triggers. Model tables
    * (when present) get the same vacuum — compact returns None
    * harmlessly for a store that never wrote one.
    */
  def compact(spark: SparkSession, root: String,
              graceMs: Long = 15 * 60 * 1000L): Map[String, Option[Long]] = {
    val folded = (parts ++ modelParts).map(p =>
      p -> AtomicStore.compact(spark, s"$root/$p", graceMs = graceMs)).toMap
    purgeFenced(spark, root)
    folded
  }

  /** Drop rows the model-version fence permanently hides — a straggler
    * append's old-model batch is invisible to [[load]] from the moment
    * it lands, but its bytes ride every later fold forever unless some
    * maintenance pass rewrites without them. Runs inside [[compact]]:
    * per per-row component, if any stamped row predates the current
    * model, snapshot the fenced view CAS'd against the version the scan
    * resolved (a racing append wins the CAS and the purge simply skips —
    * maintenance must never clobber a commit). Best-effort like the
    * fold; the fence at load keeps correctness either way.
    *
    * Only STRICTLY-OLDER stamps are purged (`< v`, kept set
    * `isNull || >= v`), never `!= v`: the model version is resolved
    * ONCE up front, and a refreshIndex (bumping to v+1) plus a
    * current-model append (rows stamped v+1) can both land before the
    * per-table CAS resolves its base — an equality purge would then
    * delete legitimately-served current-model rows with a CAS that
    * succeeds. A stamp can only exceed our resolved v by having been
    * read from a params row that already existed, so `>= v` rows are
    * never fence-hidden garbage; a LATER purge (resolving the newer v)
    * reclaims them if yet another refresh strands them. Belt-and-braces,
    * the purge also skips entirely while the refresh lease is held —
    * "current model" is about to change under it.
    */
  private def purgeFenced(spark: SparkSession, root: String): Unit =
    try {
      if (AtomicStore.leaseHeld(spark, refreshLeasePath(root))) return
      val v = currentModelVersion(spark, root)
      Seq("assigned", "assigned_multi", "codes", "sigs").foreach { p =>
        try {
          val t = s"$root/$p"
          AtomicStore.currentVersion(spark, t).foreach { base =>
            val df = AtomicStore.read(spark, t)
            if (df.columns.contains("model_version") &&
                !df.filter(col("model_version").isNotNull &&
                  col("model_version") < v).isEmpty) {
              AtomicStore.commitSnapshotIfUnchanged(
                df.filter(col("model_version").isNull ||
                  col("model_version") >= v),
                t, Some(base))
            }
          }
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
