package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design (the whole point of these shapes at 100 TB):
  *  - Exact dedup is one hash-aggregate — map-side partial `min`/`count`
  *    combine before the shuffle, so traffic is one row per distinct hash.
  *  - MinHash signatures are 1 row/doc after a single explode+groupBy whose
  *    `min()` aggregates also combine map-side; the doc×shingle blow-up
  *    never crosses the network.
  *  - LSH candidates come from an equi-join on (band_idx, band_hash) — a
  *    shuffle keyed by tiny band hashes instead of the O(n²) cross join;
  *    exact Jaccard verification then runs ONLY over candidate docs.
  *  - All hashing is md5-derived → deterministic, seedless, and exactly
  *    reproducible in the DuckDB oracle.
  */
object Dedup {

  /** Exact dedup: group by content hash; keep the smallest id as keeper
    * (deterministic survivor rule).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))

  /** Per-doc distinct shingle-hash set as a ROW-LOCAL array
    * `(id, hs: array<long>)` — the shared front end of the MinHash/Jaccard
    * family. Char-k-gram shingles are hashed to 28-bit ints inside the
    * `transform` (engine-portable md5-derived hash, so the oracle mirrors
    * collisions exactly) and deduplicated with `array_distinct` without
    * ever leaving the row.
    *
    * This shape is the scale win of the whole family: the doc×shingle
    * blow-up (~300× the corpus row count) exists only transiently inside
    * a narrow projection — it is never exploded into rows, never
    * persisted, and never crosses a shuffle. Minhash signatures become
    * per-row `array_min(transform(...))` (zero shuffle, vs an
    * explode+groupBy over the blow-up), and Jaccard verification joins
    * these 1-row/doc arrays directly. Web documents are a few KB → arrays
    * of a few thousand longs, well inside row limits; for pathologically
    * large docs fall back to the exploded form ([[jaccardVerify]]).
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge => B}
    import graft.plans.ShingleHashSet
    // native one-loop-per-row expression; bit-identical to
    // array_distinct(transform(charShingles(text,k), hash28)) up to set
    // order (ShingleExprsSpec) — the HOF form pays interpreter overhead
    // per shingle
    docs.select(col(idCol),
      B.column(ShingleHashSet(B.expression(col(textCol)), k)).as("hs"))
  }

  /** The affine minhash permutation family: h_i(s) = (a_i·h28(s) + b_i)
    * mod P. Exactly mirrored in the oracle SQL — pure BIGINT arithmetic in
    * both engines. One md5 per shingle total (the 28-bit base hash); the 8
    * permutations are integer ops, ~8× cheaper than salted-md5 minhashing.
    */
  val MinhashP: Long = 1073741789L // largest prime < 2^30
  val MinhashA: Seq[Long] = Seq(1299721L, 2750159L, 4256233L, 5800079L,
    7368787L, 8960453L, 10570841L, 12195257L)
  val MinhashB: Seq[Long] = Seq(15485863L, 32452843L, 49979687L, 67867967L,
    86028121L, 104395301L, 122949823L, 141650939L)

  /** MinHash signatures: `numHashes` affine permutations of the 28-bit
    * shingle hash, min per doc, grouped into `numBands` band hashes.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 5, numHashes: Int = 8,
                        numBands: Int = 2): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge => B}
    import graft.plans.ShingleMinHash
    // numBands >= 1 must be explicit: 8 % -2 == 0 in Scala, and a
    // non-positive band count would build ZERO band columns, silently
    // emptying every LSH candidate set downstream
    require(numBands >= 1 && numHashes % numBands == 0 &&
      numHashes <= MinhashA.length,
      s"minhash: need numBands >= 1 dividing numHashes <= ${MinhashA.length}" +
        s" (got numHashes=$numHashes, numBands=$numBands)")
    // single-pass native minhash straight from the text — no intermediate
    // shingle array at all (min over non-distinct == min over the set)
    val mh = B.column(ShingleMinHash(B.expression(col(textCol)), k,
      MinhashA.take(numHashes), MinhashB.take(numHashes), MinhashP))
    // no-shingle docs are excluded by the CHEAP length precondition (which
    // pushes to the scan); an isNotNull on __mh instead gets pushed below
    // the projection and re-derives the minhash per row (observed 2× eval)
    val sigs = docs.filter(length(col(textCol)) >= k)
      .select(col(idCol), mh.as("__mh"))
      .select((col(idCol) +: (0 until numHashes)
        .map(i => element_at(col("__mh"), i + 1).as(s"mh_$i"))): _*)
    withBands(sigs, numHashes, numBands)
  }

  /** Signatures from a (possibly cached) shingle-set table: each mh_i is a
    * per-row `array_min` over the permuted hash array — a NARROW projection
    * with zero shuffle (the explode+groupBy formulation shuffles the
    * doc×shingle blow-up even with map-side combine). Docs with no
    * shingles (text shorter than k) are dropped, matching the exploded
    * form where they simply produce no rows.
    */
  def minhashFromSets(sets: DataFrame, idCol: String,
                      numHashes: Int = 8, numBands: Int = 2): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge => B}
    import graft.plans.MinhashFromSet
    // numBands >= 1 must be explicit: 8 % -2 == 0 in Scala, and a
    // non-positive band count would build ZERO band columns, silently
    // emptying every LSH candidate set downstream
    require(numBands >= 1 && numHashes % numBands == 0 &&
      numHashes <= MinhashA.length,
      s"minhash: need numBands >= 1 dividing numHashes <= ${MinhashA.length}" +
        s" (got numHashes=$numHashes, numBands=$numBands)")
    val mh = B.column(MinhashFromSet(B.expression(col("hs")),
      MinhashA.take(numHashes), MinhashB.take(numHashes), MinhashP))
    // cheap emptiness precondition instead of isNotNull on the computed
    // column (same pushdown double-eval trap as minhashSignatures)
    val sigs = sets.filter(size(col("hs")) > 0)
      .select(col(idCol), mh.as("__mh"))
      .select((col(idCol) +: (0 until numHashes)
        .map(i => element_at(col("__mh"), i + 1).as(s"mh_$i"))): _*)
    withBands(sigs, numHashes, numBands)
  }

  /** Group `mh_0..mh_{numHashes-1}` into `numBands` md5 band hashes. */
  private def withBands(sigs: DataFrame, numHashes: Int,
                        numBands: Int): DataFrame = {
    val rowsPerBand = numHashes / numBands
    (0 until numBands).foldLeft(sigs) { (df, b) =>
      val parts = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"mh_$i").cast("string"))
      df.withColumn(s"band_$b", md5(concat_ws("|", parts: _*)))
    }
  }

  /** One row per (doc, band): the exploded band table both candidate
    * joins key on.
    */
  private def bandRows(sigs: DataFrame, idCol: String,
                       numBands: Int): DataFrame = {
    // the signature builders enforce numBands >= 1 at build time; enforce
    // it on the JOIN side too — explode over an empty band array would
    // silently report zero candidates instead of a usage error
    require(numBands >= 1, s"lshCandidates: numBands $numBands must be >= 1")
    sigs.select(col(idCol).as("id"),
      explode(array((0 until numBands).map(b =>
        struct(lit(b).as("band_idx"), col(s"band_$b").as("band_hash"))): _*)).as("b"))
      .select(col("id"), col("b.band_idx"), col("b.band_hash"))
  }

  /** Sentinel for the band joins' `salts` parameter: derive the salt
    * factor from the OBSERVED bucket histogram at call time
    * ([[Skew.chooseSalts]] — one distributed metadata-sized aggregation
    * over the band table, the histogram never reaches the driver). This
    * is the default: a boilerplate-heavy corpus gets the mitigation
    * without the operator author remembering to probe, and a healthy
    * corpus pays only the histogram pass — the rule resolves to 0 there
    * (AQE's runtime skew split stays the only mitigation, measured
    * strictly faster below the crossover; SCALING.md "salting
    * crossover"). Note the crossover accounts for the band layout
    * itself: a pure-duplicate corpus heats ALL `nChunks` chunk buckets
    * equally, so c_max² ≤ W/nChunks and the rule correctly stays at 0
    * until the partition count (cluster scale) makes one bucket's square
    * dwarf a fair share. Pass an explicit 0 to skip the histogram pass,
    * or an explicit s > 1 to force the salted form.
    */
  val AutoSalts: Int = -1

  /** Whether `df` is an already-materialized relation — a checkpointed or
    * persisted LogicalRDD, or any frame the CALLER persisted (the cache
    * manager knows: `df.storageLevel`, which covers a served parquet
    * table the caller cached). A bare LogicalRDD plan node alone is NOT
    * proof (createDataFrame over an expensive uncached RDD is also a
    * LogicalRDD), so the underlying RDD must actually be checkpointed or
    * persisted. Gate for skipping a redundant localCheckpoint copy in
    * the self-join builders.
    */
  private def isMaterialized(df: DataFrame): Boolean =
    df.storageLevel != org.apache.spark.storage.StorageLevel.NONE ||
      (df.queryExecution.analyzed match {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.isCheckpointed ||
            r.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
        case _ => false
      })

  /** Resolve a `salts` argument: explicit values pass through, the
    * [[AutoSalts]] sentinel derives from `buckets`' key histogram under
    * the session's shuffle partitioning (the P the join will shuffle
    * with). The decision is MEMOIZED on the bucket table's canonicalized
    * plan: the dedup pipelines run several band joins over one SERVED
    * signature table per session (d06/d09/d24 share it), and the
    * histogram can't change between them — so repeat calls over a served
    * table skip the probe job (a fresh/unmaterialized input gets a fresh
    * plan and legitimately pays a fresh probe). Safe even on a
    * (negligible) hash collision: EVERY salts value is lossless
    * (SkewSpec), a stale factor only shifts the shuffle layout. The
    * probe runs OUTSIDE any map lock (a racing duplicate probe is
    * cheaper than serializing two queries on a bin lock), and the memo
    * is bounded — it holds (int, int) → int entries, but a long-lived
    * driver ingesting forever should not accrete even those.
    */
  private val saltMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Integer]
  private val SaltMemoMax = 256
  private def resolveSalts(salts: Int, buckets: DataFrame,
                           keyCols: Seq[String]): Int =
    if (salts != AutoSalts) salts
    else {
      val p = buckets.sparkSession.sessionState.conf.numShufflePartitions
      val key = (buckets.queryExecution.analyzed.semanticHash(), p)
      val hit = saltMemo.get(key)
      if (hit != null) hit.intValue
      else {
        val s = Skew.chooseSalts(buckets, keyCols, p,
          hotFactor = 16.0, maxSalts = 64)
        if (saltMemo.size >= SaltMemoMax) saltMemo.clear()
        saltMemo.put(key, s)
        s
      }
    }

  /** Salted SELF-pair join sides (the [[Skew.saltedJoin]] technique
    * specialized to pair generation): the left side takes ONE
    * deterministic salt per row, the right side replicates ×salts, and the
    * caller adds `l.__salt === r.__salt` to its join condition — every
    * (l, r) pair meets exactly once, at the LEFT row's salt, so the pair
    * set is IDENTICAL to the plain self-join (SkewSpec) while the hottest
    * key's rows spread over `salts` reducers. The trade: the right side
    * shuffles ×salts — the explicit mitigation for corpora where one
    * band/chunk value dominates (boilerplate-heavy lakes) beyond what
    * AQE's skew split can rebalance.
    */
  private def saltedSides(rows: DataFrame, salts: Int,
                          unique: Column): (DataFrame, DataFrame, Column) =
    if (salts <= 1) (rows, rows, lit(true))
    else (
      rows.withColumn("__salt", pmod(xxhash64(unique), lit(salts.toLong))),
      rows.withColumn("__salt",
        explode(sequence(lit(0L), lit(salts.toLong - 1)))),
      col("l.__salt") === col("r.__salt"))

  /** LSH candidate pairs: docs sharing any band hash (a < b). The join is
    * keyed on (band_idx, band_hash) — at scale this is the only shuffle;
    * AQE's skew split handles moderately hot buckets, and `salts > 1`
    * engages the lossless salted form ([[saltedSides]]) for the
    * pathological boilerplate-heavy case.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, numBands: Int = 2,
                    salts: Int = AutoSalts): DataFrame = {
    // same materialization rule as [[simhashPairs]]: the band table feeds
    // both self-join sides AND (under AutoSalts) the histogram probe, so
    // an unmaterialized signature pipeline would evaluate 3×; a served
    // (already checkpointed/persisted) input skips the redundant copy
    val sigsP = if (isMaterialized(sigs)) sigs else sigs.localCheckpoint()
    val bands = bandRows(sigsP, idCol, numBands)
    val (lS, rS, saltCond) = saltedSides(bands,
      resolveSalts(salts, bands, Seq("band_idx", "band_hash")), col("id"))
    lS.as("l").join(rS.as("r"),
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        saltCond &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"))
      .distinct()
  }

  /** Cross-side LSH candidates: `left` docs sharing any band hash with
    * `right` docs — the probe shape of an INCREMENTAL near-dup index
    * (new batch vs persisted signature table). Same (band_idx, band_hash)
    * equi-join as [[lshCandidates]]; no `a < b` ordering because the
    * sides are disjoint by contract, and at scale the (small) batch side
    * broadcasts against the bucketed index instead of self-joining the
    * corpus.
    */
  def lshCandidatesBetween(left: DataFrame, right: DataFrame, idCol: String,
                           numBands: Int = 2): DataFrame =
    bandRows(left, idCol, numBands).as("l")
      .join(bandRows(right, idCol, numBands).as("r"),
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"))
      .distinct()

  /** Exact Jaccard over a given candidate pair set — verification stage of
    * the LSH pipeline. Intersections are computed PAIR-BOUNDED: candidates
    * ⋈ shingles(a) ⋈ shingles(b on shingle), so cost is
    * O(|candidates| × shingles/doc). A global shingle self-join is Σ df²
    * over the corpus — ~1.5e9 rows on the test lake at sf0.1 alone because
    * a small vocabulary makes most shingles near-universal — and is exactly
    * what LSH exists to avoid.
    */
  /** The one jaccard scoring expression both verify paths share
    * (|A∩B| / (|A| + |B| − |A∩B|), rounded to 6 — the oracle-pinned
    * convention): [[jaccardVerify]] (exploded fallback) and
    * [[jaccardVerifySets]] (set-based) are interchangeable, so the
    * formula and rounding must not be able to fork between them.
    */
  private def jaccardExpr: Column =
    round(col("inter") * lit(1.0) /
      (col("sz_a") + col("sz_b") - col("inter")), 6)

  def jaccardVerify(candidates: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    val shd = sh.distinct()
    val a = shd.select(col(idCol).as("a_id"), col("h"))
    val b = shd.select(col(idCol).as("b_id"), col("h"))
    val sizes = shd.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(a, "a_id")
      .join(b, Seq("b_id", "h"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "a_id").withColumnRenamed("sz", "sz_a"), "a_id")
      .join(sizes.withColumnRenamed(idCol, "b_id").withColumnRenamed("sz", "sz_b"), "b_id")
      .withColumn("jaccard", jaccardExpr)
      .select("a_id", "b_id", "inter", "jaccard")
  }

  /** Shared verify core of [[jaccardVerifySets]] and [[containmentPairs]]:
    * score every candidate pair's exact shingle-set intersection, emitting
    * `(a_id, b_id, sz_a, sz_b, inter)` behind an optimization barrier.
    *
    * Plan shape, in order of what it saves at scale:
    *  - **Size-ratio pruning** (when `ratio = Some((num, den))`): Jaccard
    *    ≤ min(|A|,|B|)/max(|A|,|B|), so a pair with `min·den < max·num`
    *    can never reach threshold num/den — it is dropped after two cheap
    *    size joins (1-row/doc, no arrays attached), before any
    *    intersection work or array-carrying join. Exact integer
    *    arithmetic; provably lossless for a ≥-threshold. When no
    *    threshold exists the size joins are skipped entirely — the
    *    machinery must not tax the unthresholded callers.
    *  - **Native intersect count** ([[graft.plans.LongSetIntersectSize]]):
    *    a primitive-long open-addressing probe, vs the built-in
    *    `size(array_intersect)`'s generic nullable path + result-array
    *    materialization — the dominant per-pair cost of a verify stage.
    *
    * The trailing `localCheckpoint(false)` is the same optimization
    * barrier as before: lineage is cut BEFORE any caller threshold, so
    * Catalyst cannot push a jaccard/containment predicate into the join
    * condition and re-evaluate the intersection per conjunct (observed 7×
    * slowdown); lazy, so the pair table is GC-released with the DataFrame
    * instead of leaking a CacheManager entry.
    */
  private def scoredPairs(candidates: DataFrame, sets: DataFrame,
                          idCol: String,
                          ratio: Option[(Long, Long)]): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge => B}
    import graft.plans.LongSetIntersectSize
    val pruned = ratio match {
      case Some((num, den)) =>
        // NO checkpoint here: the candidate table has exactly one
        // consumer chain (size joins → ratio filter → array joins), so a
        // block-cache materialization of the largest intermediate in the
        // stage bought nothing; the function-result checkpoint below is
        // the real threshold barrier
        val sizes = sets.select(col(idCol), size(col("hs")).as("sz"))
        candidates
          .join(sizes.toDF("a_id", "sz_a"), "a_id")
          .join(sizes.toDF("b_id", "sz_b"), "b_id")
          .filter(least(col("sz_a"), col("sz_b")) * den >=
            greatest(col("sz_a"), col("sz_b")) * num)
          .select("a_id", "b_id")
      case None => candidates
    }
    pruned
      .join(sets.select(col(idCol).as("a_id"), col("hs").as("sa")), "a_id")
      .join(sets.select(col(idCol).as("b_id"), col("hs").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"),
        size(col("sa")).as("sz_a"), size(col("sb")).as("sz_b"),
        B.column(LongSetIntersectSize(
          B.expression(col("sa")), B.expression(col("sb")))).as("inter"))
      .localCheckpoint(false)
  }

  /** Exact numerator/denominator of a decimal threshold (0.8 → 4/5-style
    * 8/10) so ratio pruning never suffers float rounding at the margin.
    * Thresholds with a long decimal expansion (e.g. 1.0/3) are FLOORED at
    * 9 decimal places: num/den ≤ t keeps the prune lossless (the keep-set
    * `min/max ≥ num/den` is a superset of `min/max ≥ t`), where the old
    * `toLongExact` over an uncapped scale simply threw.
    */
  private def thresholdRatio(t: Double): (Long, Long) = {
    val bd = BigDecimal(t)
    val capped =
      if (bd.scale <= 9) bd else bd.setScale(9, BigDecimal.RoundingMode.FLOOR)
    val den = BigDecimal(10).pow(math.max(capped.scale, 0)).toLongExact
    ((capped * BigDecimal(den)).toLongExact, den)
  }

  /** Jaccard verify via the per-doc shingle-set arrays of [[shingleSets]]:
    * candidates join the 1-row/doc set table on each side (AQE broadcasts
    * when it fits) and the native intersect count scores each pair with NO
    * wide shuffle — the pair×shingle join row blow-up of [[jaccardVerify]]
    * never materializes. Fall back to [[jaccardVerify]] for
    * pathologically large docs. Pairs with an empty intersection are
    * dropped (same as the join form). `minJaccard` enables the lossless
    * size-ratio pruning of [[scoredPairs]] — pass it whenever the caller
    * thresholds the result.
    */
  def jaccardVerifySets(candidates: DataFrame, sets: DataFrame,
                        idCol: String,
                        minJaccard: Option[Double] = None): DataFrame =
    scoredPairs(candidates, sets, idCol, minJaccard.map(thresholdRatio))
      .withColumn("jaccard", jaccardExpr)
      .select("a_id", "b_id", "inter", "jaccard")
      .filter(col("inter") > 0)

  /** N-gram Jaccard near-dup pairs WITHOUT LSH: candidates are pairs sharing
    * at least one *rare* shingle (document frequency ≤ maxDf — the classic
    * prefix/rare-token pruning that keeps the self-join from exploding on
    * stopword-like shingles), then exact Jaccard ≥ `minJaccard`.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, maxDf: Int = 50,
                   minJaccard: Double = 0.8): DataFrame = {
    val (sets, cands) = rareShingleCandidates(docs, idCol, textCol, k, maxDf)
    jaccardPairsFromSets(sets, cands, idCol, minJaccard)
  }

  /** [[jaccardPairs]] SERVED from prebuilt set/candidate tables (the
    * DocIndex form — shingle sets and rare candidates built once per
    * session, scored per query).
    */
  def jaccardPairsFromSets(sets: DataFrame, cands: DataFrame, idCol: String,
                           minJaccard: Double): DataFrame =
    jaccardVerifySets(cands, sets, idCol, Some(minJaccard))
      .filter(col("jaccard") >= minJaccard)

  /** Rare-shingle candidate pairs from a PREBUILT (id, hs) set table —
    * the servable form of the d04/d16 front end: the explode → df-agg →
    * semi-join → self-join chain runs off whatever materialization the
    * caller holds (a session-served DocIndex table, a fresh checkpoint).
    */
  def rareShingleCandidatesFrom(sets: DataFrame, idCol: String,
                                maxDf: Int): DataFrame = {
    // (id, h) rows already distinct per doc — explode of the cached sets
    val sh = sets.select(col(idCol), explode(col("hs")).as("h"))
    val rare = sh.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("h")
    // materialized: the candidate self-join references shr on both sides,
    // and shr's lineage (explode → df-agg → semi-join) is the expensive
    // part of the pipeline; a few k rows
    val shr = sh.join(rare, "h", "left_semi").localCheckpoint()
    shr.as("l").join(shr.as("r"),
        col("l.h") === col("r.h") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a_id"), col(s"r.$idCol").as("b_id"))
      .distinct()
  }

  /** Shared candidate front end of [[jaccardPairs]] and
    * [[containmentPairs]]: per-doc shingle-set arrays plus the (a_id, b_id)
    * pairs sharing at least one *rare* shingle (document frequency ≤
    * maxDf — the classic prefix/rare-token pruning that keeps the
    * self-join from exploding on stopword-like shingles). Returns
    * `(sets, candidates)`; both are safe to consume more than once.
    */
  private def rareShingleCandidates(docs: DataFrame, idCol: String,
                                    textCol: String, k: Int,
                                    maxDf: Int): (DataFrame, DataFrame) = {
    // materialized once: three consumers (df-agg via explode, candidate
    // semi-join, verify); 1 row/doc, so it is tiny relative to re-running
    // the shingle+md5 projection per consumer. Eager localCheckpoint (not
    // persist+count): same barrier against the downstream stages racing a
    // cold cache, but the blocks are GC-released with the DataFrame —
    // no CacheManager entry leaks per operator call
    val sets = shingleSets(docs, idCol, textCol, k).localCheckpoint()
    (sets, rareShingleCandidatesFrom(sets, idCol, maxDf))
  }

  /** Asymmetric CONTAINMENT near-dup pairs (Broder's "containment" measure,
    * "On the resemblance and containment of documents", 1997): for a pair
    * (A, B), c(A,B) = |A∩B| / |A| over the distinct k-char shingle sets —
    * the signal Jaccard misses when one document quotes or subsumes a much
    * larger/smaller one (|A∩B|/|A∪B| stays low while |A∩B|/|min| ≈ 1).
    * Candidate generation and plan shape are identical to [[jaccardPairs]]
    * (rare-shingle equi-join, set-array verify behind a pushdown barrier);
    * only the verdict column changes, so the operator inherits the same
    * 100 TB posture — no all-pairs comparison anywhere.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 5, maxDf: Int = 50,
                       minContainment: Double = 0.7): DataFrame = {
    val (sets, cands) = rareShingleCandidates(docs, idCol, textCol, k, maxDf)
    containmentPairsFromSets(sets, cands, idCol, minContainment)
  }

  /** [[containmentPairs]] SERVED from prebuilt set/candidate tables
    * (the DocIndex form).
    */
  def containmentPairsFromSets(sets: DataFrame, cands: DataFrame,
                               idCol: String,
                               minContainment: Double): DataFrame =
    // no ratio pruning: containment has no size-ratio bound (a tiny doc
    // fully contained in a huge one is exactly the signal), so every
    // candidate is scored; the [[scoredPairs]] barrier still keeps the
    // threshold out of the join condition
    scoredPairs(cands, sets, idCol, None)
      .withColumn("cont_a",
        round(col("inter") * lit(1.0) / col("sz_a"), 6))
      .withColumn("cont_b",
        round(col("inter") * lit(1.0) / col("sz_b"), 6))
      .select("a_id", "b_id", "inter", "cont_a", "cont_b")
      .filter(col("inter") > 0 &&
        greatest(col("cont_a"), col("cont_b")) >= minContainment)

  /** Cross-document DUPLICATE SPANS (the ExactSubstr idea of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022, re-expressed relationally): every word n-gram occurring in ≥
    * `minDocs` distinct docs is a duplicated gram; runs of consecutive
    * duplicated gram positions merge into maximal spans per doc — the
    * unit a span-level dedup pass would cut, where doc-level Jaccard
    * (d04) sees nothing. Output: `(id, span_start, n_grams, span_tokens)`.
    *
    * Scale shape: grams travel as 60-bit md5 hashes (shuffle width
    * independent of gram text; collisions are deterministic and mirrored
    * by the oracle), the df aggregation map-side combines, the dup
    * semi-join returns only duplicated positions, and the island merge is
    * a per-doc window — partition-parallel, no global sort.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 5, minDocs: Int = 2): DataFrame =
    // materialized once: feeds the df aggregation AND the dup semi-join
    duplicateSpansFromGrams(
      gramPositions(docs, idCol, textCol, n).localCheckpoint(false),
      idCol, n, minDocs)

  /** `(id, pos, h)` hashed word-n-gram positions — the corpus text pass
    * [[duplicateSpans]] and its served form share. Built once per
    * session by [[graft.queries.DocIndex]] (at n=5) so span detection
    * reads the signature table like every other d-family consumer
    * instead of re-exploding the corpus per run.
    */
  def gramPositions(docs: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame =
    docs.select(col(idCol),
        posexplode(TextFns.wordNgramsNative(col(textCol), n))
          .as(Seq("pos", "g")))
      .select(col(idCol), col("pos"), TextFns.hash60(col("g")).as("h"))

  /** Grams shared by at least `minDocs` documents — the `(h)` set the
    * span semi-join probes. A pure function of the gram table, so a
    * near-dup service persists it next to the positions (the
    * [[graft.queries.DocIndex]] memo does exactly that); the df
    * aggregation is the expensive half of a span run and is identical
    * across runs.
    */
  def duplicatedGrams(grams: DataFrame, idCol: String,
                      minDocs: Int): DataFrame =
    grams.groupBy("h")
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocs).select("h")

  /** [[duplicateSpans]] SERVED from a prebuilt [[gramPositions]] table
    * (the DocIndex form). `n` only widens the reported span length
    * (`span_tokens = n_grams + n - 1`); it must match the `n` the gram
    * table was built with.
    */
  def duplicateSpansFromGrams(grams: DataFrame, idCol: String,
                              n: Int, minDocs: Int): DataFrame =
    duplicateSpansFromIndex(grams, duplicatedGrams(grams, idCol, minDocs),
      idCol, n)

  /** [[duplicateSpans]] SERVED from BOTH prebuilt index tables — gram
    * positions and the [[duplicatedGrams]] set. The per-run work drops
    * to semi-join + per-doc island window; the df aggregation is paid
    * once at index-build time.
    */
  def duplicateSpansFromIndex(grams: DataFrame, dup: DataFrame,
                              idCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = grams.join(dup, Seq("h"), "left_semi")
    val w = Window.partitionBy(idCol).orderBy("pos")
    hits
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) === 1, 0).otherwise(1))
      .withColumn("island", sum("brk").over(w))
      .groupBy(col(idCol), col("island"))
      .agg(min("pos").as("span_start"), count(lit(1)).as("n_grams"))
      .withColumn("span_tokens", col("n_grams") + (n - 1))
      .select(col(idCol), col("span_start"), col("n_grams"),
        col("span_tokens"))
  }

  /** SimHash: 60-bit signature over whitespace tokens (with multiplicity),
    * computed by the native one-pass [[graft.plans.Simhash60]] expression —
    * a NARROW projection with zero shuffle at any corpus size. The
    * token-less filter (`trim` = empty) matches the exploded reference
    * form ([[simhashAgg]]), where such docs simply produce no rows; it is
    * a cheap scan-side predicate, never a recompute of the signature.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 60): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge => B}
    // the token-less gate must trim the FULL Ws separator class, not
    // bare trim's ASCII space: a "\n"-only doc has zero tokens, and
    // letting it through would give every such doc signature 0 — all of
    // them pairing as hamming-0 near-dups of each other — while the
    // exploded form (and the oracle) emit no row at all
    docs.filter(length(trim(col(textCol), " \t\n\f\r")) > 0)
      .select(col(idCol),
        B.column(graft.plans.Simhash60(B.expression(col(textCol)), bits))
          .as("simhash"))
  }

  /** Reference formulation of [[simhash]] with built-ins only: explode
    * tokens, hash each, 60 per-bit ±1 sums in one map-side-combinable
    * aggregation. Kept as the cross-check for SimhashSpec (bit-identical
    * output) and as the fallback shape for engines without the native
    * expression; the doc×token row blow-up crosses an exchange here,
    * which is exactly what the native form eliminates.
    */
  def simhashAgg(docs: DataFrame, idCol: String, textCol: String,
                 bits: Int = 60): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextFns.words(col(textCol))).as("w"))
      .select(col(idCol), TextFns.hash60(col("w")).as("h"))
    val sums = (0 until bits).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"s_$j"))
    val agg = toks.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val sig = (0 until bits).map(j =>
      when(col(s"s_$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** The (chunk_idx, chunk_val) explosion every banded simhash join keys
    * on: signature split into `nChunks` pigeonhole chunks (widths
    * `bits/nChunks`, the first `bits%nChunks` one wider). ONE definition
    * shared by [[simhashPairs]], [[simhashPairsBetween]] and the skew
    * probe (tools.SaltProbe) — the probe must measure exactly the buckets
    * the joins shuffle on, so the layout cannot fork.
    */
  private[graft] def simhashChunks(sigs: DataFrame, idCol: String,
                                   nChunks: Int, bits: Int = 60): DataFrame = {
    val base = bits / nChunks
    val rem = bits % nChunks
    // chunk c covers [off(c), off(c)+width(c)) with widths base(+1 for first rem)
    val offsets = (0 until nChunks).scanLeft(0)((acc, c) =>
      acc + base + (if (c < rem) 1 else 0)).init
    val widths = (0 until nChunks).map(c => base + (if (c < rem) 1 else 0))
    sigs.select(col(idCol).as("id"), col("simhash"),
      explode(array((0 until nChunks).map { c =>
        struct(lit(c).as("chunk_idx"),
          shiftright(col("simhash"), offsets(c))
            .bitwiseAND(lit((1L << widths(c)) - 1)).as("chunk_val"))
      }: _*)).as("ch"))
      .select(col("id"), col("simhash"), col("ch.chunk_idx"),
        col("ch.chunk_val"))
  }

  /** Cross-side Hamming near-dup pairs: `left` signatures against `right`
    * signatures — the PROBE shape of an incremental simhash index (new
    * batch vs persisted corpus signatures), the simhash counterpart of
    * [[lshCandidatesBetween]]. Same (maxHamming+1)-chunk pigeonhole as
    * [[simhashPairs]] (lossless for the threshold); no `a < b` ordering
    * because the sides are disjoint by contract, and at scale the small
    * batch side broadcasts against the chunk-bucketed index.
    */
  def simhashPairsBetween(leftSigs: DataFrame, rightSigs: DataFrame,
                          idCol: String, maxHamming: Int,
                          bits: Int = 60): DataFrame = {
    val nChunks = maxHamming + 1
    def chunksOf(sigs: DataFrame): DataFrame =
      simhashChunks(sigs, idCol, nChunks, bits)
    chunksOf(leftSigs).as("l").join(chunksOf(rightSigs).as("r"),
        col("l.chunk_idx") === col("r.chunk_idx") &&
        col("l.chunk_val") === col("r.chunk_val"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Hamming-distance near-dup pairs over simhash signatures via
    * (maxHamming+1)-way pigeonhole banding: split the signature into
    * `maxHamming+1` bit chunks — any pair within `maxHamming` flips must
    * agree on at least one whole chunk — equi-join candidates on
    * (chunk_idx, chunk_value), then exact `bit_count(xor)` verify. Output
    * is IDENTICAL to the all-pairs cross join (banding is a lossless
    * candidate filter for this threshold), so the oracle stays the naive
    * form; the plan swaps an O(n²) nested-loop for a shuffled equi-join.
    */
  def simhashPairs(sigs: DataFrame, idCol: String, maxHamming: Int,
                   bits: Int = 60, salts: Int = AutoSalts): DataFrame = {
    val nChunks = maxHamming + 1
    // materialized: chunk rows feed both sides of the candidate self-join.
    // Eager localCheckpoint = the persist+count barrier (the self-join's
    // two sides otherwise both compute the cold simhash aggregation —
    // observed as a bimodal 1.2 s / 9.8 s runtime) without leaking a
    // CacheManager entry per call. An input that IS already a
    // checkpointed/materialized relation (DocIndex's served signature
    // table) skips the redundant copy ([[isMaterialized]]).
    val sigsP = if (isMaterialized(sigs)) sigs else sigs.localCheckpoint()
    val chunks = simhashChunks(sigsP, idCol, nChunks, bits)
    // `salts > 1` = the lossless salted self-join ([[saltedSides]]) for
    // boilerplate-heavy corpora whose hottest (chunk_idx, chunk_val)
    // outgrows AQE's skew split; the [[AutoSalts]] default derives the
    // factor from the chunk histogram (cheap here: chunks re-derive
    // narrowly from the materialized sigsP)
    val (lS, rS, saltCond) = saltedSides(chunks,
      resolveSalts(salts, chunks, Seq("chunk_idx", "chunk_val")), col("id"))
    lS.as("l").join(rS.as("r"),
        col("l.chunk_idx") === col("r.chunk_idx") &&
        col("l.chunk_val") === col("r.chunk_val") &&
        saltCond &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
