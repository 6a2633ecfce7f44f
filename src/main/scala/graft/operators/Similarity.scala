package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (tiny) query set
  * against the full corpus, scored by the codegen'd
  * [[graft.plans.CosineSimilarity]] expression; one narrow pass + a top-k
  * window, no corpus shuffle.
  *
  * Scale path: IVF (inverted-file) — vectors are assigned to their nearest
  * centroid once (broadcast centroids, narrow argmax), and a query probes
  * only the `nprobe` closest partitions, cutting scored candidates by
  * ~|centroids|/nprobe. With the assignment persisted and partitioned by
  * `centroid_id`, probing prunes input partitions instead of scanning the
  * corpus.
  */
object Similarity {

  /** Centroid counts up to this bound are inlined as literals into one
    * narrow argmax projection; beyond it the generated code (k cosine
    * expressions per row) and the driver-resident literal set stop being
    * cheap, so assignment falls back to a broadcast join + keyed max.
    */
  private val MaxInlineCentroids = 64

  /** Hard cap on [[mmrRerank]]'s shortlist: the greedy fold collects
    * n·(n−1) pair similarities (~a few MB at 512) — the bound that keeps
    * "shortlist-collect" an honest contract rather than a comment.
    */
  val MaxMmrShortlist = 512

  /** Nearest-centroid assignment: argmax cosine, ties → smaller
    * centroid_id. The centroid set is small by IVF contract (it is the
    * trained "model", like a Spark ML KMeans model — k ≪ corpus), so for
    * k ≤ [[MaxInlineCentroids]] assignment is a NARROW per-row argmax —
    * `greatest` over one codegen'd cosine per centroid — with zero shuffle
    * and zero join. The crossJoin+window alternative materializes k× the
    * corpus through a corpus-wide shuffle just to immediately collapse it
    * back. Larger centroid sets degrade gracefully: a broadcast cross-join
    * scores k candidates per row and a map-side-combined `max(struct)` per
    * vec_id collapses them — bounded driver memory (`take`, never a full
    * collect) and no generated-code blowup.
    *
    * Columns beyond (vec_id, vec) ride through unchanged on BOTH paths —
    * a caller that needs per-row metadata next to the assignment (s05's
    * label) keeps it in place instead of paying a corpus-corpus join on
    * vec_id to re-attach it afterwards.
    */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val centsDf = centroids.select(col("centroid_id").cast("long"), col("cvec"))
    val head = centsDf.take(MaxInlineCentroids + 1)
    require(head.nonEmpty,
      "ivfAssign: centroid set is empty — provide at least one trained centroid")
    val extras = emb.columns.filterNot(c => c == "vec_id" || c == "vec").toSeq
    // "cvec" included: it would be AMBIGUOUS against the broadcast
    // centroid side's cvec on the >MaxInlineCentroids cross-join path
    val reserved = extras.filter(Set("centroid_id", "cos", "neg_id", "cvec"))
    require(reserved.isEmpty,
      s"ivfAssign: input columns ${reserved.mkString(", ")} collide with " +
        "the assignment's output/struct fields — rename them before assigning")
    if (head.length <= MaxInlineCentroids) {
      val cents = head
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      // struct max-ordering is lexicographic (cos, then -centroid_id), so the
      // max struct is highest cosine with ties to the SMALLEST centroid_id
      val scored = cents.map { case (id, v) =>
        struct(VectorFns.cosine(col("vec"), lit(v)).as("cos"),
          lit(-id).as("neg_id"))
      }
      val best =
        if (scored.length == 1) scored.head
        else greatest(scored.toIndexedSeq: _*)
      emb.select(col("vec_id") +: (-best.getField("neg_id")).as("centroid_id") +:
          col("vec") +: extras.map(col): _*)
    } else {
      // group by vec_id ONLY (it is the vector's unique key by operator
      // contract): grouping by the vec array would both collapse duplicate
      // rows the inline path preserves and run the float array through
      // NormalizeFloatingNumbers (-0.0/NaN canonicalization), changing the
      // emitted vec bytes on this path only. vec (and any extra columns)
      // ride inside the max struct — (cos, neg_id) is already unique per
      // centroid, so they never decide the ordering — and the shuffle key
      // stays narrow.
      emb.crossJoin(broadcast(centsDf))
        .select(col("vec_id"),
          struct(VectorFns.cosine(col("vec"), col("cvec")).as("cos") +:
            (-col("centroid_id")).as("neg_id") +: col("vec").as("vec") +:
            extras.map(col): _*).as("s"))
        .groupBy("vec_id")
        .agg(max(col("s")).as("m"))
        .select(col("vec_id") +: (-col("m.neg_id")).as("centroid_id") +:
          col("m.vec").as("vec") +: extras.map(c => col(s"m.$c").as(c)): _*)
    }
  }

  /** Rank k pre-limited survivors without a window: a global window (even
    * over k rows) plans as an unpartitioned WindowExec (Spark 4's
    * EliminateWindowPartitions folds away constant partition keys);
    * collecting k rows into one sorted array is explicit about the
    * driver-scale cardinality instead. `sortKey` must order ASCENDING =
    * better; `score(sortKey)` recovers the output score column.
    */
  private def rankCollected(limited: DataFrame, sortKey: Column,
                            scoreName: String,
                            score: Column => Column): DataFrame =
    limited
      .agg(sort_array(collect_list(
        struct(sortKey.as("k"), col("vec_id").as("vec_id")))).as("a"))
      .select(posexplode(col("a")).as(Seq("pos", "s")))
      .select((col("pos") + 1).as("rank"), col("s.vec_id").as("vec_id"),
        score(col("s.k")).as(scoreName))

  /** Rank the top-k of a scored corpus WITHOUT a global window: the
    * `orderBy().limit(k)` plans as `TakeOrderedAndProject` — each input
    * partition keeps its local top-k and only k×partitions candidate rows
    * ever leave the scan stage — then [[rankCollected]] labels the k
    * survivors from one sorted k-row array. The naive global
    * `row_number().over(Window.orderBy(...))` form instead funnels every
    * scored row through a single-partition WindowExec — the #1 scale trap
    * for top-k on a 100 TB corpus.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    rankCollected(
      scored.orderBy(col("cos").desc, col("vec_id").asc).limit(k),
      -col("cos"), "cosine", kc => round(-kc, 6))

  /** Brute-force top-k for one query vector (DataFrame `query(qvec)` with
    * exactly one row). Deterministic order: cosine desc, vec_id asc.
    */
  def bruteForceTopK(emb: DataFrame, query: DataFrame, k: Int,
                     excludeId: Option[Long] = None): DataFrame = {
    val base = excludeId.map(id => emb.filter(col("vec_id") =!= id)).getOrElse(emb)
    val scored = base.crossJoin(broadcast(query))
      .withColumn("cos", VectorFns.cosine(col("vec"), col("qvec")))
    rankTopK(scored, k)
  }

  /** IVF top-k: probe the `nprobe` centroids closest to the query, score
    * only vectors assigned to them.
    */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, query: DataFrame,
              k: Int, nprobe: Int, excludeId: Option[Long] = None): DataFrame = {
    val probed = centroids.crossJoin(broadcast(query))
      .withColumn("ccos", VectorFns.cosine(col("cvec"), col("qvec")))
      .orderBy(col("ccos").desc, col("centroid_id").asc).limit(nprobe)
      .select("centroid_id")
    val base = excludeId.map(id => assigned.filter(col("vec_id") =!= id)).getOrElse(assigned)
    val bucket = base.join(broadcast(probed), "centroid_id")
    rankTopK(
      bucket.crossJoin(broadcast(query))
        .withColumn("cos", VectorFns.cosine(col("vec"), col("qvec"))),
      k)
  }

  /** [[ivfTopK]] against the PERSISTED index shape — `assigned` is the
    * bytes-per-row `(vec_id, centroid_id)` lake table and the
    * full-precision vectors live only in the corpus `emb`
    * (AnnIndexStore's storage contract). Order matters at lake scale:
    * restrict the ASSIGNMENT by the probed buckets first (a broadcast
    * join against the narrow table — the only corpus-wide work is that
    * bytes-per-row scan), then attach vectors to the SHORTLIST only.
    * The naive compose — `assigned.join(emb, "vec_id")` then bucket-
    * restrict — pays a corpus-wide join per query for a two-bucket
    * probe, and Catalyst cannot reorder it because the bucket
    * restriction is itself a join (against the limit-derived probe set),
    * not a pushable literal predicate. Same results as [[ivfTopK]] row
    * for row (s16/s17 keep s02's oracle); the shortlist⨝emb join stays
    * one corpus SCAN with AQE free to broadcast the bucket-sized
    * shortlist — never a corpus-wide shuffle of the vectors.
    */
  def ivfTopKIndexed(assigned: DataFrame, emb: DataFrame,
                     centroids: DataFrame, query: DataFrame, k: Int,
                     nprobe: Int, excludeId: Option[Long] = None): DataFrame = {
    val probed = centroids.crossJoin(broadcast(query))
      .withColumn("ccos", VectorFns.cosine(col("cvec"), col("qvec")))
      .orderBy(col("ccos").desc, col("centroid_id").asc).limit(nprobe)
      .select("centroid_id")
    val base = excludeId.map(id => assigned.filter(col("vec_id") =!= id))
      .getOrElse(assigned)
    val shortlist = base.join(broadcast(probed), "centroid_id")
      .select("vec_id")
    val bucket = emb.select("vec_id", "vec").join(shortlist, "vec_id")
    rankTopK(
      bucket.crossJoin(broadcast(query))
        .withColumn("cos", VectorFns.cosine(col("vec"), col("qvec"))),
      k)
  }

  /** Random-hyperplane LSH signature: bit i = sign(v · hyperplane_i).
    * `hyperplanes(hp_id, hvec)` is tiny (broadcast); one narrow pass over
    * the corpus yields an integer bucket signature — Hamming-close
    * signatures ≈ cosine-close vectors, so equal-signature bucketing is
    * the candidate filter for cosine search at corpus scale (the
    * alternative to IVF when no centroids exist).
    */
  def hyperplaneSignatures(emb: DataFrame, hyperplanes: DataFrame): DataFrame = {
    // hp_id is a BIT POSITION in a positive Long: shiftleft wraps mod 64
    // past 63 (aliased bits whose sum() carries corrupt EVERY signature
    // silently), and bit 63 is the sign bit — a negative bucket_sig would
    // break the positive-Long signature convention the banded consumers
    // share. The hyperplane table is model-sized, so the guard is a free
    // driver-side check; sum() == bit_or for distinct positions < 63.
    val ids = hyperplanes.select(col("hp_id").cast("long"))
      .collect().map(_.getLong(0))
    require(ids.distinct.length == ids.length,
      "hyperplaneSignatures: hp_id must be unique (duplicate bit positions" +
        " would carry-corrupt the summed signature)")
    require(ids.forall(id => id >= 0 && id <= 62),
      s"hyperplaneSignatures: hp_id must be in [0, 62], got " +
        s"${ids.filterNot(id => id >= 0 && id <= 62).mkString(", ")} — " +
        "shiftleft wraps mod 64 and bit 63 is the sign bit")
    emb.crossJoin(broadcast(hyperplanes))
      .withColumn("bit",
        when(VectorFns.cosine(col("vec"), col("hvec")) >= 0,
          expr("shiftleft(1L, cast(hp_id as int))")).otherwise(0L))
      .groupBy("vec_id")
      .agg(sum(col("bit")).as("bucket_sig"))
  }

  /** LSH-bucketed top-k against a PRECOMPUTED signature table — the
    * at-scale form: the index (`sigs`) is built once ([[hyperplaneSignatures]],
    * persisted/partitioned by `bucket_sig`) and probed by many queries,
    * so a query costs one bucket's worth of scoring, not a corpus pass.
    */
  def lshTopKIndexed(emb: DataFrame, sigs: DataFrame, queryId: Long,
                     k: Int): DataFrame = {
    // resolve the query's signature on the DRIVER — one row off the
    // (vec_id-filtered) signature table. Two reasons: (a) an absent
    // queryId fails LOUDLY like every other contract guard in this file,
    // instead of returning an empty frame indistinguishable from "no
    // similar documents" when probing a stale index; (b) the bucket
    // predicate becomes a LITERAL, so it pushes into the index scan —
    // partition pruning on a bucket_sig-partitioned store — where the
    // former crossJoin(broadcast(qSig)) carried a runtime column no scan
    // could prune by.
    val qRows = sigs.filter(col("vec_id") === queryId)
      .select("bucket_sig").limit(1).collect()
    require(qRows.nonEmpty,
      s"lshTopKIndexed: queryId $queryId is not in the signature index — " +
        "stale or mismatched index? rebuild it (hyperplaneSignatures) or " +
        "ingest the vector before probing")
    val qSig = qRows.head.getLong(0)
    // bucket FIRST: the narrow signature table prunes to one bucket
    // BEFORE any corpus join — joining emb⨝sigs first would pay a
    // corpus-by-corpus shuffle join per query, which is exactly the
    // corpus pass the docstring promises to avoid. The surviving bucket
    // is broadcast into a pruning hash join against emb (bucket-sized by
    // the LSH contract; a degenerate all-one-bucket corpus needs more
    // hyperplanes, not a bigger broadcast).
    val bucketIds = sigs
      .filter(col("bucket_sig") === lit(qSig) && col("vec_id") =!= queryId)
      .select("vec_id")
    val query = emb.filter(col("vec_id") === queryId)
      .select(col("vec").as("qvec"))
    rankTopK(
      emb.join(broadcast(bucketIds), "vec_id").crossJoin(broadcast(query))
        .withColumn("cos", VectorFns.cosine(col("vec"), col("qvec"))),
      k)
  }

  /** Convenience form: derives the signature table inline. The derived
    * table is MATERIALIZED first (localCheckpoint — the [[graft.operators.Dedup]]
    * self-join rule): lshTopKIndexed consumes it twice (the driver-side
    * q_sig lookup + the bucket scan), and an unmaterialized signature
    * build would re-run its corpus-wide crossJoin+aggregation per
    * consumption. Use [[lshTopKIndexed]] with a persisted signature
    * table when more than one query probes the same corpus.
    */
  def lshTopK(emb: DataFrame, hyperplanes: DataFrame, queryId: Long,
              k: Int): DataFrame =
    lshTopKIndexed(emb,
      hyperplaneSignatures(emb, hyperplanes).localCheckpoint(), queryId, k)

  /** EXACT embedding near-duplicate pairs: all pairs with cosine ≥
    * threshold. The `a<b` theta self-join is an O(n²)
    * BroadcastNestedLoopJoin — correct as the small-corpus oracle
    * baseline / ground truth for recall evaluation, NOT the scale path.
    * GUARDED: callers must opt in with `allowQuadratic = true`, so no
    * pipeline reaches the nested-loop plan by accident — at corpus scale
    * use [[bucketedNearDupPairs]] (candidates from an equi-join, no
    * nested-loop anywhere in the plan; e03 measures its recall against
    * this exact form).
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
                         allowQuadratic: Boolean = false): DataFrame = {
    require(allowQuadratic,
      "cosineNearDupPairs is the O(n²) exact baseline (BroadcastNestedLoop" +
        "Join): pass allowQuadratic=true to opt in on a small corpus, or " +
        "use bucketedNearDupPairs for the scale path")
    emb.as("l").join(emb.as("r"), col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", VectorFns.cosine(col("l.vec"), col("r.vec")))
      .filter(col("cos") >= threshold)
      .select(col("l.vec_id").as("a_id"), col("r.vec_id").as("b_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** MULTI-PROBE assignment: each vector lands in its `nprobe` nearest
    * centroid buckets (cosine desc, ties → smaller centroid_id; rank 1
    * equals [[ivfAssign]]'s argmax — SimilaritySpec pins the equality).
    * Same inline contract as [[ivfAssign]]: for k ≤ [[MaxInlineCentroids]]
    * the centroids are literals and the whole assignment is ONE narrow
    * codegen'd projection — per-row `sort_array` over k (cos, id) structs,
    * `slice` the top `nprobe`, explode — zero shuffle, zero join at any
    * corpus size. Beyond the bound it degrades to the broadcast
    * cross-score + per-vector window rank (partition-parallel, no global
    * sort). This is the recall lever of the bucketed near-dup path: a
    * pair straddling a centroid boundary meets in the straddled
    * neighbor's bucket (FAISS's IVF multi-probe trade — candidate cost
    * ×nprobe for recall), and e03 measures exactly that lift.
    */
  def ivfAssignMulti(emb: DataFrame, centroids: DataFrame,
                     nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"ivfAssignMulti: nprobe $nprobe must be >= 1")
    val centsDf = centroids.select(col("centroid_id").cast("long"), col("cvec"))
    val head = centsDf.take(MaxInlineCentroids + 1)
    require(head.nonEmpty,
      "ivfAssignMulti: centroid set is empty — provide at least one trained centroid")
    // the ivfAssign reserved-column guard, for the same reason: without
    // it an input carrying e.g. `centroid_id` sails through the inline
    // path and only dies (ambiguous reference) once the centroid count
    // crosses MaxInlineCentroids and the cross-join path engages — a
    // scale-triggered failure the guard exists to surface immediately
    val reserved = emb.columns
      .filterNot(c => c == "vec_id" || c == "vec")
      .filter(Set("centroid_id", "cos", "cvec", "__rn"))
    require(reserved.isEmpty,
      s"ivfAssignMulti: input columns ${reserved.mkString(", ")} collide " +
        "with the assignment's output/rank fields — rename them first")
    if (head.length <= MaxInlineCentroids) {
      val cents = head
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      // ascending lexicographic sort of (-cos, id) structs = cosine desc,
      // ties to the smaller centroid_id — the ivfAssign tie rule
      val entries = cents.map { case (id, v) =>
        struct((-VectorFns.cosine(col("vec"), lit(v))).as("neg_cos"),
          lit(id).as("centroid_id"))
      }
      emb.select(col("vec_id"),
          explode(slice(sort_array(array(entries.toIndexedSeq: _*)), 1, nprobe))
            .as("p"))
        .select(col("vec_id"), col("p.centroid_id"))
    } else {
      val w = Window.partitionBy("vec_id")
        .orderBy(col("cos").desc, col("centroid_id").asc)
      emb.crossJoin(broadcast(centsDf))
        .withColumn("cos", VectorFns.cosine(col("vec"), col("cvec")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= nprobe)
        .select(col("vec_id"), col("centroid_id"))
    }
  }

  /** Multi-probe variant of [[bucketedNearDupPairs]]: candidates are pairs
    * sharing ANY of their `nprobe` assigned buckets (distinct'd — a pair
    * can co-occur in up to `nprobe` buckets), then the exact cosine
    * verify. Still equi-join candidates only — Σ(nprobe·bucket)² work, no
    * BroadcastNestedLoopJoin — with strictly higher recall than the
    * single-probe form at ×nprobe candidate cost.
    */
  def bucketedNearDupPairsMulti(emb: DataFrame, centroids: DataFrame,
                                threshold: Double, nprobe: Int): DataFrame =
    bucketedNearDupPairsFromAssigned(
      ivfAssignMulti(emb, centroids, nprobe), emb, threshold)

  /** [[bucketedNearDupPairsMulti]] SERVED from a prebuilt assignment
    * (`(vec_id, centroid_id)`, one row per probe) instead of re-assigning
    * the corpus per call — the index-sharing form (AnnEval): the
    * assignment is the expensive self-joined side (an unmaterialized one
    * recomputes its corpus×k cosine scan once per join side), so callers
    * pass the checkpointed/persisted table an index build produced once.
    */
  def bucketedNearDupPairsFromAssigned(assigned: DataFrame, emb: DataFrame,
                                       threshold: Double): DataFrame = {
    val a = assigned.select("vec_id", "centroid_id")
    val cands = a.as("l").join(a.as("r"),
        col("l.centroid_id") === col("r.centroid_id") &&
        col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a_id"), col("r.vec_id").as("b_id"))
      .distinct()
    cands
      .join(emb.select(col("vec_id").as("a_id"), col("vec").as("va")), "a_id")
      .join(emb.select(col("vec_id").as("b_id"), col("vec").as("vb")), "b_id")
      .withColumn("cos", VectorFns.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cosine"))
  }

  /** IVF-BUCKETED near-duplicate pairs — the 100 TB form of
    * [[cosineNearDupPairs]]. Semantics are bucketed-exact (the FAISS-IVF
    * contract): candidate pairs are vectors assigned to the SAME nearest
    * centroid (deterministic argmax, ties → smaller id — [[ivfAssign]]);
    * each candidate is verified with the exact codegen'd cosine. The
    * candidate step is a hash equi-join on `centroid_id`, so total work is
    * Σ bucket², not n² — and the physical plan contains no
    * BroadcastNestedLoopJoin (PlanSpec asserts this). Dense embeddings
    * admit no lossless pigeonhole on cosine (unlike d06's Hamming
    * banding), so cross-bucket recall is a semantic parameter of the
    * operator, tuned via the centroid count/quality — identical to how
    * IVF trades recall for probe cost in s02.
    */
  def bucketedNearDupPairs(emb: DataFrame, centroids: DataFrame,
                           threshold: Double): DataFrame = {
    val assigned = ivfAssign(emb, centroids)
    assigned.as("l").join(assigned.as("r"),
        col("l.centroid_id") === col("r.centroid_id") &&
        col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", VectorFns.cosine(col("l.vec"), col("r.vec")))
      .filter(col("cos") >= threshold)
      .select(col("l.vec_id").as("a_id"), col("r.vec_id").as("b_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** PQ asymmetric-distance top-k (ADC — Jégou 2011 §III): the query
    * stays full-precision; every corpus vector is represented ONLY by its
    * PQ codes, and the approximate squared L2 distance is a sum of
    * per-subspace table lookups. The lookup tables (numSub × |codebook|
    * query-to-code distances) are computed on the driver from the query
    * and codebook — model data — and inlined as literals, so scoring a
    * vector is `numSub` array lookups + adds in one codegen'd narrow
    * projection over the (tiny) code table: the plan never touches the
    * original vectors. This is the memory story of PQ at 100 TB — the
    * index scanned per query is codes (bytes/vector), not floats.
    * Deterministic: distances rounded to 6 dp, ties → smaller vec_id.
    */
  def pqTopK(codes: DataFrame, codebook: Seq[Array[Double]], numSub: Int,
             query: Array[Double], k: Int,
             excludeId: Option[Long] = None): DataFrame = {
    val dim = codebook.head.length
    // same split contract as pqEncode — a mismatched numSub would
    // floor-truncate subDim, misalign every subspace boundary against
    // the encoded codes, and return confidently-ranked garbage
    require(dim % numSub == 0,
      s"pqTopK: codebook dim $dim not divisible by numSub $numSub — must " +
        "match the numSub the codes were pqEncode'd with")
    require(query.length == dim,
      s"pqTopK: query length ${query.length} != codebook dim $dim")
    val subDim = dim / numSub
    // lookup[m][j] = ||query_sub(m) - codebook(j)_sub(m)||^2
    val lookup = (0 until numSub).map { m =>
      codebook.map { cv =>
        (0 until subDim).map { i =>
          val d = query(m * subDim + i) - cv(m * subDim + i)
          d * d
        }.sum
      }.toArray
    }
    val approx = (0 until numSub).map(m =>
      element_at(lit(lookup(m)), col(s"code_$m").cast("int") + 1))
      .reduce(_ + _)
    val base = excludeId.map(id => codes.filter(col("vec_id") =!= id))
      .getOrElse(codes)
    rankCollected(
      base.select(col("vec_id"), round(approx, 6).as("approx_d2"))
        .orderBy(col("approx_d2").asc, col("vec_id").asc).limit(k),
      col("approx_d2"), "approx_d2", identity)
  }

  /** IVF + PQ asymmetric search composed (Jégou 2011 §IV — the FAISS
    * `IVFPQ` production shape): the coarse quantizer restricts WHICH
    * codes get scored — only vectors assigned to the query's top-`nprobe`
    * centroid buckets — and ADC ranks those vectors' PQ codes; the
    * full-precision corpus vectors are never read at query time. The
    * probe set is nprobe ids collected from the centroid MODEL (k ≪
    * corpus, [[ivfAssign]]'s contract; same deterministic cosine ordering
    * as the assignment side) and pushed as an `isin` filter on the
    * assignment — a scan-prunable predicate, no join — so a query scores
    * ~(n/k)·nprobe code rows out of n. This is the memory AND compute
    * story at 100 TB: bytes-per-vector codes, bucket-pruned.
    */
  def ivfPqTopK(emb: DataFrame, centroids: DataFrame,
                codebook: Seq[Array[Double]], numSub: Int,
                query: Array[Double], k: Int, nprobe: Int,
                excludeId: Option[Long] = None): DataFrame =
    ivfPqTopKFromCodes(pqEncode(emb, codebook, numSub),
      ivfAssign(emb, centroids).select("vec_id", "centroid_id"),
      centroids, codebook, numSub, query, k, nprobe, excludeId)

  /** [[ivfPqTopK]] over a PRECOMPUTED code table + IVF assignment — the
    * form an index consumer actually holds (codes and assignments are
    * built once at index time, then served for every query / every
    * nprobe setting; s13 shares one `pqEncode` + one `ivfAssign` across
    * its three eval rows this way instead of re-encoding per call).
    */
  def ivfPqTopKFromCodes(codes: DataFrame, assigned: DataFrame,
                         centroids: DataFrame,
                         codebook: Seq[Array[Double]], numSub: Int,
                         query: Array[Double], k: Int, nprobe: Int,
                         excludeId: Option[Long] = None): DataFrame = {
    val probed = centroids
      .withColumn("cos", VectorFns.cosine(col("cvec"), lit(query)))
      .orderBy(col("cos").desc, col("centroid_id").asc)
      .limit(nprobe).select(col("centroid_id").cast("long"))
      .collect().map(_.getLong(0))
    val bucketed = codes.join(assigned, "vec_id")
      .filter(col("centroid_id").isin(probed.toIndexedSeq: _*))
    pqTopK(bucketed, codebook, numSub, query, k, excludeId)
  }

  /** Coarse-to-fine search — the FAISS refine stage on top of [[ivfPqTopK]]
    * (Jégou 2011 §V.A, the `IndexRefineFlat` composition): the IVFPQ
    * shortlist (bucket-pruned ADC over codes, `kCoarse` candidates) is
    * re-ranked EXACTLY against the full-precision vectors of the
    * shortlist ONLY. Query cost stays bucket-pruned code scans plus
    * `kCoarse` full-vector reads (the shortlist broadcast-joins back to
    * the corpus — a k-row probe, never a corpus-wide full-precision
    * pass), and the quantization error that reorders ADC's top ranks is
    * corrected wherever the true neighbor made the shortlist at all:
    * recall@k of the refined result equals the shortlist's recall@kCoarse,
    * the standard coarse→fine trade.
    */
  def ivfPqRefineTopK(emb: DataFrame, centroids: DataFrame,
                      codebook: Seq[Array[Double]], numSub: Int,
                      query: Array[Double], k: Int, kCoarse: Int,
                      nprobe: Int,
                      excludeId: Option[Long] = None): DataFrame =
    ivfPqRefineTopKFromCodes(emb, pqEncode(emb, codebook, numSub),
      ivfAssign(emb, centroids).select("vec_id", "centroid_id"),
      centroids, codebook, numSub, query, k, kCoarse, nprobe, excludeId)

  /** [[ivfPqRefineTopK]] over a PRECOMPUTED code table + IVF assignment —
    * the served-index form (same contract as [[ivfPqTopKFromCodes]]):
    * codes and assignments are built once at index time; a query costs
    * bucket-pruned code scans plus `kCoarse` full-vector reads.
    */
  def ivfPqRefineTopKFromCodes(emb: DataFrame, codes: DataFrame,
                               assigned: DataFrame, centroids: DataFrame,
                               codebook: Seq[Array[Double]], numSub: Int,
                               query: Array[Double], k: Int, kCoarse: Int,
                               nprobe: Int,
                               excludeId: Option[Long] = None): DataFrame = {
    require(kCoarse >= k, s"refine: kCoarse $kCoarse must be >= k $k")
    val shortlist = ivfPqTopKFromCodes(codes, assigned, centroids, codebook,
      numSub, query, kCoarse, nprobe, excludeId).select("vec_id")
    val d2 = aggregate(
      zip_with(col("vec"), lit(query), (a, b) => (a - b) * (a - b)),
      lit(0.0d), _ + _)
    val scored = emb.join(broadcast(shortlist), "vec_id")
      .select(col("vec_id"), round(d2, 6).as("d2"))
    rankCollected(scored.orderBy(col("d2").asc, col("vec_id").asc).limit(k),
      col("d2"), "d2", identity)
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR '98):
    * retrieve a relevance shortlist, then greedily pick k items maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s)` — the standard
    * diversity-aware serving step after ANN retrieval (RAG context
    * selection, dedup-aware search results).
    *
    * Scale shape: the only corpus-sized work is the shortlist itself — the
    * same single `TakeOrderedAndProject` pass as [[bruteForceTopK]] (swap
    * in an IVF/PQ shortlist at larger corpora; the re-rank is agnostic to
    * how the n candidates were found). Everything after operates on the
    * n-row shortlist: the n·(n−1) pair similarities are one broadcast
    * self-join of a k-row-scale frame, and the greedy selection is an
    * O(k·n) fold over collected METADATA (shortlist rows + their pair
    * sims — the documented shortlist-collect pattern, never a corpus
    * collect). That contract is ENFORCED: `n` is capped at
    * [[MaxMmrShortlist]] (n·(n−1) collected pair sims stay a few MB) and
    * `k ≤ n`, so an oversized request fails loudly instead of silently
    * becoming a quadratic driver collect. The greedy step is inherently
    * sequential (pick t depends on picks 1..t−1), so no distributed form
    * exists; keeping it on the driver is the honest plan.
    *
    * Scoring convention: the FIRST pick (empty picked set) has no
    * diversity term and reports its RAW relevance as its score — not
    * λ·rel — matching the original formulation's degenerate first step
    * (the max over an empty picked set is undefined, not 0). Oracles
    * mirroring this fold must replicate exactly that branch, or rank 1's
    * score mismatches whenever λ ≠ 1.
    *
    * Cross-engine determinism: rel/sim come from the same codegen'd
    * [[graft.plans.CosineSimilarity]] the oracle mirrors; the score uses
    * `λ·rel − (1−λ)·maxsim` with both factors computed in DOUBLE (the
    * oracle spells `1::DOUBLE − λ::DOUBLE` so the IEEE value of `1−λ`
    * matches the JVM's exactly); ties break on vec_id; rounding happens
    * once, at output, through Spark's `round` (HALF_UP, as everywhere).
    */
  def mmrRerank(emb: DataFrame, query: DataFrame, n: Int, k: Int,
                lambda: Double, excludeId: Option[Long] = None): DataFrame = {
    require(n >= 1 && n <= MaxMmrShortlist,
      s"mmrRerank: shortlist n=$n outside [1, $MaxMmrShortlist] — the " +
        "greedy fold collects n·(n−1) pair similarities to the driver")
    require(k >= 1 && k <= n, s"mmrRerank: k=$k outside [1, n=$n]")
    val spark = emb.sparkSession
    val base = excludeId.map(id => emb.filter(col("vec_id") =!= id)).getOrElse(emb)
    val shortlist = base.crossJoin(broadcast(query))
      .select(col("vec_id"), col("vec"),
        VectorFns.cosine(col("vec"), col("qvec")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(n)
      .localCheckpoint() // two consumers: rel collect + pair self-join
    val lhs = shortlist.select(col("vec_id").as("a"), col("vec").as("av"))
    val rhs = shortlist.select(col("vec_id").as("b"), col("vec").as("bv"))
    val rels = shortlist.select("vec_id", "rel").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val sims = lhs.join(broadcast(rhs), col("a") =!= col("b"))
      .select(col("a"), col("b"), VectorFns.cosine(col("av"), col("bv")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val oneMinus = 1 - lambda // single IEEE subtraction, mirrored in SQL
    var picked = Vector.empty[(Int, Long, Double, Double)]
    var remaining = rels.sortBy(_._1).toVector
    // running max-sim per remaining candidate, updated only against the
    // single newly-picked item each step: the same max (associative, and
    // folded with the collection Ordering so a NaN behaves as the .max
    // call did) in O(n·k) lookups instead of rescanning the whole picked
    // set per candidate per step (O(n·k²) at the n=k=512 ceiling)
    val maxSim = scala.collection.mutable.HashMap.empty[Long, Double]
    for (step <- 1 to math.min(k, rels.length)) {
      val scored = remaining.map { case (id, rel) =>
        val score =
          if (picked.isEmpty) rel
          else lambda * rel - oneMinus * maxSim(id)
        (id, rel, score)
      }
      val best = scored.reduceLeft { (x, y) =>
        if (y._3 > x._3 || (y._3 == x._3 && y._1 < x._1)) y else x
      }
      picked :+= ((step, best._1, best._2, best._3))
      remaining = remaining.filterNot(_._1 == best._1)
      remaining.foreach { case (id, _) =>
        val s = sims((id, best._1))
        maxSim(id) = maxSim.get(id).fold(s)(cur => List(cur, s).max)
      }
    }
    import spark.implicits._
    picked.toDF("rank", "vec_id", "rel_raw", "score_raw")
      .select(col("rank"), col("vec_id"), round(col("rel_raw"), 6).as("rel"),
        round(col("score_raw"), 6).as("score"))
      .orderBy("rank")
  }

  /** Product-quantization encode (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): split each vector into
    * `numSub` contiguous subspaces and replace every subvector with the id
    * of its nearest codebook entry (squared-L2, ties → smaller code id).
    * Output: `(vec_id, code_0..code_{numSub-1}, recon_err)` where
    * `recon_err` is the total squared reconstruction error — the memory
    * step that makes 100 TB of embeddings searchable: 64 floats (256 B)
    * compress to `numSub` small ints, so a billion-vector index fits in
    * executor memory while IVF (s02) prunes which codes get scored.
    *
    * The codebook is model data by the same contract as [[ivfAssign]]'s
    * centroids (trained offline, k ≪ corpus); it is inlined as literals,
    * so encoding is ONE narrow codegen'd projection — per-row arithmetic
    * only, zero shuffle, zero join at any corpus size. Distances compare
    * rounded to 6 dp (argmin stability across summation orders); the
    * chosen subspace errors accumulate unrounded.
    */
  def pqEncode(emb: DataFrame, codebook: Seq[Array[Double]],
               numSub: Int): DataFrame = {
    val dim = codebook.head.length
    require(dim % numSub == 0, s"pqEncode: dim $dim not divisible by $numSub")
    val subDim = dim / numSub
    // STAGED through projection boundaries (the langIdFromWords
    // discipline): the old one-projection form repeated each subspace's
    // codebook-distance subtree ~4× — inside the rounded argmin array,
    // inside array_min's copy of it, and again in the chosen-error
    // element_at — so the plan carried ~4 × numSub × |codebook| × subDim
    // squared-difference terms and the wall was PLANNING, not work
    // (round-21 profile: s10 at 1.15 s wall / 0.25 s task time / 3 jobs).
    // Staging computes each distance array once; every staged column is
    // non-cheap and referenced more than once, so CollapseProject keeps
    // the boundaries. Values are bit-identical — same arithmetic in the
    // same order (SimilaritySpec pins argmin, tie-break and recon_err;
    // the s10/s12/s13 oracles pin it cross-engine).
    def dCol(m: Int) = s"__pq_d_$m"
    def pCol(m: Int) = s"__pq_p_$m"
    // stage 1: per-subspace raw squared-L2 distances to every codebook
    // entry, each computed exactly once
    val withD = (0 until numSub).foldLeft(emb) { (df, m) =>
      df.withColumn(dCol(m), array(codebook.map { cv =>
        (0 until subDim).map { i =>
          val d = element_at(col("vec"), m * subDim + i + 1) -
            lit(cv(m * subDim + i))
          d * d
        }.reduce(_ + _)
      }: _*))
    }
    // stage 2: 1-based position of the FIRST minimum of the 6-dp-rounded
    // distances == argmin with ties to the smallest code id
    val withP = (0 until numSub).foldLeft(withD) { (df, m) =>
      val rounded = array((1 to codebook.length).map(i =>
        round(element_at(col(dCol(m)), i), 6)): _*)
      df.withColumn(pCol(m), array_position(rounded, array_min(rounded)))
    }
    // final projection: the code ids and the UNROUNDED chosen errors,
    // summed in subspace order exactly as before
    withP.select(
      (col("vec_id") +: (0 until numSub).map(m =>
        (col(pCol(m)) - 1).as(s"code_$m"))) :+
        round((0 until numSub).map(m =>
          element_at(col(dCol(m)), col(pCol(m)).cast("int")))
          .reduce(_ + _), 6).as("recon_err"): _*)
  }
}
