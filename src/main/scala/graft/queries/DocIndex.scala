package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Lake
import graft.operators.Dedup

/** ONE document-signature build per (session, lake dir), shared by every
  * query over the documents fixture — the d-side sibling of [[AnnEval]]'s
  * ANN index ("signatures served, not rebuilt"). The simhash signature is
  * a pure function of the text, so d05 (signatures), d06/d09 (hamming-8
  * pairs/clusters), d21 (hamming-4 survivorship) and the rep-restricted
  * pipelines (d24/d25 — a semi-join selects their vertex subset from the
  * same table) all read the SAME checkpointed `(doc_id, simhash)` table
  * instead of each re-running the corpus text pass.
  *
  * Scale story: what stays resident is bytes per corpus row (one long per
  * doc), exactly what a production near-dup service persists as its
  * signature index at write time; the memoization is the in-session
  * analogue. Components are lazy so a consumer is never charged for an
  * artifact it doesn't read.
  */
object DocIndex {

  /** The signature definition this producer computes — declared to
    * [[graft.operators.DocIndexStore]] on writes/appends so a later
    * session building signatures under different knobs (shingle k,
    * hash/band counts, simhash width, hash family) rejects loudly
    * instead of silently mixing incompatible rows into the banded joins.
    * Bump this string whenever any of those knobs changes.
    */
  val SigSpec: String =
    "simhash60(words);minhash(numHashes=8,numBands=2,shingle_k=5,affine-builtin)"

  final class Index(spark: SparkSession, dir: String) {
    /** The documents scan (spread when degenerate — Lake.spread) — a
      * plan, not a materialization.
      */
    lazy val docs: DataFrame = Lake.spread(
      Lake.table(spark, dir, "documents"),
      org.apache.spark.sql.functions.col("doc_id"))
    /** (doc_id, simhash), checkpointed: the one corpus text pass every
      * simhash consumer would otherwise repeat per run (and the banded
      * pair join consumes it on BOTH sides of a self-join).
      */
    lazy val simhash: DataFrame =
      Dedup.simhash(docs, "doc_id", "text").localCheckpoint()
    /** (doc_id, hs) char-5 hashed shingle-set arrays, checkpointed — the
      * set side of the d04/d16 verify joins.
      */
    lazy val shingleSets5: DataFrame =
      Dedup.shingleSets(docs, "doc_id", "text", 5).localCheckpoint()
    /** (a_id, b_id) rare-shingle candidates at maxDf=50 over
      * [[shingleSets5]], checkpointed — the shared candidate front end of
      * the Jaccard (d04) and containment (d16) pair queries: the
      * explode → document-frequency agg → semi-join → self-join chain is
      * the expensive half of both, and it is identical between them.
      */
    lazy val rareCandidates50: DataFrame =
      Dedup.rareShingleCandidatesFrom(shingleSets5, "doc_id", 50)
        .localCheckpoint()
    /** (doc_id, mh_0..mh_7, band_0, band_1) minhash signatures + band
      * hashes over [[shingleSets5]] (8 affine hashes, 2 bands — the
      * d02/d03/d22 configuration), checkpointed. Identical to the
      * straight-from-text form: min over the multiset equals min over
      * the distinct set.
      */
    lazy val minhashSigs: DataFrame =
      Dedup.minhashFromSets(shingleSets5, "doc_id").localCheckpoint()
    /** (doc_id, pos, h) hashed word-5-gram positions, checkpointed — the
      * front table of span-level dedup (d23): the df aggregation and the
      * dup semi-join both read it, and without the memo each d23 run
      * re-explodes the corpus text. One long + one int per gram
      * occurrence resident — the positional sibling of the signature
      * tables above.
      */
    lazy val wordGramPositions5: DataFrame =
      Dedup.gramPositions(docs, "doc_id", "text", 5).localCheckpoint()
    /** `(h)` grams shared by ≥2 documents over [[wordGramPositions5]],
      * checkpointed — the other half of the span index: the df
      * aggregation is the expensive per-run piece of d23, and like the
      * positions it is a pure function of the corpus, so the service
      * persists both and a span query is semi-join + island window only.
      */
    lazy val dupGrams5: DataFrame =
      Dedup.duplicatedGrams(wordGramPositions5, "doc_id", 2)
        .localCheckpoint()
    /** BPE merge table (3 steps) trained on the corpus, checkpointed —
      * a MODEL-sized (3-row) pure function of the text, the same
      * "train once at write time, serve every later query" artifact as
      * the signature tables: t18 gates the training algorithm and t21's
      * encode consumes the merges, so without the memo every t21 run
      * re-pays the 3-round corpus aggregation t18 already ran.
      */
    lazy val bpeMerges3: DataFrame =
      graft.operators.Bpe.train(docs, "text", steps = 3).localCheckpoint()
  }

  // weak-ref single-session memoizer shared with AnnEval — see
  // SessionCache for the discipline
  private val cache = new SessionCache[Index]

  def index(spark: SparkSession, dir: String): Index =
    cache.get(spark, dir)(new Index(spark, dir))
}
