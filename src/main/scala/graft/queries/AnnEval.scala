package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Lake
import graft.functions.VectorFns
import graft.operators.Similarity

/** ONE ANN index build per (session, lake dir), shared by every query
  * over the s-family index fixture (s02, s03, s07, s12, s13, s14). The
  * evals previously each rebuilt the IVF assignment / PQ code table /
  * LSH signature table from the corpus — an index build per
  * measurement of the SAME index, the per-query-rebuild anti-pattern
  * the `FromCodes`/`Indexed` operator variants exist to avoid. Here the
  * build (coarse centroids, PQ codebook, query vector, code table,
  * assignment, LSH signatures) happens once and is memoized for the
  * session.
  *
  * Scale story: what stays resident is exactly what a production ANN
  * service keeps — the MODEL (8 centroids, 4 codebook rows, one query)
  * on the driver, and the INDEX (codes: a few small ints per vector;
  * assignment: two longs per vector) as localCheckpoint'd partitions,
  * bytes per corpus row, never the full-precision vectors. On a real
  * lake the same artifacts persist as tables written at index time; the
  * memoization is the in-session analogue.
  *
  * Fixture contract (shared by the DuckDB oracles of all three evals):
  * centroids = vectors 0..7, codebook = vectors 0..3 (8 subspaces),
  * query = vector 0.
  */
object AnnEval {

  /** Per-component LAZY index: each artifact materializes (and
    * localCheckpoints) the first time ANY query touches it, then serves
    * every later consumer from the checkpointed partitions. Lazy matters
    * because consumers need disjoint subsets — the semantic-dedup family
    * (d14/e02) needs only the multi-probe assignment, the PQ evals only
    * the code table — and an eager build would charge whichever query
    * happens to run first for artifacts it never reads.
    */
  final class Index(spark: SparkSession, dir: String) {
    /** (vec_id, vec) corpus projection — a plan, not a materialization. */
    // deliberately NOT Lake.spread: every checkpointed artifact below
    // inherits this frame's partitioning, and the AnnIndexStore protocol
    // queries (s16–s20, d28 sibling) write those artifacts as store
    // components — spreading a 2000-row corpus to 32 partitions turns
    // each 1-file component write into 32 tiny files and each
    // model-sized localCheckpoint into a 32-task barrier (measured: s17
    // component writes 1t→32t, ~270 ms each). The per-row work here
    // (corpus × 8 centroid cosines) is light; the heavy quadratic emb
    // consumers (e01) go through Shared.emb, which IS spread.
    lazy val emb: DataFrame = {
      VectorFns.register(spark)
      Lake.table(spark, dir, "embeddings")
        .select(col("vec_id"), VectorFns.toDoubleArray(col("embedding")).as("vec"))
    }
    /** (centroid_id, cvec), 8 rows, checkpointed: every un-barriered
      * consumer (assign + one probe ranking per eval variant) would
      * re-scan the lake for it.
      */
    lazy val centroids: DataFrame = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("vec").as("cvec"))
      .localCheckpoint()
    /** 4 rows, driver-resident model. */
    lazy val codebook: Seq[Array[Double]] = emb.filter(col("vec_id") < 4)
      .orderBy("vec_id")
      .select("vec").collect().map(_.getSeq[Double](0).toArray).toSeq
    /** vector 0. */
    lazy val query: Array[Double] = emb.filter(col("vec_id") === 0)
      .select("vec").head().getSeq[Double](0).toArray
    /** pqEncode output, checkpointed. */
    lazy val codes: DataFrame =
      Similarity.pqEncode(emb, codebook, numSub = 8).localCheckpoint()
    /** (vec_id, centroid_id, vec) single-probe assignment, checkpointed. */
    lazy val assigned: DataFrame =
      Similarity.ivfAssign(emb, centroids).localCheckpoint()
    /** (vec_id, centroid_id) MULTI-PROBE nprobe=2 assignment,
      * checkpointed — the candidate generator of the semantic near-dup
      * family (e02/d14/e03's nprobe-2 arm). Checkpointing matters twice
      * over here: the bucketed pair join is a SELF-join on this frame, so
      * an unmaterialized assignment recomputes its corpus×8 cosine scan
      * once per join side, every run.
      */
    lazy val assignedMulti2: DataFrame =
      Similarity.ivfAssignMulti(emb, centroids, nprobe = 2).localCheckpoint()
    /** (code_id, cvec) frame form of [[codebook]] — what
      * [[graft.operators.AnnIndexStore.writeModel]] persists so a later
      * ingest session can PQ-encode new batches identically.
      */
    lazy val codebookDf: DataFrame = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("code_id"), col("vec").as("cvec"))
    /** (hp_id, hvec) LSH hyperplanes — vectors 1–4, bit = id − 1. */
    lazy val hyperplanesDf: DataFrame = emb.filter(col("vec_id").between(1, 4))
      .select((col("vec_id") - 1).as("hp_id"), col("vec").as("hvec"))
    /** LSH (vec_id, bucket_sig), checkpointed. */
    lazy val sigs: DataFrame =
      Similarity.hyperplaneSignatures(emb, hyperplanesDf).localCheckpoint()
  }

  // weak-ref single-session memoizer — see SessionCache for the
  // discipline (and why not a WeakHashMap keyed by the session)
  private val cache = new SessionCache[Index]

  def index(spark: SparkSession, dir: String): Index =
    cache.get(spark, dir)(new Index(spark, dir))
}
