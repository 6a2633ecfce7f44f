package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's K-Means over an embedding column — the training
  * loop that produces the centroid "model" the IVF family
  * ([[Similarity.ivfAssign]]/`ivfTopK`, `bucketedNearDupPairs`) probes.
  * The reference has no trainer (its classification models are static
  * lookup tables); an ANN index at 100 TB needs one, and this is the
  * canonical Spark shape for it:
  *
  *  - **assign**: nearest-centroid by cosine via [[Similarity.ivfAssign]]
  *    — centroids are model-sized (k ≪ corpus), so assignment is a narrow
  *    per-row argmax with zero shuffle.
  *  - **update**: per-centroid mean via ONE whole-array
  *    [[graft.functions.DecimalVecSum]] aggregation — the only shuffle
  *    per iteration carries k buffers of d decimal sums each (map-side
  *    partial merge), never a d× posexplode row blow-up. The decimal
  *    fold keeps the sums order-independent and bit-identical in the
  *    DuckDB oracle; means are rounded to 9 decimals to pin the new
  *    model exactly.
  *
  * Per-iteration cost is one corpus pass + one k×d-key aggregation;
  * iteration count is a small constant — the 1000-executor cost profile
  * of Spark ML's own KMeans, expressed over DataFrames. Clusters that
  * lose every member disappear (standard Lloyd drop semantics).
  */
object KMeans {

  /** One Lloyd iteration: returns the updated centroid table
    * `(centroid_id, n_members, cvec)`.
    */
  def lloydIteration(emb: DataFrame, centroids: DataFrame): DataFrame =
    Similarity.ivfAssign(emb, centroids)
      .groupBy("centroid_id")
      .agg(graft.functions.DecimalVecSum.sum12(col("vec")).as("cs"))
      .select(col("centroid_id"), col("cs._1").as("n_members"),
        transform(col("cs._2"), x => round(x / col("cs._1"), 9)).as("cvec"))

  /** `iters` Lloyd iterations from `init(centroid_id, cvec)`. Each
    * iteration's centroid table is localCheckpoint-ed: the next assign
    * embeds the (k ≪ corpus) centroids as literals, and the barrier keeps
    * the plan from re-deriving iteration N−1 per downstream reference —
    * the iterative-DataFrame discipline the CC operator established.
    */
  def train(emb: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "train: need at least one Lloyd iteration")
    var cents = init
    var out: DataFrame = null
    for (i <- 1 to iters) {
      out = lloydIteration(emb, cents).localCheckpoint()
      cents = out.select(col("centroid_id"), col("cvec"))
      // an EMPTY corpus (or all centroids memberless) yields an empty
      // update; iterating on would crash inside the next assign with a
      // misleading "centroid set is empty — provide at least one trained
      // centroid" blaming the caller's init, and iters = 1 would silently
      // return an empty model. Name the real problem, every iteration
      // (take(1) over the just-checkpointed table is metadata-cheap).
      require(cents.take(1).nonEmpty,
        s"KMeans.train: iteration $i produced NO centroids — the " +
          "embedding table is empty (or every vector is null); nothing " +
          "to train on")
    }
    out
  }
}
