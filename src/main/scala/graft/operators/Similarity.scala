package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Nearest-centroid assignment: broadcast `centroids(centroid_id, cvec)`
    * against `emb(vec_id, vec)`; argmax cosine, ties → smaller centroid_id.
    */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = emb.crossJoin(broadcast(centroids))
      .withColumn("cos", VectorFns.cosine(col("vec"), col("cvec")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("centroid_id").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("vec"))
  }

  /** Brute-force top-k for one query vector (DataFrame `query(qvec)` with
    * exactly one row). Deterministic order: cosine desc, vec_id asc.
    */
  def bruteForceTopK(emb: DataFrame, query: DataFrame, k: Int,
                     excludeId: Option[Long] = None): DataFrame = {
    val base = excludeId.map(id => emb.filter(col("vec_id") =!= id)).getOrElse(emb)
    val scored = base.crossJoin(broadcast(query))
      .withColumn("cos", VectorFns.cosine(col("vec"), col("qvec")))
    scored
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("rank"), col("vec_id"), round(col("cos"), 6).as("cosine"))
  }

  /** IVF top-k: probe the `nprobe` centroids closest to the query, score
    * only vectors assigned to them.
    */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, query: DataFrame,
              k: Int, nprobe: Int, excludeId: Option[Long] = None): DataFrame = {
    val probed = centroids.crossJoin(broadcast(query))
      .withColumn("ccos", VectorFns.cosine(col("cvec"), col("qvec")))
      .withColumn("crank", row_number().over(
        Window.orderBy(col("ccos").desc, col("centroid_id").asc)))
      .filter(col("crank") <= nprobe)
      .select("centroid_id")
    val base = excludeId.map(id => assigned.filter(col("vec_id") =!= id)).getOrElse(assigned)
    val bucket = base.join(broadcast(probed), "centroid_id")
    bucket.crossJoin(broadcast(query))
      .withColumn("cos", VectorFns.cosine(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("rank"), col("vec_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Random-hyperplane LSH signature: bit i = sign(v · hyperplane_i).
    * `hyperplanes(hp_id, hvec)` is tiny (broadcast); one narrow pass over
    * the corpus yields an integer bucket signature — Hamming-close
    * signatures ≈ cosine-close vectors, so equal-signature bucketing is
    * the candidate filter for cosine search at corpus scale (the
    * alternative to IVF when no centroids exist).
    */
  def hyperplaneSignatures(emb: DataFrame, hyperplanes: DataFrame): DataFrame =
    emb.crossJoin(broadcast(hyperplanes))
      .withColumn("bit",
        when(VectorFns.cosine(col("vec"), col("hvec")) >= 0,
          expr("shiftleft(1L, cast(hp_id as int))")).otherwise(0L))
      .groupBy("vec_id")
      .agg(sum(col("bit")).as("bucket_sig"))

  /** LSH-bucketed top-k: score only vectors in the query's signature
    * bucket.
    */
  def lshTopK(emb: DataFrame, hyperplanes: DataFrame, queryId: Long,
              k: Int): DataFrame = {
    val sigs = hyperplaneSignatures(emb, hyperplanes)
    val withSig = emb.join(sigs, "vec_id")
    val qSig = sigs.filter(col("vec_id") === queryId)
      .select(col("bucket_sig").as("q_sig"))
    val query = emb.filter(col("vec_id") === queryId)
      .select(col("vec").as("qvec"))
    withSig.crossJoin(broadcast(qSig)).crossJoin(broadcast(query))
      .filter(col("bucket_sig") === col("q_sig") && col("vec_id") =!= queryId)
      .withColumn("cos", VectorFns.cosine(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("rank"), col("vec_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ threshold.
    * Brute force locally; at scale the candidate step is LSH (random
    * hyperplane) or the IVF assignment itself (only intra-bucket pairs).
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame =
    emb.as("l").join(emb.as("r"), col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", VectorFns.cosine(col("l.vec"), col("r.vec")))
      .filter(col("cos") >= threshold)
      .select(col("l.vec_id").as("a_id"), col("r.vec_id").as("b_id"),
        round(col("cos"), 6).as("cosine"))
}
