package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * previous version readable — AtomicStore's contract). The components
  * are independent lookups, so cross-component atomicity is not
  * required: a consumer pins whatever component versions exist when it
  * starts, exactly as it would with Delta/Iceberg table versions.
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
    */
  def write(root: String, c: Components): Map[String, Long] = {
    val frames = Map(
      "centroids" -> c.centroids,
      "assigned" -> c.assigned.select("vec_id", "centroid_id"),
      "assigned_multi" -> c.assignedMulti.select("vec_id", "centroid_id"),
      "codes" -> c.codes,
      "sigs" -> c.sigs)
    parts.map(p => p -> AtomicStore.commitSnapshot(frames(p), s"$root/$p")).toMap
  }

  /** Load the persisted components (each at its current version). */
  def load(spark: SparkSession, root: String): Components = {
    def t(p: String) = AtomicStore.read(spark, s"$root/$p")
    Components(t("centroids"), t("assigned"), t("assigned_multi"),
      t("codes"), t("sigs"))
  }

  /** Periodic maintenance, the [[DocIndexStore.compact]] sibling: fold
    * any accumulated batch dirs per component and vacuum superseded
    * manifests/dirs. [[write]] commits whole snapshots, so the fold
    * itself is usually a no-op (one data dir already) — the value here
    * is the vacuum: every index REBUILD otherwise leaves its superseded
    * manifest + full-size data dirs on the lake forever.
    */
  def compact(spark: SparkSession, root: String,
              graceMs: Long = 15 * 60 * 1000L): Map[String, Option[Long]] =
    parts.map(p =>
      p -> AtomicStore.compact(spark, s"$root/$p", graceMs = graceMs)).toMap
}
