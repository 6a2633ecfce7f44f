package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndexStore, Similarity}
import graft.queries.AnnEval

/** The persisted ANN index round-trip: write the session index's
  * artifacts as atomic lake tables, load them in place of the memoized
  * forms, and the consumer queries must produce identical results —
  * the "index built at write time, served from the lake" deployment
  * shape behind the in-session memo.
  */
class AnnIndexStoreSpec extends SparkSpec {

  test("write → load round-trips every component and serves the same pairs") {
    val ix = AnnEval.index(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft_annidx").toString
    val versions = AnnIndexStore.write(root,
      AnnIndexStore.Components(ix.centroids, ix.assigned, ix.assignedMulti2,
        ix.codes, ix.sigs))
    assert(versions.values.forall(_ == 0L)) // first commit of each table

    val loaded = AnnIndexStore.load(spark, root)
    // component-level identity
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSet
    assert(setOf(loaded.assignedMulti) ===
      setOf(ix.assignedMulti2.select("vec_id", "centroid_id")))
    assert(setOf(loaded.assigned) ===
      setOf(ix.assigned.select("vec_id", "centroid_id")))
    assert(setOf(loaded.centroids) === setOf(ix.centroids))
    assert(setOf(loaded.codes) === setOf(ix.codes))
    assert(setOf(loaded.sigs) === setOf(ix.sigs))

    // consumer parity: the bucketed near-dup pairs served from the
    // LOADED assignment equal the ones served from the session memo
    val fromLake = Similarity.bucketedNearDupPairsFromAssigned(
        loaded.assignedMulti, ix.emb, threshold = 0.4)
      .collect().map(_.mkString("|")).toSet
    val fromMemo = Similarity.bucketedNearDupPairsFromAssigned(
        ix.assignedMulti2, ix.emb, threshold = 0.4)
      .collect().map(_.mkString("|")).toSet
    assert(fromLake === fromMemo)

    // a re-write lands as the next version of each table, atomically
    val v2 = AnnIndexStore.write(root,
      AnnIndexStore.Components(ix.centroids, ix.assigned, ix.assignedMulti2,
        ix.codes, ix.sigs))
    assert(v2.values.forall(_ == 1L))

    // maintenance: writes are whole snapshots (one data dir each), so
    // compact's fold is a no-op — but the REBUILD above left every
    // component's superseded v0 manifest + full-size data dir on the
    // lake. compact's own vacuum keeps 2 versions for pinned readers;
    // the follow-up keepVersions=1 vacuum reclaims fully. Served pairs
    // unchanged throughout.
    val folded = AnnIndexStore.compact(spark, root, graceMs = 0L)
    assert(folded.values.forall(_.isEmpty), "snapshot tables: nothing to fold")
    Seq("centroids", "assigned", "assigned_multi", "codes", "sigs").foreach {
      p =>
        graft.sources.AtomicStore.vacuum(spark, s"$root/$p",
          keepVersions = 1, graceMs = 0L)
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        assert(fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$root/$p", "data")).length === 1,
          s"$p superseded rebuild not reclaimed")
    }
    val served = AnnIndexStore.load(spark, root)
    assert(Similarity.bucketedNearDupPairsFromAssigned(
        served.assignedMulti, ix.emb, threshold = 0.4)
      .collect().map(_.mkString("|")).toSet === fromMemo)
  }
}
