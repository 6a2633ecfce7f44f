package graft

import org.apache.spark.sql.functions._
import graft.sources.AtomicStore
import graft.streaming.Ingest

/** The ingest commit is derived state: the accepted set is computed from
  * a READ of the store (novelty probes), so two writers racing the same
  * store must serialize through the CAS append — a blind retry would
  * append rows probed against a stale base and land the racing winner's
  * docs a second time. Here two writers repeatedly commit the SAME
  * 40-doc wave; under compare-and-swap exactly one copy of each doc
  * lands no matter how the publishes interleave.
  */
class IngestRaceSpec extends SparkSpec {
  import spark.implicits._

  test("racing ingestBatchCommit writers keep one row per fingerprint") {
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_race")
      .toString
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 25).map(w => s"w${(i * 31 + w * 7) % 997}")
        .mkString(" "))
    }.toDF("doc_id", "text").localCheckpoint()
    val rounds = 5
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (0 until 2).map { w =>
      new Thread(() => {
        try (0 until rounds).foreach { i =>
          Ingest.ingestBatchCommit(spark, root, docs, w * rounds + i)
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    writers.foreach(_.start())
    writers.foreach(_.join(600000))
    assert(failures.isEmpty, s"writer failed: ${Option(failures.peek())}")
    // every commit (including the 9 whose accepted set is empty after
    // the probes) took exactly one version — CAS burned none
    assert(AtomicStore.currentVersion(spark, root) === Some(2L * rounds - 1))
    val store = AtomicStore.read(spark, root)
    assert(store.count() === 40L)
    assert(store.select("content_hash").distinct().count() === 40L)
    // and the stored fingerprints are the docs', exactly once each
    val want = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)].collect().toSet
    val got = store.select("doc_id", "content_hash")
      .as[(Long, String)].collect().toSet
    assert(got === want)
  }

  test("steady-state ingest auto-compacts the fingerprint store in-loop") {
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_autoc")
      .toString
    val nWaves = 10
    val docs = (0 until nWaves * 5).map { i =>
      (i.toLong, (0 until 25).map(w => s"w${(i * 131 + w * 17) % 1997}")
        .mkString(" "))
    }.toDF("doc_id", "text").withColumn("wave", col("doc_id") % nWaves)
      .localCheckpoint()
    (0 until nWaves).foreach { b =>
      Ingest.ingestBatchCommit(spark, root,
        docs.filter(col("wave") === b).drop("wave"), b,
        compactAboveDirs = 3)
    }
    // the wired fold kept the manifest bounded: without it the store
    // would list one data dir per wave (10); with compactAboveDirs = 3
    // the dir count can never survive a wave above 4
    val v = AtomicStore.currentVersion(spark, root).get
    val nDirs = AtomicStore.filesAt(spark, root, v).size
    assert(nDirs <= 4, s"manifest lists $nDirs dirs — auto-compact not firing")
    assert(nDirs < nWaves)
    // and compaction is row-preserving under ingest semantics: the
    // compacted store equals the plain in-memory fold of the same waves
    val want = Ingest.ingestFold(spark, docs.drop("wave"), col("doc_id") % nWaves,
        nWaves).select("doc_id", "batch", "content_hash", "simhash")
      .as[(Long, Long, String, Long)].collect().toSet
    val got = AtomicStore.read(spark, root)
      .select("doc_id", "batch", "content_hash", "simhash")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got === want)
  }
}
