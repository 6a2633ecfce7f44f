package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DocIndexStore}
import graft.queries.DocIndex

/** The persisted document-signature index round-trip (the d-side sibling
  * of AnnIndexStoreSpec): signatures written as atomic lake tables, an
  * incremental batch appended, and the banded pair join served from the
  * LOADED table must equal the session-memo form — persistence and
  * incremental maintenance are result-invisible.
  */
class DocIndexStoreSpec extends SparkSpec {

  test("write → append → load round-trips both signature tables and serves the same pairs") {
    val ix = DocIndex.index(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft_docidx").toString
    val split = col("doc_id") % 5 < 4
    val versions = DocIndexStore.write(root, DocIndexStore.Components(
      ix.simhash.filter(split), ix.minhashSigs.filter(split)))
    assert(versions.values.forall(_ == 0L)) // first commit of each table

    // incremental ingest: the remaining docs land as appended batches
    DocIndexStore.appendSimhash(root, ix.simhash.filter(!split))
    DocIndexStore.appendMinhash(root, ix.minhashSigs.filter(!split))

    val loaded = DocIndexStore.load(spark, root)
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSet
    // component-level identity: initial write + append == full table
    assert(setOf(loaded.simhash) === setOf(ix.simhash))
    assert(setOf(loaded.minhashSigs) === setOf(ix.minhashSigs))

    // consumer parity: banded hamming pairs off the LOADED table equal
    // the session-memo form, and the minhash band candidates do too
    val fromLake = Dedup.simhashPairs(loaded.simhash, "doc_id", maxHamming = 8)
      .collect().map(_.mkString("|")).toSet
    val fromMemo = Dedup.simhashPairs(ix.simhash, "doc_id", maxHamming = 8)
      .collect().map(_.mkString("|")).toSet
    assert(fromLake === fromMemo)
    val candLake = Dedup.lshCandidates(loaded.minhashSigs, "doc_id")
      .collect().map(_.mkString("|")).toSet
    val candMemo = Dedup.lshCandidates(ix.minhashSigs, "doc_id")
      .collect().map(_.mkString("|")).toSet
    assert(candLake === candMemo)

    // a re-write lands as the next version of each table, atomically
    // (append burned one version per table, so snapshot v is 2)
    val v2 = DocIndexStore.write(root, DocIndexStore.Components(
      ix.simhash, ix.minhashSigs))
    assert(v2.values.forall(_ == 2L))
  }

  test("concurrent-append soak: racing ingest batches lose no signature row") {
    // the AtomicStoreSpec append soak, run against the index-store entry
    // points: d28/s16 made the persisted signature tables load-bearing
    // artifacts, and a lost append here is SILENT recall loss (a doc with
    // no signature row is simply never a dedup candidate). Two ingest
    // writers race appendSimhash AND appendMinhash on one root; every
    // batch carries writer-unique doc_ids, so any dropped commit is a
    // missing row in the final state. Versions must come out dense per
    // table (seed 0, appends exactly 1..2*rounds — CAS burned none).
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_docidx_soak")
      .toString
    def sim(ids: Seq[Long]) =
      ids.map(id => (id, id * 7L)).toDF("doc_id", "simhash")
    def mh(ids: Seq[Long]) =
      ids.map(id => (id, id, id + 1, id % 3, id % 5)).toDF(
        "doc_id", "mh_0", "mh_1", "band_0", "band_1")
    DocIndexStore.write(root,
      DocIndexStore.Components(sim(Seq(0L)), mh(Seq(0L))))
    val rounds = 10
    def ids(w: Int, i: Int): Seq[Long] =
      Seq(1000L * (w + 1) + 2 * i, 1000L * (w + 1) + 2 * i + 1)
    val simVs = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]())
    val mhVs = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]())
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (0 until 2).map { w =>
      new Thread(() => {
        try (0 until rounds).foreach { i =>
          simVs.add(DocIndexStore.appendSimhash(root, sim(ids(w, i))))
          mhVs.add(DocIndexStore.appendMinhash(root, mh(ids(w, i))))
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    writers.foreach(_.start())
    writers.foreach(_.join(600000))
    assert(failures.isEmpty, s"writer failed: ${Option(failures.peek())}")
    import scala.jdk.CollectionConverters._
    assert(simVs.asScala.toSet === (1L to 2L * rounds).toSet,
      s"simhash versions not dense: ${simVs.asScala.toSeq.sorted}")
    assert(mhVs.asScala.toSet === (1L to 2L * rounds).toSet,
      s"minhash versions not dense: ${mhVs.asScala.toSeq.sorted}")
    val wantIds = (0L +: (for (w <- 0 until 2; i <- 0 until rounds)
      yield ids(w, i)).flatten).toSet
    val loaded = DocIndexStore.load(spark, root)
    assert(loaded.simhash.select("doc_id").as[Long].collect().toSet
      === wantIds)
    assert(loaded.minhashSigs.select("doc_id").as[Long].collect().toSet
      === wantIds)
    // row-level integrity, not just presence: each surviving row is the
    // exact batch row its writer appended
    assert(loaded.simhash.as[(Long, Long)].collect().toSet
      === wantIds.map(id => (id, id * 7L)))
  }
}
