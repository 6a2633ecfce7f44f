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
    val versions = DocIndexStore.write(spark, root, DocIndexStore.Components(
      ix.simhash.filter(split), ix.minhashSigs.filter(split)))
    assert(versions.values.forall(_ == 0L)) // first commit of each table

    // incremental ingest: the remaining docs land as appended batches
    DocIndexStore.appendSimhash(spark, root, ix.simhash.filter(!split))
    DocIndexStore.appendMinhash(spark, root, ix.minhashSigs.filter(!split))

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
    val v2 = DocIndexStore.write(spark, root, DocIndexStore.Components(
      ix.simhash, ix.minhashSigs))
    assert(v2.values.forall(_ == 2L))
  }
}
