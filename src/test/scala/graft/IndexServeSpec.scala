package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.queries.{AnnEval, DocIndex}

/** The session-memoized index tables ("served, not rebuilt") must be
  * value-identical to a fresh computation — a stale or wrongly-keyed
  * cache would silently poison every consumer query while the oracle
  * gate still passed on whichever query built it first.
  */
class IndexServeSpec extends SparkSpec {

  test("DocIndex.simhash == fresh Dedup.simhash, and is memoized per dir") {
    val ix = DocIndex.index(spark, sf)
    val served = ix.simhash.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = Dedup.simhash(Lake.table(spark, sf, "documents"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served === fresh)
    // same (session, dir) → the SAME Index instance (one build per session)
    assert(DocIndex.index(spark, sf) eq ix)
  }

  test("DocIndex shingle sets + rare candidates == fresh computation") {
    val ix = DocIndex.index(spark, sf)
    val servedSets = ix.shingleSets5
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    val freshSets = Dedup.shingleSets(Lake.table(spark, sf, "documents"),
        "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    assert(servedSets === freshSets)
    val servedCands = ix.rareCandidates50
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val freshCands = Dedup.rareShingleCandidatesFrom(
        ix.shingleSets5, "doc_id", maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(servedCands === freshCands)
  }

  test("DocIndex.wordGramPositions5 == fresh gramPositions, spans identical") {
    val ix = DocIndex.index(spark, sf)
    val served = ix.wordGramPositions5
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fresh = Dedup.gramPositions(Lake.table(spark, sf, "documents"),
        "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served === fresh)
    // served dup set == fresh df aggregation over a fresh gram table
    val servedDup = ix.dupGrams5.collect().map(_.getLong(0)).toSet
    val freshDup = Dedup.duplicatedGrams(
        Dedup.gramPositions(Lake.table(spark, sf, "documents"),
          "doc_id", "text", 5), "doc_id", 2)
      .collect().map(_.getLong(0)).toSet
    assert(servedDup === freshDup)
    // and the fully-served span query (both index tables) == the
    // one-shot composed form
    val servedSpans = Dedup.duplicateSpansFromIndex(
        ix.wordGramPositions5, ix.dupGrams5, "doc_id", n = 5)
      .collect().map(_.mkString("|")).toSet
    val oneShot = Dedup.duplicateSpans(Lake.table(spark, sf, "documents"),
        "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(_.mkString("|")).toSet
    assert(servedSpans === oneShot)
  }

  test("DocIndex.bpeMerges3 == fresh Bpe.train at 3 steps") {
    val ix = DocIndex.index(spark, sf)
    val served = ix.bpeMerges3.collect().map(_.mkString("|")).toSet
    val fresh = graft.operators.Bpe.train(
        Lake.table(spark, sf, "documents"), "text", steps = 3)
      .collect().map(_.mkString("|")).toSet
    assert(served === fresh)
  }

  test("AnnEval.assignedMulti2 == fresh ivfAssignMulti at nprobe=2") {
    val ix = AnnEval.index(spark, sf)
    val served = ix.assignedMulti2
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = Similarity.ivfAssignMulti(ix.emb, ix.centroids, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served === fresh)
    assert(AnnEval.index(spark, sf) eq ix)
  }

  test("AnnEval.assigned single-probe == the nprobe=1 head of multi-probe") {
    val ix = AnnEval.index(spark, sf)
    val single = ix.assigned.select("vec_id", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multiTop = Similarity.ivfAssignMulti(ix.emb, ix.centroids, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single === multiTop) // the tie rule must agree across forms
  }
}
