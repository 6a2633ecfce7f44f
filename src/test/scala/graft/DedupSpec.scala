package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Containment vs Jaccard semantics on a quote/subsume pair: when a short
  * document is a verbatim excerpt of a long one, Jaccard stays low (the
  * union is dominated by the long doc) while containment of the short
  * side is ~1. The operator exists precisely for this case, so the spec
  * pins it: jaccardPairs at 0.8 misses the pair, containmentPairs at 0.7
  * reports it with cont(short) ≈ 1.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val long =
    "the quick brown fox jumps over the lazy dog while the rain in spain " +
      "falls mainly on the plain and the cat sat on the mat watching"
  private val quote = "the rain in spain falls mainly on the plain"
  private val other = "completely unrelated content about database engines"

  private def docs = Seq(
    (1L, long), (2L, quote), (3L, other)
  ).toDF("doc_id", "text")

  test("containmentPairs finds the quote pair jaccardPairs misses") {
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text",
      k = 5, maxDf = 50, minJaccard = 0.8).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "quote pair should fall below the Jaccard threshold")

    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
      k = 5, maxDf = 50, minContainment = 0.7)
      .filter(col("a_id") === 1L && col("b_id") === 2L).collect()
    assert(cont.length == 1, "quote pair must pass the containment gate")
    val r = cont.head
    val contA = r.getAs[Double]("cont_a")
    val contB = r.getAs[Double]("cont_b")
    // B (the quote) is fully inside A: containment of the smaller side ~1
    assert(contB > 0.95, s"cont_b=$contB should be ~1 for a verbatim quote")
    assert(contA < 0.7, s"cont_a=$contA: the long side is mostly unshared")
  }

  test("unrelated docs produce no containment pair") {
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
      k = 5, maxDf = 50, minContainment = 0.7)
      .filter(col("b_id") === 3L || col("a_id") === 3L).collect()
    assert(cont.isEmpty)
  }

  test("duplicateSpans merges consecutive shared grams into maximal spans") {
    // docs 1 and 2 share "p q r s t u v" (7 tokens → 3 shared 5-grams at
    // positions 2..4 in doc 1, 0..2 in doc 2); doc 3 is unrelated
    val corpus = Seq(
      (1L, "a1 b1 p q r s t u v c1 d1"),
      (2L, "p q r s t u v x2 y2"),
      (3L, "m n o zz ww vv uu tt ss")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(spans === Array((1L, 2, 3L, 7L), (2L, 0, 3L, 7L)))
  }

  test("lshCandidatesBetween == side-filtered self-join candidates") {
    val lake = Lake.table(spark, sf, "documents")
    val sigs = Dedup.minhashSignatures(lake, "doc_id", "text")
      .localCheckpoint()
    val idx = sigs.filter(col("doc_id") % 10 < 8)
    val batch = sigs.filter(col("doc_id") % 10 >= 8)
    val between = Dedup.lshCandidatesBetween(batch, idx, "doc_id")
      .as[(Long, Long)].collect().toSet
    // reference: full self-join candidates, keep cross-side pairs, orient
    // them (batch id, index id)
    val self = Dedup.lshCandidates(sigs, "doc_id")
      .as[(Long, Long)].collect()
    val expected = self.flatMap { case (a, b) =>
      (a % 10 >= 8, b % 10 >= 8) match {
        case (true, false) => Some((a, b))
        case (false, true) => Some((b, a))
        case _ => None
      }
    }.toSet
    assert(between === expected)
  }

  test("simhashPairsBetween == naive cross-side hamming pairs") {
    val lake = Lake.table(spark, sf, "documents")
    val sigs = Dedup.simhash(lake, "doc_id", "text").localCheckpoint()
    val idx = sigs.filter(col("doc_id") % 10 < 8)
    val batch = sigs.filter(col("doc_id") % 10 >= 8)
    val between = Dedup.simhashPairsBetween(batch, idx, "doc_id",
        maxHamming = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // naive reference: all cross-side pairs within the hamming radius
    val naive = batch.select(col("doc_id").as("a"), col("simhash").as("sa"))
      .crossJoin(idx.select(col("doc_id").as("b"), col("simhash").as("sb")))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(between === naive)
    assert(naive.nonEmpty) // the corpus must actually exercise the radius
  }
}
