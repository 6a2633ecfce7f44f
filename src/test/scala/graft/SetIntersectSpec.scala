package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge => B}
import graft.operators.Dedup
import graft.plans.LongSetIntersectSize

/** Native long-set intersect count vs the built-in array_intersect. */
class SetIntersectSpec extends SparkSpec {
  import spark.implicits._

  private def interCol = B.column(LongSetIntersectSize(
    B.expression(col("a")), B.expression(col("b"))))

  test("equals size(array_intersect) on random distinct long sets") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("native", interCol)
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
    assert(df.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("edges: empty sides and the MinValue sentinel value") {
    val rows = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L), Seq.empty[Long]),
      (Seq(Long.MinValue, 3L), Seq(Long.MinValue)),
      (Seq(Long.MinValue), Seq(4L)),
      (Seq(0L, -1L, Long.MaxValue), Seq(Long.MaxValue, 0L)))
    val df = rows.toDF("a", "b")
      .withColumn("native", interCol)
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
    assert(df.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("size-ratio pruning is lossless for the jaccard threshold") {
    val docs = Lake.table(spark, sf, "documents")
    val pruned = Dedup.jaccardPairs(docs, "doc_id", "text",
      k = 5, maxDf = 50, minJaccard = 0.8)
    // reference: same pipeline with no ratio pruning, thresholded after
    val unpruned = Dedup.jaccardPairs(docs, "doc_id", "text",
      k = 5, maxDf = 50, minJaccard = 0.0)
      .filter(col("jaccard") >= 0.8)
    assert(pruned.exceptAll(unpruned).count() === 0)
    assert(unpruned.exceptAll(pruned).count() === 0)
  }

  test("thresholds with a long decimal expansion prune losslessly too") {
    // 1.0/3 has scale ≫ 18 as a BigDecimal — the uncapped toLongExact
    // conversion threw ArithmeticException; the floored 9-dp ratio must
    // instead prune losslessly (keep-set ⊇ the exact-threshold keep-set)
    val docs = Lake.table(spark, sf, "documents")
    val t = 1.0 / 3
    val pruned = Dedup.jaccardPairs(docs, "doc_id", "text",
      k = 5, maxDf = 50, minJaccard = t)
    val unpruned = Dedup.jaccardPairs(docs, "doc_id", "text",
      k = 5, maxDf = 50, minJaccard = 0.0)
      .filter(col("jaccard") >= t)
    assert(pruned.exceptAll(unpruned).count() === 0)
    assert(unpruned.exceptAll(pruned).count() === 0)
  }
}
