package graft

import org.apache.spark.sql.functions._
import graft.functions.DecimalVecSum

/** [[DecimalVecSum]] contract: bit-identical to the SQL
  * `sum(CAST(x AS DECIMAL(p,12)))` per dimension, independent of
  * partitioning (the merge path), and strict about ragged input.
  */
class VecAggSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(0.1, 0.25000000000049, -3.7)),
    (2L, Seq(1e-13, 2.0, 0.3333333333333333)),
    (3L, Seq(-0.1, 1.0 / 3.0, 7.125)),
    (4L, Seq(0.7, -2.5e-7, 1234.000000000001)))

  test("whole-array decimal sum == per-dimension sum(cast as decimal)") {
    val df = vecs.toDF("id", "v").withColumn("g", lit(1))
    val agg = df.groupBy("g").agg(DecimalVecSum.sum12($"v").as("cs"))
      .select($"cs._1", $"cs._2").as[(Long, Seq[Double])].head()
    val oracle = df.select(posexplode($"v").as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(sum($"x".cast("decimal(28,12)")).cast("double").as("s"))
      .orderBy("pos").select("s").as[Double].collect().toSeq
    assert(agg._1 === vecs.length.toLong)
    // exact double equality — the decimal fold makes both forms the same
    // number, not merely close
    assert(agg._2 === oracle)
  }

  test("merge order does not change the result (partitioned input)") {
    val one = vecs.toDF("id", "v").coalesce(1)
      .groupBy().agg(DecimalVecSum.sum12($"v").as("cs"))
      .select($"cs._2").as[Seq[Double]].head()
    val many = vecs.toDF("id", "v").repartition(4)
      .groupBy().agg(DecimalVecSum.sum12($"v").as("cs"))
      .select($"cs._2").as[Seq[Double]].head()
    assert(one === many)
  }

  test("ragged vectors fail fast") {
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0))).toDF("id", "v")
    val e = intercept[Exception] {
      bad.groupBy().agg(DecimalVecSum.sum12($"v").as("cs")).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      e.getCause != null && e.getCause.getMessage.contains("ragged"))
  }

  test("a zero-length vector cannot re-arm lazy init (deterministic ragged failure)") {
    // the empty row used to initialize sums to length 0 and LEAVE the
    // buffer re-armed: the next full-length row silently re-dimensioned
    // it, finishing with n inflated by the empty rows — a halved mean
    // downstream — in same-partition order, or a ragged crash across
    // partitions. Init now keys on n == 0, so empty-vs-nonempty is the
    // same deterministic ragged failure REGARDLESS of partitioning.
    val mixed = Seq((1L, Seq.empty[Double]), (2L, Seq(1.0, 2.0)))
      .toDF("id", "v")
    Seq(1, 2).foreach { parts => // same-partition AND cross-partition
      val e = intercept[Exception] {
        mixed.repartition(parts).groupBy()
          .agg(DecimalVecSum.sum12($"v").as("cs")).collect()
      }
      assert(e.getMessage.contains("ragged") ||
        e.getCause != null && e.getCause.getMessage.contains("ragged"),
        s"parts=$parts")
    }
    // an all-empty group is consistent either way: (n, zero-dim sums)
    val allEmpty = Seq((1L, Seq.empty[Double]), (2L, Seq.empty[Double]))
      .toDF("id", "v")
      .groupBy().agg(DecimalVecSum.sum12($"v").as("cs"))
      .select($"cs._1", $"cs._2").as[(Long, Seq[Double])].collect()
    assert(allEmpty.toSeq === Seq((2L, Seq.empty[Double])))
  }
}
