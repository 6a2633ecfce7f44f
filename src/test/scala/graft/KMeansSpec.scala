package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight cosine clusters around the axes
  private def emb = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.8, 0.2)),
    (3L, Seq(0.0, 1.0)), (4L, Seq(0.1, 0.9))
  ).toDF("vec_id", "vec")

  private def init = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))
  ).toDF("centroid_id", "cvec")

  test("one Lloyd iteration recovers the per-cluster dimension means") {
    val out = KMeans.lloydIteration(emb, init)
      .select(col("centroid_id"), col("n_members"),
        posexplode(col("cvec")).as(Seq("dim", "m")))
      .orderBy("centroid_id", "dim").collect()
    val byKey = out.map(r => (r.getLong(0), r.getInt(2)) ->
      (r.getLong(1), r.getDouble(3))).toMap
    assert(byKey((0L, 0)) == (3L, 0.9)) // mean(1.0, 0.9, 0.8)
    assert(byKey((0L, 1))._2 == 0.1)
    assert(byKey((1L, 0)) == (2L, 0.05))
    assert(byKey((1L, 1))._2 == 0.95)
  }

  test("a second iteration is stable once assignments converge") {
    val once = KMeans.train(emb, init, iters = 1).orderBy("centroid_id").collect()
    val twice = KMeans.train(emb, init, iters = 2).orderBy("centroid_id").collect()
    assert(once.map(_.getSeq[Double](2)).toSeq ==
      twice.map(_.getSeq[Double](2)).toSeq)
  }

  test("a centroid that attracts no member is dropped") {
    val far = init.union(Seq((2L, Seq(-1.0, -1.0))).toDF("centroid_id", "cvec"))
    val out = KMeans.lloydIteration(emb, far)
      .select("centroid_id").as[Long].collect().toSet
    assert(out == Set(0L, 1L))
  }
}
