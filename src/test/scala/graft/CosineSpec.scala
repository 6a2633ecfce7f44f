package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Custom codegen'd CosineSimilarity vs the built-in higher-order-function
  * form: must agree bit-for-bit on real embeddings (same accumulation
  * order), including through whole-stage codegen.
  */
class CosineSpec extends SparkSpec {

  test("custom expression == builtin HOF form, bit-exact, on real data") {
    VectorFns.register(spark)
    val e = Lake.table(spark, sf, "embeddings")
      .select(col("vec_id"), VectorFns.toDoubleArray(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        VectorFns.cosine(col("v"), col("qv")).as("custom"),
        VectorFns.cosineBuiltin(col("v"), col("qv")).as("builtin"))
    assert(both.filter(col("custom") =!= col("builtin")).count() === 0)
    // self-similarity is exactly 1.0 only up to fp; check it's ~1
    val self = both.orderBy(desc("custom")).first().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("zero-norm input yields 0.0, null input yields null") {
    VectorFns.register(spark)
    import spark.implicits._
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(VectorFns.cosine($"a", $"b")).first().getDouble(0) === 0.0)
    val withNull = df.select(VectorFns.cosine(lit(null).cast("array<double>"), $"b"))
    assert(withNull.first().isNullAt(0))
  }
}
