package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge => B}
import graft.functions.{DecimalVecSum, VectorFns}
import graft.plans.{CosineSimilarity, LongSetIntersectSize, Simhash60, TokenCounts}

/** Analysis-time type guards on the native expressions, and the
  * aggregator's bad-input contracts. Without these every failure mode is
  * SILENT wrong results (getDouble/getLong reinterpreting packed
  * narrower types) or an opaque mid-task crash far from the bad input.
  */
class ExpressionGuardsSpec extends SparkSpec {
  import spark.implicits._

  private def analysisError(df: => org.apache.spark.sql.DataFrame): String =
    intercept[AnalysisException](df.collect()).getMessage

  test("cosine_sim rejects non-double arrays at ANALYSIS") {
    // the lake's raw embedding type is array<float>: getDouble over it
    // would reinterpret two packed floats per element — plausible
    // garbage similarities, no error
    val floats = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "vec")
    val msg = analysisError(floats.select(
      B.column(CosineSimilarity(B.expression(col("vec")),
        B.expression(col("vec"))))))
    assert(msg.contains("ARRAY<DOUBLE>") && msg.contains("toDoubleArray"))
    // and the documented cast path works
    val self = floats.select(VectorFns.cosine(
        VectorFns.toDoubleArray(col("vec")),
        VectorFns.toDoubleArray(col("vec"))))
      .as[Double].head()
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("cosine_sim yields NULL on length mismatch, both eval modes") {
    // mixed embedding versions / a truncated row: a silent prefix cosine
    // would confidently mis-rank; the zip_with builtin yields NULL there
    val df = Seq((Seq(1.0, 0.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b")
    Seq("true", "false").foreach { cg =>
      val flag = if (cg == "true") "CODEGEN_ONLY" else "NO_CODEGEN"
      spark.conf.set("spark.sql.codegen.factoryMode", flag)
      try {
        val out = df.select(VectorFns.cosine(col("a"), col("b")).as("c"),
          VectorFns.cosineBuiltin(col("a"), col("b")).as("ref")).head()
        assert(out.isNullAt(0), s"native must be null under $flag")
        assert(out.isNullAt(1), "builtin reference is null on mismatch")
      } finally
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("set-intersect and string expressions reject wrong types at ANALYSIS") {
    val ints = Seq((Seq(1, 2), Seq(2, 3))).toDF("a", "b")
    assert(analysisError(ints.select(
        B.column(LongSetIntersectSize(B.expression(col("a")),
          B.expression(col("b"))))))
      .contains("ARRAY<BIGINT>"))
    val longs = Seq(42L).toDF("x")
    assert(analysisError(longs.select(
        B.column(Simhash60(B.expression(col("x"))))))
      .contains("STRING"))
    assert(analysisError(longs.select(
        B.column(TokenCounts(B.expression(col("x"))))))
      .contains("STRING"))
  }

  test("DecimalVecSum: null vectors skip; non-finite elements fail NAMED") {
    val agg = new DecimalVecSum(6)
    // null input contributes nothing (sum()'s null-skipping rule) — the
    // typed lane would otherwise NPE with no hint of the bad row
    var buf = agg.zero
    buf = agg.reduce(buf, null)
    buf = agg.reduce(buf, Seq(1.0, 2.0))
    buf = agg.reduce(buf, null)
    val (n, sums) = agg.finish(buf)
    assert(n === 1L && sums === Seq(1.0, 2.0))
    // a NaN embedding element (fp16-overflow artifact) must fail with
    // the input named, not an opaque NumberFormatException mid-task
    val e = intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, Seq(0.5, Double.NaN))
    }
    assert(e.getMessage.contains("non-finite") &&
      e.getMessage.contains("dim 1"))
  }
}
