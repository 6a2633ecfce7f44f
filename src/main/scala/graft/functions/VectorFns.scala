package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.CosineSimilarity

/** Vector/embedding column functions (similarity-search support ops). */
object VectorFns {

  /** Lake embeddings are `array<float>`; all math runs in double (matches
    * the DuckDB oracle's `::DOUBLE` cast — float→double is exact).
    */
  def toDoubleArray(c: Column): Column = transform(c, _.cast("double"))

  private val cosineFn = "graft_cosine_sim"

  /** Register the native cosine expression in the session's function
    * registry so `spark.sql` text can call it too (the Column API below
    * does not need this).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      cosineFn, { exprs =>
        // same arity guard as the GraftExtensions registration — the two
        // paths register the same SQL name and must fail the same way
        // (a bare exprs(1) would throw an opaque IndexOutOfBounds)
        require(exprs.length == 2, s"$cosineFn(arrayA, arrayB)")
        CosineSimilarity(exprs.head, exprs(1))
      }, "scala_udf")

  /** Cosine similarity via the codegen'd Catalyst expression
    * ([[graft.plans.CosineSimilarity]]).
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Reference implementation with Spark built-ins only (higher-order
    * functions). Same left-to-right accumulation order — used by tests to
    * cross-check the custom expression bit-for-bit.
    */
  def cosineBuiltin(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val den = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(den === 0.0, 0.0).otherwise(dot(a, b) / den)
  }
}
