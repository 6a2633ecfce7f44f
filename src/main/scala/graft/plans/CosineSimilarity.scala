package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays.
  *
  * The hot path of brute-force similarity search (SURVEY.md north-star ops)
  * evaluates one cosine per candidate row; a `zip_with`+`aggregate` chain
  * materializes an intermediate array per row and breaks whole-stage codegen
  * into higher-order-function interpreters, so this expression instead emits
  * a tight fused Java loop via `doGenCode` (preference order (b) of the
  * build brief: custom Expression over UDF).
  *
  * Accumulation is strictly left-to-right (dot, |a|², |b|² in one pass) —
  * bit-identical to DuckDB's `list_dot_product`-based oracle, which was
  * verified to sum sequentially. Zero-norm inputs yield 0.0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  // Inputs must already be array<double> — callers go through
  // VectorFns.toDoubleArray (ExpectsInputTypes is private[sql], so implicit
  // COERCION isn't available to external expressions — but the analysis-
  // time CHECK is: without it, graft_cosine_sim over the lake's raw
  // array<float> embeddings would reinterpret packed floats as doubles
  // and return plausible-looking garbage similarities with no error
  // (the WordNgrams rule: fail at ANALYSIS, never silently mid-job).
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql} — cast float " +
        "embeddings through VectorFns.toDoubleArray first")
  }

  // null on LENGTH MISMATCH (mixed embedding versions, a truncated row):
  // the zip_with/aggregate builtin form yields NULL there, and a silent
  // prefix cosine would confidently mis-rank — so nullable regardless of
  // the children
  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val den = ctx.freshName("den")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $a.getDouble($i);
         |    double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = ($den == 0.0) ? 0.0 : ($dot / $den);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
