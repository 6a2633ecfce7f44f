package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-row token statistics for the repetition-quality signals:
  * `struct(n_tokens, n_distinct, top_count, n_grams, n_distinct_grams)`
  * over whitespace tokens (empties dropped) and adjacent 2-grams.
  *
  * The Column-composed form needs `transform(array_distinct(ws),
  * d -> size(filter(ws, _ == d)))` — O(distinct × tokens) interpreted
  * lambda evaluations per document — plus two more distinct passes for
  * the 2-grams. This expression is a single O(tokens) hash-count pass.
  * Values are integers with identical semantics, so the DuckDB oracle is
  * unchanged (TokenStatsSpec asserts equality with the HOF form).
  */
object TokenStatsOps {
  def eval(s: UTF8String): InternalRow = {
    val toks = new java.util.ArrayList[String](64)
    val it = s.toString.split(" ", -1)
    var i = 0
    while (i < it.length) {
      if (it(i).nonEmpty) toks.add(it(i))
      i += 1
    }
    val n = toks.size
    val counts = new java.util.HashMap[String, Int](n * 2)
    var top = 0
    i = 0
    while (i < n) {
      val c = counts.merge(toks.get(i), 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    var nGrams = 0
    val gramSet = new java.util.HashSet[String](n * 2)
    i = 0
    while (i < n - 1) {
      gramSet.add(toks.get(i) + " " + toks.get(i + 1))
      nGrams += 1
      i += 1
    }
    InternalRow(n.toLong, counts.size.toLong, top.toLong,
      nGrams.toLong, gramSet.size.toLong)
  }
}

case class TokenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  override def nullSafeEval(input: Any): Any =
    TokenStatsOps.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenStatsOps.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
