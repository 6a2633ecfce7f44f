package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval for interpreted and generated code paths. */
object SimhashOps {
  /** One-pass simhash over whitespace tokens (empties dropped, with
    * multiplicity): per bit j, sum ±1 by bit j of the token's 60-bit md5
    * hash ([[Md5.prefixLong]]); signature bit j is set iff the sum is
    * positive. Bit-identical to the explode → hash60 → 60-column
    * `sum(shiftright&1 * 2 - 1)` aggregation (SimhashSpec holds them
    * equal), computed without leaving the row.
    */
  def eval(s: UTF8String, bits: Int): Long = {
    val counts = new Array[Int](bits)
    // whitespace-run tokenization on the raw UTF-8 bytes (the [[Ws]]
    // contract — every separator byte is single-byte ASCII, so
    // byte-splitting == char-splitting), tokens hashed in place
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (!Ws.is(bytes(i))) {
        val st = i
        while (i < bytes.length && !Ws.is(bytes(i))) i += 1
        // hash the token IN PLACE on the backing array (the ShingleExprs
        // discipline): a per-token UTF8String wrapper would force a
        // defensive copy inside prefixLong for every token of every doc
        val len = i - st
        val h =
          if (len <= 55) Md5.singleBlockPrefix(bytes, st, len, 15)
          else Md5.prefixLong(UTF8String.fromBytes(bytes, st, len), 15)
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      } else i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}

/** Native one-pass simhash signature.
  *
  * The Column-composed form explodes every token into a row (doc × tokens
  * blow-up — millions of rows per million docs), hashes each, and shuffles
  * a 60-column partial-sum aggregate back to one row per doc. This
  * expression computes the identical signature in ONE narrow projection —
  * zero explode, zero shuffle, at any corpus size. The md5-per-token cost
  * is unchanged (it is the algorithm); what disappears is the row blow-up
  * and the aggregation exchange. Cf. the same trade in
  * [[ShingleMinHash]] / [[TokenStats]].
  *
  * Returns 0 for token-less text (the exploded form produces no row at
  * all there — callers gate on `length(trim(text, <Ws chars>)) > 0` to
  * match, as [[graft.operators.Dedup.simhash]] does; bare `trim` strips
  * only ASCII space, which would let a "\n"-only doc through as a
  * spurious signature-0 row).
  */
case class Simhash60(child: Expression, bits: Int = 60)
    extends UnaryExpression {
  // fail at ANALYSIS on a non-string child, never as a per-task
  // ClassCastException mid-job (the WordNgrams rule)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  require(bits > 0 && bits <= 60, "bits must be in [1, 60]")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimhashOps.eval(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimhashOps.eval($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
