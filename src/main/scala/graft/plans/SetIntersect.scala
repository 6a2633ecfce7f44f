package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Shared eval for interpreted and generated code paths. */
object InterOps {
  private final val Empty = Long.MinValue

  /** |a ∩ b| for two long arrays that are SETS (distinct elements, no
    * nulls) — the per-pair verify kernel of the Jaccard/containment
    * dedup family. Open-addressing probe over the smaller side: no
    * per-element boxing, no output array materialization, no generic
    * null handling — the three costs that make the built-in
    * `size(array_intersect(...))` the dominant stage of a verify pass
    * over tens of thousands of candidate pairs.
    */
  def interSize(aRaw: ArrayData, bRaw: ArrayData): Int = {
    var a = aRaw
    var b = bRaw
    if (a.numElements() > b.numElements()) { val t = a; a = b; b = t }
    val n = a.numElements()
    if (n == 0) return 0
    // power-of-two table ≥ 2n, capped at 2^30 so `cap` stays a positive
    // Int (an uncapped 2^31 would wrap negative on narrowing); open
    // addressing needs cap > n, so sets beyond 2^30 elements (an 8 GB+
    // ArrayData, unreachable in practice) fail loudly instead of wrapping
    var capL = 4L
    while (capL < n.toLong * 2 && capL < (1L << 30)) capL <<= 1
    val cap = capL.toInt
    require(n < cap,
      s"interSize: set of $n elements exceeds the 2^30 open-addressing bound")
    val mask = cap - 1
    // take the TOP log2(cap) bits of the multiplicative hash — a fixed
    // ">>> 40" keeps only 24 bits, so any table beyond 2^24 slots would
    // cluster every initial probe into its low quarter
    val shift = 64 - java.lang.Long.numberOfTrailingZeros(capL).toInt
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, Empty)
    @inline def slot(v: Long): Int =
      ((v * 0x9e3779b97f4a7c15L) >>> shift).toInt & mask
    var hasSentinel = false // Long.MinValue as a real element (not in our
    var i = 0               // md5-derived domain, handled for correctness)
    while (i < n) {
      val v = a.getLong(i)
      if (v == Empty) hasSentinel = true
      else {
        var idx = slot(v)
        while (table(idx) != Empty && table(idx) != v) idx = (idx + 1) & mask
        table(idx) = v
      }
      i += 1
    }
    var count = 0
    val m = b.numElements()
    i = 0
    while (i < m) {
      val v = b.getLong(i)
      if (v == Empty) { if (hasSentinel) count += 1 }
      else {
        var idx = slot(v)
        while (table(idx) != Empty && table(idx) != v) idx = (idx + 1) & mask
        if (table(idx) == v) count += 1
      }
      i += 1
    }
    count
  }
}

/** Native |A ∩ B| over two long-array SETS; value identical to
  * `size(array_intersect(a, b))` for distinct-element inputs
  * (SetIntersectSpec holds them equal, including the empty and
  * sentinel-value edges).
  */
case class LongSetIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  // fail at ANALYSIS on non-ARRAY<BIGINT> inputs: getLong over an
  // array<int> would read 8 bytes per 4-byte element and return wrong
  // (usually zero) intersection counts with no error — silently emptying
  // every Jaccard verify downstream (the WordNgrams rule)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "long_set_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterOps.interSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.InterOps.interSize($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
