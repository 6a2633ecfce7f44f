package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Whole-vector decimal sum state: element-exact decimal sums plus the
  * member count. Kryo round-trips `java.math.BigDecimal` directly.
  */
final class VecSumBuf(var n: Long, var sums: Array[JBigDecimal])
  extends Serializable

/** Per-group mean-vector aggregation as ONE typed [[Aggregator]] over
  * whole arrays — the centroid-update kernel behind s05's
  * nearest-centroid classifier and [[graft.operators.KMeans]]'s Lloyd
  * step.
  *
  * Why not `posexplode` + `sum(cast(x as decimal))`: that shape turns a
  * d-dimensional corpus into d× as many rows, shuffles them on (group,
  * dimension), and runs the sum through Spark's INTERPRETED decimal
  * aggregate — measured 27× slower than the DuckDB oracle at sf0.1
  * (round-7 verdict). Here the shuffle carries one k×d buffer per map
  * partition (map-side partial merge via ObjectHashAggregate), the same
  * traffic shape as Spark ML's own KMeans update, and no row explosion
  * ever exists.
  *
  * Decimal-exact by construction — the ORACLE-PARITY contract: each
  * element folds into the buffer as
  * `BigDecimal.valueOf(x).setScale(scale, HALF_UP)`, which is exactly
  * Spark's `cast(double AS decimal(p, scale))` (shortest decimal
  * representation of the double, then HALF_UP — Decimal.scala's
  * `apply(BigDecimal(d))` + `changePrecision`), so sums are independent
  * of partitioning and merge order and hash-match a
  * `sum(CAST(x AS DECIMAL(p, scale)))` in any ANSI engine. finish() casts
  * each sum to double (`BigDecimal.doubleValue`, = Spark's
  * `decimal→double` cast); the caller divides/rounds in Column land.
  *
  * Output: `(n, sums_as_double)` — struct fields `_1`/`_2`.
  */
final class DecimalVecSum(scale: Int)
    extends Aggregator[Seq[Double], VecSumBuf, (Long, Seq[Double])] {
  require(scale >= 0, s"DecimalVecSum: scale $scale must be >= 0")

  override def zero: VecSumBuf = new VecSumBuf(0L, Array.empty)

  override def reduce(b: VecSumBuf, v: Seq[Double]): VecSumBuf = {
    // a NULL vector contributes nothing — sum()'s null-skipping rule;
    // without this the typed lane NPEs deep inside the aggregation with
    // no hint of which input row was bad
    if (v == null) return b
    // initialize on n == 0, NOT sums.length == 0: a zero-length input
    // vector would otherwise leave the buffer re-armed for lazy init, so
    // a later full-length row silently re-dimensions it — the group
    // finishes with an inflated n (halved means downstream) in the
    // same-partition order, or a ragged-merge crash cross-partition.
    // With n as the init flag, empty-vs-nonempty is a deterministic
    // ragged failure regardless of partitioning.
    if (b.n == 0) b.sums = Array.fill(v.length)(JBigDecimal.ZERO)
    require(v.length == b.sums.length,
      s"DecimalVecSum: ragged input — ${v.length} dims vs ${b.sums.length}")
    var i = 0
    while (i < b.sums.length) {
      val x = v(i)
      // NaN/Infinity has no decimal value: cast(double AS decimal)
      // rejects it under ANSI (this repo's mode), and
      // JBigDecimal.valueOf would throw an opaque NumberFormatException
      // mid-task — fail with the input named so the caller can filter
      // the corrupt embedding (fp16-overflow artifacts are routine)
      require(!x.isNaN && !x.isInfinity,
        s"DecimalVecSum: non-finite element $x at dim $i — filter or " +
          "clean non-finite embeddings before aggregating")
      b.sums(i) = b.sums(i).add(
        JBigDecimal.valueOf(x).setScale(scale, RoundingMode.HALF_UP))
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf = {
    if (b.n == 0) a
    else if (a.n == 0) b
    else {
      require(a.sums.length == b.sums.length,
        s"DecimalVecSum: ragged merge — ${a.sums.length} vs ${b.sums.length}")
      var i = 0
      while (i < a.sums.length) {
        a.sums(i) = a.sums(i).add(b.sums(i))
        i += 1
      }
      a.n += b.n
      a
    }
  }

  override def finish(b: VecSumBuf): (Long, Seq[Double]) =
    (b.n, b.sums.map(_.doubleValue).toSeq)

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.kryo[VecSumBuf]

  override def outputEncoder: Encoder[(Long, Seq[Double])] =
    ExpressionEncoder()
}

object DecimalVecSum {
  /** The scale-12 instance both centroid consumers use (s05 summed
    * through decimal(28,12), KMeans through decimal(18,12) — same scale,
    * and the arbitrary-precision buffer makes the precision bound moot).
    */
  def sum12: UserDefinedFunction = udaf(new DecimalVecSum(12))
}
