package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Digest helper shared by interpreted and generated code paths. */
object Md5 {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** The integer value of the first `nibbles` hex digits of md5(s) —
    * identical to `conv(substring(md5(s), 1, nibbles), 16, 10)` and to
    * DuckDB's `('0x' || substr(md5(s), 1, nibbles))::BIGINT`, computed
    * straight from the digest bytes (no hex-string round trip).
    * `nibbles` ≤ 15 keeps the value < 2^60, inside exact BIGINT range.
    */
  def prefixLong(s: UTF8String, nibbles: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = digest(i / 2) & 0xff
      val nib = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** Native hash expression: first `nibbles` hex digits of md5 as a long.
  *
  * The dedup family (minhash, simhash) hashes every shingle/token —
  * hundreds of millions of rows at scale. The built-in composition
  * `conv(substring(md5(c), 1, n), 16, 10) :: long` materializes a 32-char
  * hex string, slices it, and re-parses it per row; this expression goes
  * digest-bytes → long directly. The VALUE is bit-identical to the
  * composition (and to the DuckDB oracle), so swapping it in is a pure
  * plan optimization — verified by Md5PrefixSpec.
  */
case class Md5PrefixLong(child: Expression, nibbles: Int)
    extends UnaryExpression {
  require(nibbles > 0 && nibbles <= 15, "nibbles must be in [1, 15]")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override def nullSafeEval(input: Any): Any =
    Md5.prefixLong(input.asInstanceOf[UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5.prefixLong($c, $nibbles)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
