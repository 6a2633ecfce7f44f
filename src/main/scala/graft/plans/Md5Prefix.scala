package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Digest helper shared by interpreted and generated code paths. */
object Md5 {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  // RFC 1321 round constants (floor(abs(sin(i+1)) * 2^32)) and per-round
  // left-rotation amounts — hardcoded, not derived via Math.sin, so the
  // values cannot drift with platform trig.
  private val K = Array(
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)
  private val S = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  /** Single-block MD5 (RFC 1321) of `bytes[off, off+len)` for len ≤ 55 —
    * message + padding fit one 512-bit block, so the whole digest is one
    * 64-round compression with no MessageDigest object churn, no internal
    * buffering, and no 16-byte result allocation. This is the dedup
    * family's per-shingle/per-token hot path: hundreds of md5s per
    * document, each over a handful of bytes. Only registers A and B are
    * emitted (first 8 digest bytes ⊇ any `nibbles` ≤ 15 prefix).
    * Bit-identical to the MessageDigest path (Md5PrefixSpec sweeps the
    * length boundary).
    */
  def singleBlockPrefix(bytes: Array[Byte], off: Int, len: Int,
                        nibbles: Int): Long = {
    val m = new Array[Int](16)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (bytes(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    m(len >> 2) |= 0x80 << ((len & 3) << 3)
    m(14) = len << 3 // bit length; high word m(15) stays 0 for len ≤ 55
    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      b = b + Integer.rotateLeft(a + f + K(i) + m(g), S(i))
      a = tmp
      i += 1
    }
    val ra = a + 0x67452301
    val rb = b + 0xefcdab89
    var v = 0L
    i = 0
    while (i < nibbles) {
      val byteIdx = i >> 1
      val byt =
        if (byteIdx < 4) (ra >>> (byteIdx << 3)) & 0xff
        else (rb >>> ((byteIdx - 4) << 3)) & 0xff
      val nib = if ((i & 1) == 0) (byt >>> 4) & 0xf else byt & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** The integer value of the first `nibbles` hex digits of md5(s) —
    * identical to `conv(substring(md5(s), 1, nibbles), 16, 10)` and to
    * DuckDB's `('0x' || substr(md5(s), 1, nibbles))::BIGINT`, computed
    * straight from the digest bytes (no hex-string round trip). Inputs
    * ≤ 55 bytes (every shingle and almost every token) take the
    * single-block fast path. `nibbles` ≤ 15 keeps the value < 2^60,
    * inside exact BIGINT range.
    */
  def prefixLong(s: UTF8String, nibbles: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length <= 55) return singleBlockPrefix(bytes, 0, bytes.length, nibbles)
    val d = md.get()
    d.reset()
    val digest = d.digest(bytes)
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
  // fail at ANALYSIS on a non-string child, never as a per-task
  // ClassCastException mid-job (the WordNgrams rule)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

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
