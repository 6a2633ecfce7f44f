package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native front end of the MinHash/Jaccard shingle family.
  *
  * The Column-composed form (`array_distinct(transform(charShingles(text),
  * hash28))` and 8 × `array_min(transform(hs, affine_i))`) runs through
  * interpreted higher-order-function lambdas — several µs of expression
  * interpreter overhead PER SHINGLE, which dominates the actual md5 work
  * at ~300 shingles/doc. These expressions do the identical arithmetic in
  * one tight JVM loop per row. Values are bit-identical to the HOF forms
  * (ShingleExprsSpec asserts equality), so the DuckDB oracles are
  * unchanged — swapping them in is a pure plan optimization.
  */
object ShingleOps {

  /** All `a.length` affine-permutation minima of the k-gram 28-bit shingle
    * hashes of `s`, in one pass. min over non-distinct == min over the
    * distinct set, so no set is materialized. Returns null when the text
    * is shorter than k (the HOF form yields an empty array → no minima).
    */
  def minhash(s: UTF8String, k: Int, a: Array[Long], b: Array[Long],
              p: Long): ArrayData = {
    val n = s.numChars()
    if (n < k) return null
    val mins = Array.fill(a.length)(Long.MaxValue)
    // ASCII fast path: byte offsets == char offsets, so every shingle is a
    // window over the document's backing bytes — hashed in place via the
    // single-block md5, zero per-shingle allocation. Non-ASCII falls back
    // to codepoint-correct substring slicing (identical values).
    val bytes = s.getBytes
    val ascii = bytes.length == n && k <= 55
    var i = 0
    while (i <= n - k) {
      val h =
        if (ascii) Md5.singleBlockPrefix(bytes, i, k, 7)
        else Md5.prefixLong(s.substringSQL(i + 1, k), 7)
      var j = 0
      while (j < a.length) {
        val v = (a(j) * h + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** The DISTINCT 28-bit shingle-hash set of `s`, ascending. Consumers are
    * set-semantic (sizes, intersections), so sort order is free to choose;
    * ascending is deterministic and merge-friendly.
    */
  def hashSet(s: UTF8String, k: Int): ArrayData = {
    val n = s.numChars()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // same ASCII window fast path as [[minhash]]
    val bytes = s.getBytes
    val ascii = bytes.length == n && k <= 55
    val set = new java.util.HashSet[java.lang.Long](256)
    var i = 0
    while (i <= n - k) {
      set.add(
        if (ascii) Md5.singleBlockPrefix(bytes, i, k, 7)
        else Md5.prefixLong(s.substringSQL(i + 1, k), 7))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** hash60 of every k-CHAR window at stride `stride` (char positions
    * 1, 1+stride, … ≤ n−k+1 — exactly `TextFns.charShingles(text, k,
    * stride)` → `hash60` per window), in order, with multiplicity; empty
    * when the text is shorter than k. The HOF composition is quadratic
    * per document: each `substr(i, k)` call walks the UTF8String from
    * byte 0 to find char offset i, so a d-sized doc pays O(d²/stride)
    * byte scans besides the per-window String materialization and
    * interpreted lambda (round-21 profile: d27 at 24 s task time for a
    * ~0.8 s-of-md5 workload). Here char-boundary byte offsets are walked
    * ONCE (ASCII corpora skip even that) and each window hashes in place
    * via the single-block md5. Values bit-identical to the HOF form
    * (ShingleExprsSpec).
    */
  def stridedWindowHashes(s: UTF8String, k: Int, stride: Int,
                          nibbles: Int): ArrayData = {
    val n = s.numChars()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val bytes = s.getBytes
    val count = (n - k) / stride + 1
    val out = new Array[Long](count)
    val ascii = bytes.length == n
    // char-index → byte-offset map, built in one pass (identity for ASCII)
    val offs =
      if (ascii) null
      else {
        val o = new Array[Int](n + 1)
        var ci = 0
        var bi = 0
        while (ci < n) {
          o(ci) = bi
          bi += UTF8String.numBytesForFirstByte(bytes(bi))
          ci += 1
        }
        o(n) = bytes.length
        o
      }
    var w = 0
    while (w < count) {
      val startC = w * stride
      val off = if (ascii) startC else offs(startC)
      val len = (if (ascii) startC + k else offs(startC + k)) - off
      out(w) =
        if (len <= 55) Md5.singleBlockPrefix(bytes, off, len, nibbles)
        else Md5.prefixLong(UTF8String.fromBytes(bytes, off, len), nibbles)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** All affine minima over an existing hash array (the cached shingle-set
    * path of the LSH pipeline).
    */
  def minhashFromSet(hs: ArrayData, a: Array[Long], b: Array[Long],
                     p: Long): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val mins = Array.fill(a.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < a.length) {
        val v = (a(j) * h + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** text → array<long> of affine-minhash minima (one per permutation). */
case class ShingleMinHash(child: Expression, k: Int, a: Seq[Long],
                          b: Seq[Long], p: Long) extends UnaryExpression {
  // fail at ANALYSIS on a non-string child, never as a per-task
  // ClassCastException mid-job (the WordNgrams rule)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  require(k > 0 && a.length == b.length && a.nonEmpty)
  // Returns null for text shorter than k EVEN when the input is non-null,
  // so nullability must not be inherited from the child: with a
  // non-nullable child the default would make `ev.isNull` the literal
  // `false` in codegen (assignment to it is a Janino compile error →
  // silent interpreter fallback) and would let Catalyst elide null checks
  // a caller without a length pre-filter still needs.
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_minhash"
  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  override def nullSafeEval(input: Any): Any =
    ShingleOps.minhash(input.asInstanceOf[UTF8String], k, aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aArr", aArr, "long[]")
    val bRef = ctx.addReferenceObj("bArr", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.ShingleOps.minhash($c, $k, $aRef, $bRef, ${p}L);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → sorted array<long> of DISTINCT 28-bit shingle hashes. */
case class ShingleHashSet(child: Expression, k: Int) extends UnaryExpression {
  // fail at ANALYSIS on a non-string child, never as a per-task
  // ClassCastException mid-job (the WordNgrams rule)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  require(k > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.hashSet(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleOps.hashSet($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → array<long> of per-window hash60s at (k, stride) — the fused
  * native of `explode(charShingles(text, k, stride))` → `hash60(win)`.
  * Empty array below k chars (matching the HOF form's `otherwise` arm,
  * whose explode consumer emits no rows either way); null only on null
  * input.
  */
case class StridedShingleHashes(child: Expression, k: Int, stride: Int,
                                nibbles: Int) extends UnaryExpression {
  // fail at ANALYSIS on a non-string child, never as a per-task
  // ClassCastException mid-job (the WordNgrams rule)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  require(k > 0 && stride > 0 && nibbles > 0 && nibbles <= 15)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "strided_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.stridedWindowHashes(input.asInstanceOf[UTF8String], k, stride,
      nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShingleOps.stridedWindowHashes($c, $k, $stride, $nibbles)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> of hashes → array<long> of affine-minhash minima. */
case class MinhashFromSet(child: Expression, a: Seq[Long], b: Seq[Long],
                          p: Long) extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty)
  // Null on an EMPTY hash array regardless of input nullability — same
  // contract rationale as [[ShingleMinHash.nullable]].
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_set"
  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  override def nullSafeEval(input: Any): Any =
    ShingleOps.minhashFromSet(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aArr", aArr, "long[]")
    val bRef = ctx.addReferenceObj("bArr", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.ShingleOps.minhashFromSet($c, $aRef, $bRef, ${p}L);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
