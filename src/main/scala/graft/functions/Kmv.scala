package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Bounded k-minimum-values state: the (at most k) smallest DISTINCT
  * hash values seen so far. The set itself is a HashMap-backed HashSet
  * (Kryo round-trips it); the sorted view is a transient TreeSet rebuilt
  * on demand after deserialization — Kryo skips transients, and a
  * deserialized `mutable.TreeSet`'s internal red-black tree comes back
  * null (same trap [[SSBuf]] documents for its min-counter index).
  */
final class KmvBuf(val vals: mutable.HashSet[Long]) extends Serializable {
  @transient private var treeOpt: mutable.TreeSet[Long] = _
  def tree: mutable.TreeSet[Long] = {
    if (treeOpt == null) {
      treeOpt = mutable.TreeSet.empty
      vals.foreach(treeOpt.add)
    }
    treeOpt
  }
}

/** KMV distinct-count sketch (Bar-Yossef et al., RANDOM '02; Beyer et
  * al., SIGMOD '07 "On synopses for distinct value estimation under
  * multiset operations") as a typed Spark [[Aggregator]] — the
  * cardinality sibling of [[HeavyHitters]]' Space-Saving sketch.
  *
  * State is the k smallest DISTINCT hash values; the estimator is
  * D̂ = (k−1)/U₍ₖ₎ with U₍ₖ₎ the k-th smallest hash normalized to (0,1).
  * MERGEABLE in the Agarwal et al. (PODS '12) sense: union, keep the k
  * smallest — so Spark runs it with map-side partial aggregation and
  * only k-long buffers cross the shuffle. That is the 100 TB contract:
  * exact count(DISTINCT) shuffles every distinct value to its group's
  * reducer; the sketch shuffles O(k) per group regardless of corpus
  * size, at a relative error of about 1/√(k−2).
  *
  * Unlike HLL-family sketches, the k smallest distinct values of a
  * multiset are a pure FUNCTION of the set — independent of input
  * order, partitioning, and merge shape — so the same corpus always
  * yields the same estimate, and a SQL oracle can reproduce it EXACTLY
  * (`ORDER BY hash LIMIT k`), not just bound it. When a group's
  * distinct count is ≤ k the sketch holds the whole set and the
  * consumer reads the exact count (finish emits held < k).
  *
  * Input is an already-hashed non-negative long (the repo's md5-prefix
  * convention, [[TextFns.hash60]]); finish emits (n_held, kth_min) and
  * the consumer applies the estimator — keeping the normalization
  * constant (2^60 for hash60) out of the sketch.
  */
final class KmvDistinct(k: Int)
    extends Aggregator[Long, KmvBuf, (Int, Long)] {
  require(k >= 2, s"KmvDistinct: k $k must be >= 2")

  override def zero: KmvBuf = new KmvBuf(mutable.HashSet.empty)

  override def reduce(buf: KmvBuf, h: Long): KmvBuf = {
    // only a value smaller than the current k-th minimum can displace
    // anything once the buffer is full; the set dedups repeats
    if (buf.vals.size < k || h < buf.tree.last) {
      if (buf.vals.add(h)) {
        buf.tree.add(h)
        if (buf.vals.size > k) {
          val last = buf.tree.last
          buf.tree.remove(last)
          buf.vals.remove(last)
        }
      }
    }
    buf
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    b.vals.foreach(h => reduce(a, h))
    a
  }

  override def finish(buf: KmvBuf): (Int, Long) =
    (buf.vals.size, if (buf.vals.isEmpty) 0L else buf.tree.last)

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]

  override def outputEncoder: Encoder[(Int, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
