package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Mergeable Space-Saving buffer: at most `capacity` counters plus one
  * scalar `err` — an upper bound on the true count of ANY key absent from
  * `counts`. Every stored count is an overestimate of the key's true
  * count (never an undercount), so `err` after a truncating merge is the
  * largest dropped counter: an absent key's true count can't exceed it.
  *
  * The min-counter index (`tree`) is a transient view rebuilt on demand
  * after (de)serialization — Kryo skips transient fields — so eviction is
  * O(log capacity) instead of a linear scan per unseen item.
  */
final class SSBuf(val counts: mutable.HashMap[String, Long], var err: Long)
    extends Serializable {
  @transient private var treeOpt: mutable.TreeSet[(Long, String)] = _
  def tree: mutable.TreeSet[(Long, String)] = {
    if (treeOpt == null) {
      treeOpt = mutable.TreeSet.empty
      counts.foreach { case (k, c) => treeOpt.add((c, k)) }
    }
    treeOpt
  }
}

/** Space-Saving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") as a typed
  * Spark [[Aggregator]] — the custom-UDAF surface of the engine.
  *
  * Semantics: at most `capacity` counters; when full, an unseen item
  * evicts the minimum counter and inherits its count + 1 (the classic
  * overestimate-bounded-by-min rule). The sketch is MERGEABLE in the
  * Agarwal et al. ("Mergeable Summaries", PODS '12) sense: a key missing
  * from one side is assumed present there at that side's error bound, the
  * union is cut back to `capacity`, and the largest dropped counter joins
  * the merged error. The invariants survive any merge tree:
  * stored ≥ true for every present key, and true ≤ `err` for every absent
  * key — so a genuine heavy hitter (true count > final `err`) can never be
  * silently dropped, no matter how its occurrences split across
  * partitions. Spark runs it with map-side partial aggregation: each
  * partition reduces locally and only `capacity`-sized buffers cross the
  * shuffle, the whole point of a sketch at 100 TB (exact word counts
  * shuffle the full vocabulary instead).
  *
  * Exactness regime: when `capacity` > the true distinct count, no
  * eviction or truncation ever fires, `err` stays 0, and results are
  * EXACT. (At the boundary `capacity` == distinct count, a full buffer
  * merged with a partition that missed some key sets `err` > 0 via the
  * absent-key bound, but every full buffer necessarily holds all keys, so
  * the emitted counts are still exact.) This is how the DuckDB oracle can
  * check the operator end-to-end on the test corpus while the same code
  * runs approximate (overestimate ≤ `err`) on an open vocabulary.
  */
final class HeavyHitters(capacity: Int)
    extends Aggregator[String, SSBuf, Seq[(String, Long)]] {
  // fail at construction, not as an opaque NoSuchElementException inside
  // a distributed task (capacity 0 would take the eviction branch on the
  // FIRST item and call tree.head on an empty set) — the KmvDistinct
  // require(k >= 2) discipline
  require(capacity >= 1, s"HeavyHitters: capacity $capacity must be >= 1")

  override def zero: SSBuf = new SSBuf(mutable.HashMap.empty, 0L)

  override def reduce(buf: SSBuf, item: String): SSBuf = {
    buf.counts.get(item) match {
      case Some(c) =>
        buf.tree.remove((c, item))
        buf.counts.update(item, c + 1)
        buf.tree.add((c + 1, item))
      case None if buf.counts.size < capacity =>
        // an unfull sketch's "minimum counter" is the error floor
        buf.counts.update(item, buf.err + 1)
        buf.tree.add((buf.err + 1, item))
      case None =>
        val (minC, minK) = buf.tree.head // deterministic: (count, key) order
        buf.tree.remove((minC, minK))
        buf.counts.remove(minK)
        buf.counts.update(item, minC + 1)
        buf.tree.add((minC + 1, item))
    }
    buf
  }

  /** Upper bound on the true count of any key ABSENT from the sketch: a
    * key evicted by reduce had count ≤ the then-minimum counter (which
    * only grows), and a key dropped by a merge cut is covered by `err`.
    */
  private def absentBound(s: SSBuf): Long =
    if (s.counts.size >= capacity) math.max(s.err, s.tree.head._1) else s.err

  override def merge(a: SSBuf, b: SSBuf): SSBuf = {
    // identity merges first: an EMPTY sketch with zero error carries no
    // information about any key, so merging it must be a no-op. Without
    // the short-circuit, the other (full) side's absent-key bound leaks
    // into the merged `err`, and every LATER merge charges absent keys
    // with that inflated bound — still a valid overestimate, but looser
    // than necessary, and empty partial buffers are routine (every empty
    // partition contributes one).
    if (a.counts.isEmpty && a.err == 0L) return b
    if (b.counts.isEmpty && b.err == 0L) return a
    val ba = absentBound(a)
    val bb = absentBound(b)
    val out = new SSBuf(mutable.HashMap.empty, ba + bb)
    // overestimate-preserving union: a key absent from one side is charged
    // that side's absent-key bound (its true count there is at most that),
    // so every merged counter still satisfies stored ≥ true
    a.counts.foreach { case (k, c) =>
      out.counts.update(k, c + b.counts.getOrElse(k, bb))
    }
    b.counts.foreach { case (k, c) =>
      if (!a.counts.contains(k)) out.counts.update(k, c + ba)
    }
    if (out.counts.size > capacity) {
      val sorted = out.counts.toSeq.sortBy { case (k, c) => (-c, k) }
      val (keep, drop) = sorted.splitAt(capacity)
      // every dropped stored count overestimates its true count, so the
      // largest dropped counter bounds any key the cut removed; keys
      // absent from BOTH inputs are covered by ba + bb
      out.err = math.max(out.err, drop.head._2)
      out.counts.clear()
      keep.foreach { case (k, c) => out.counts.update(k, c) }
    }
    out
  }

  override def finish(buf: SSBuf): Seq[(String, Long)] =
    buf.counts.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[SSBuf] = Encoders.kryo[SSBuf]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
