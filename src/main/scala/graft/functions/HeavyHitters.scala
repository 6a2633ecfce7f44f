package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Space-Saving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") as a typed
  * Spark [[Aggregator]] — the custom-UDAF surface of the engine.
  *
  * Semantics: at most `capacity` counters; when full, an unseen item
  * evicts the minimum counter and inherits its count + 1 (the classic
  * overestimate-bounded-by-min rule). The sketch is MERGEABLE — per-key
  * count sums then a top-`capacity` cut — so Spark runs it with map-side
  * partial aggregation: each partition reduces locally and only
  * `capacity`-sized buffers cross the shuffle, the whole point of a sketch
  * at 100 TB (exact word counts shuffle the full vocabulary instead).
  *
  * Exactness regime: when `capacity` ≥ the true distinct count, no
  * eviction ever fires and results are EXACT — which is how the DuckDB
  * oracle can check the operator end-to-end on the test corpus while the
  * same code runs approximate (error ≤ min counter) on an open vocabulary.
  */
final class HeavyHitters(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long],
                      item: String): mutable.HashMap[String, Long] = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < capacity => buf.update(item, 1L)
      case None =>
        val (minK, minC) = buf.minBy { case (k, c) => (c, k) }
        buf.remove(minK)
        buf.update(item, minC + 1)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // keep the top-capacity counters, deterministic tie order
      val keep = a.toSeq.sortBy { case (k, c) => (-c, k) }.take(capacity)
      a.clear()
      keep.foreach { case (k, c) => a.update(k, c) }
    }
    a
  }

  override def finish(buf: mutable.HashMap[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
