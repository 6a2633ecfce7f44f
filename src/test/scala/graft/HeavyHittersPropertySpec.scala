package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HeavyHitters, SSBuf}

/** Randomized invariant check for the Space-Saving sketch under ARBITRARY
  * merge trees — the shape Spark actually produces (per-partition partial
  * buffers, including empty ones, merged in a nondeterministic order).
  * The r12 merge-identity fix and the r12 err-bound tightening both live
  * on paths only a randomized merge tree reaches, so the unit specs'
  * hand-built merges are not enough.
  *
  * Invariants (Metwally et al. + Agarwal et al. "Mergeable Summaries"):
  *  1. stored ≥ true for every key PRESENT in the sketch (overestimate);
  *  2. every key ABSENT from the sketch has true ≤ the sketch's
  *     absent-key bound (max(err, min counter when full));
  *  3. corollary of 2: any key with true count above the absent bound is
  *     guaranteed present (the heavy-hitter containment guarantee);
  *  4. stored ≤ true + absent bound (the overestimate is itself bounded,
  *     so reported counts stay within the published error).
  */
class HeavyHittersPropertySpec extends AnyFunSuite {

  private def absentBound(agg: HeavyHitters, s: SSBuf, capacity: Int): Long =
    if (s.counts.size >= capacity) math.max(s.err, s.counts.values.min)
    else s.err

  test("random merge trees preserve the Space-Saving bounds") {
    val rnd = new scala.util.Random(20260815L)
    (0 until 60).foreach { iter =>
      val capacity = 1 + rnd.nextInt(12)
      val agg = new HeavyHitters(capacity)
      // Zipf-ish stream over a key space larger than capacity
      val nKeys = capacity + 1 + rnd.nextInt(30)
      val n = 50 + rnd.nextInt(400)
      val items = Seq.fill(n) {
        // skewed: low ids much more frequent
        val r = rnd.nextDouble()
        val id = math.min(nKeys - 1, (nKeys * r * r * r).toInt)
        s"k$id"
      }
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap

      // random partitioning, with a sprinkle of EMPTY partitions (every
      // empty Spark partition contributes one zero buffer)
      val nParts = 1 + rnd.nextInt(8)
      val parts = Array.fill(nParts)(Vector.newBuilder[String])
      items.foreach(it => parts(rnd.nextInt(nParts)) += it)
      var bufs: Vector[SSBuf] = parts.toVector.map { b =>
        b.result().foldLeft(agg.zero)((acc, it) => agg.reduce(acc, it))
      } ++ Vector.fill(rnd.nextInt(3))(agg.zero)

      // random binary merge tree
      while (bufs.size > 1) {
        val i = rnd.nextInt(bufs.size)
        val a = bufs(i); bufs = bufs.patch(i, Nil, 1)
        val j = rnd.nextInt(bufs.size)
        val b = bufs(j); bufs = bufs.patch(j, Nil, 1)
        bufs = bufs :+ (if (rnd.nextBoolean()) agg.merge(a, b)
                        else agg.merge(b, a))
      }
      val s = bufs.head
      val bound = absentBound(agg, s, capacity)

      assert(s.counts.size <= capacity, s"iter $iter: size over capacity")
      s.counts.foreach { case (k, stored) =>
        val t = truth.getOrElse(k, 0L)
        assert(stored >= t,
          s"iter $iter: stored $stored < true $t for present key $k")
        assert(stored <= t + bound,
          s"iter $iter: stored $stored > true $t + bound $bound for $k")
      }
      truth.foreach { case (k, t) =>
        if (!s.counts.contains(k))
          assert(t <= bound,
            s"iter $iter: absent key $k has true $t > bound $bound")
      }
      // single-buffer reduce (no merges) must also satisfy the bounds and
      // agree with finish()'s deterministic ordering contract
      val single = items.foldLeft(agg.zero)((acc, it) => agg.reduce(acc, it))
      val fin = agg.finish(single)
      assert(fin === fin.sortBy { case (k, c) => (-c, k) })
    }
  }
}
