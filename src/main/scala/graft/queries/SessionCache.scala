package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** ONE value per (most-recent session, key) — the shared memoizer behind
  * [[AnnEval.index]] and [[DocIndex.index]], so the subtle
  * weak-reference discipline lives in one place.
  *
  * Single-session cache, weak-referenced and REPLACED when a different
  * session arrives. Not a WeakHashMap keyed by the session: the cached
  * values reference their session through every Dataset, which would
  * keep a weak key strongly reachable forever (the WeakHashMap javadoc
  * anti-pattern) — entries would never die. Replacing on session change
  * bounds residency to the most-recent session, whose artifacts are
  * exactly the thing being served.
  */
private[graft] final class SessionCache[V] {

  private var cached: (java.lang.ref.WeakReference[SparkSession],
    ConcurrentHashMap[String, V]) = _

  def get(spark: SparkSession, key: String)(build: => V): V = {
    val perSession = synchronized {
      Option(cached).map(c => (c._1.get(), c._2)) match {
        // a STOPPED session's artifacts are dead weight even when the
        // caller hands back the same object: the weak reference alone
        // cannot reclaim them because the cached values reference the
        // session right back (the same cycle the class doc describes),
        // so drop the entry and rebuild — pinned residency is bounded
        // by the gap until the NEXT get() of any session, not forever
        case Some((s, m)) if (s eq spark) && !s.sparkContext.isStopped => m
        case _ =>
          val m = new ConcurrentHashMap[String, V]()
          cached = (new java.lang.ref.WeakReference(spark), m)
          m
      }
    }
    perSession.computeIfAbsent(key, _ => build)
  }
}
