package graft

/** No SparkEntry query may leak a CacheManager entry: operator-internal
  * materialization barriers are localCheckpoints (GC-released with the
  * DataFrame), never bare persist() — a long-running driver serving many
  * configs would otherwise accumulate cached relations forever.
  */
class CacheHygieneSpec extends SparkSpec {

  test("every SparkEntry query leaves the cache manager empty") {
    val leaked = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, sf).write.mode("overwrite").format("noop").save()
      if (!spark.sharedState.cacheManager.isEmpty) {
        leaked += name
        spark.sharedState.cacheManager.clearCache()
      }
    }
    assert(leaked.isEmpty, s"queries leaking cached relations: $leaked")
  }
}
