package graft

import graft.functions.KmvDistinct

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("distinct count below k → sketch holds the whole set exactly") {
    // 40 distinct hashes, each repeated 25 times, shuffled across 4
    // partitions: repeats must not occupy slots, and held < k signals
    // the exact regime
    val data = new scala.util.Random(7)
      .shuffle((1 to 40).flatMap(i => Seq.fill(25)(i * 1000L)))
    val (held, kth) = spark.createDataset(data).repartition(4)
      .select(new KmvDistinct(64).toColumn).head()
    assert(held === 40)
    assert(kth === 40000L)
  }

  test("k-min set is a pure function of the set: order/partitioning-free") {
    val vals = (1L to 5000L).map(v => v * 2654435761L % 1000003L)
    def run(parts: Int, seed: Int): (Int, Long) = {
      val shuffled = new scala.util.Random(seed).shuffle(vals)
      spark.createDataset(shuffled).repartition(parts)
        .select(new KmvDistinct(256).toColumn).head()
    }
    val a = run(1, 1)
    assert(run(8, 2) === a)
    assert(run(32, 3) === a)
    // and the k-th minimum really is the 256th smallest distinct value
    val expected = vals.distinct.sorted.apply(255)
    assert(a === ((256, expected)))
  }

  test("merge keeps the k smallest across buffers (manual merge tree)") {
    val agg = new KmvDistinct(4)
    def bufOf(vs: Long*) = vs.foldLeft(agg.zero)(agg.reduce)
    // left holds {10,20,30,40}, right {5,15,100,200}: union's 4 smallest
    // are {5,10,15,20} regardless of merge direction
    val l = bufOf(10, 20, 30, 40)
    val r = bufOf(100, 5, 200, 15)
    assert(agg.finish(agg.merge(l, r)) === ((4, 20L)))
    val l2 = bufOf(10, 20, 30, 40)
    val r2 = bufOf(100, 5, 200, 15)
    assert(agg.finish(agg.merge(r2, l2)) === ((4, 20L)))
  }

  test("streaming KMV (AvailableNow, two micro-batches) == batch sketch") {
    // the sketch is a pure function of the SET, so the streaming result
    // must equal batch exactly no matter how arrivals split into
    // micro-batches — the property that makes it deployable in a
    // Structured Streaming aggregation at all
    import org.apache.spark.sql.functions.{col, udaf}
    import org.apache.spark.sql.streaming.Trigger
    val vals = (1L to 3000L).map(v => (v % 7, v * 2654435761L % 999983L))
      .toDF("grp", "h")
    val stage = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    // ONE part-file per half (coalesce) so maxFilesPerTrigger=1 yields
    // exactly the two micro-batches the test name promises — an
    // un-coalesced local relation writes one file per partition
    vals.filter(col("h") % 2 === 0).coalesce(1).write.mode("append").parquet(stage)
    vals.filter(col("h") % 2 === 1).coalesce(1).write.mode("append").parquet(stage)
    val kmvU = udaf(new KmvDistinct(128))
    // one file per trigger, or AvailableNow drains both staged files in a
    // single micro-batch and the cross-batch state merge is never exercised
    val stream = spark.readStream.schema(vals.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .groupBy("grp").agg(kmvU(col("h")).as("sk"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("kmv_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("kmv_stream").orderBy("grp").collect()
    val batch = vals.groupBy("grp").agg(kmvU(col("h")).as("sk"))
      .orderBy("grp").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("buffer survives a serialization round-trip (transient sorted view)") {
    // the Kryo trap: a deserialized mutable.TreeSet has a null internal
    // tree — KmvBuf must rebuild its sorted view from the HashSet state
    val agg = new KmvDistinct(3)
    val buf = Seq(9L, 1L, 5L, 7L).foldLeft(agg.zero)(agg.reduce)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(buf)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.functions.KmvBuf]
    // reduce + finish exercise the rebuilt tree on the deserialized state
    assert(agg.finish(agg.reduce(back, 2L)) === ((3, 5L)))
  }
}
