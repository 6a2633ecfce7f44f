package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Scale probe for the span-dedup index split (d23): at a given lake
  * dir, times (a) the one-time index build — gram positions + the
  * duplicated-gram set, the two tables `graft.queries.DocIndex`
  * checkpoints per session and a production service persists — and
  * (b) N SERVED span runs (semi-join + per-doc island window only),
  * the steady-state query shape. The artifact behind SCALING.md's
  * "span index split" row: the df aggregation is the super-linear
  * piece (Σ gram occurrences shuffle), and the split moves it from
  * every-run to once.
  *
  * args: [sfDir] [reps]
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1_synth")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[span] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Lake.table(spark, sfDir, "documents")
    val grams = time("index: gramPositions") {
      val g = Dedup.gramPositions(docs, "doc_id", "text", 5).localCheckpoint()
      println("[span] n_gram_occurrences=" + g.count()); g
    }
    val dup = time("index: duplicatedGrams") {
      val d = Dedup.duplicatedGrams(grams, "doc_id", 2).localCheckpoint()
      println("[span] n_dup_grams=" + d.count()); d
    }
    (1 to reps).foreach { r =>
      time(s"served span run $r") {
        Dedup.duplicateSpansFromIndex(grams, dup, "doc_id", n = 5)
          .write.mode("overwrite").format("noop").save()
      }
    }
    time("one-shot (unserved) span run") {
      Dedup.duplicateSpans(docs, "doc_id", "text")
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
