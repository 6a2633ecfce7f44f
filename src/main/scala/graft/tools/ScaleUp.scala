package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Builds a 10×-documents / 10×-embeddings synthetic lake under /tmp (id
  * ranges shifted per copy so hashes/dup-structure replicate, ids stay
  * unique) for scale-stress runs of the dedup/similarity pipelines.
  * Correctness still runs only on the driver-generated lake; this exists
  * to measure how the pair-generating operators grow with corpus size.
  *
  * 4th arg `mode`: "perturb" (default — 9 of 10 copies get a suffix, so
  * the growth is in NEAR-dup density) or "exact" (all copies
  * byte-identical — the crawl-shaped lake where exact-dup density grows
  * 10×, used to measure how d24's exact-first collapse bounds the
  * near-dup stages vs running them raw).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1_synth")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val exact = args.lift(3).contains("exact")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Lake.table(spark, src, "documents")
    val nDocs = docs.count()
    (0 until copies).map(i => docs
        .withColumn("doc_id", col("doc_id") + lit(i * nDocs))
        .withColumn("text", // perturb 9 of 10 copies so exact dups don't explode 10×
          when(lit(exact) || lit(i) === 0, col("text"))
            .otherwise(concat(col("text"), lit(" v" + i)))))
      .reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    val emb = graft.Lake.table(spark, src, "embeddings")
    val nEmb = emb.count()
    (0 until copies).map(i => emb
        .withColumn("vec_id", col("vec_id") + lit(i * nEmb)))
      .reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    println(s"SCALEUP wrote $out: ${nDocs * copies} docs, ${nEmb * copies} vecs")
    spark.stop()
  }
}
