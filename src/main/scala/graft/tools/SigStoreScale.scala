package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures DocIndexStore's write-path contract at a given lake: seed the
  * persisted signature index with the full corpus, then land a small
  * incremental batch — committed bytes must scale with the BATCH, not
  * the corpus (the same claim BulkScale measures for the tag delta-log).
  *
  * args: [sfDir] [batchDocs]
  */
object SigStoreScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchDocs = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Lake.table(spark, sfDir, "documents")
    val nDocs = docs.count()
    val sim = graft.operators.Dedup.simhash(docs, "doc_id", "text")
      .localCheckpoint()
    val mh = graft.operators.Dedup.minhashFromSets(
      graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 5), "doc_id")
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft_sigscale").toString
    val t0 = System.nanoTime()
    graft.operators.DocIndexStore.write(root,
      graft.operators.DocIndexStore.Components(sim, mh))
    val dtSeed = (System.nanoTime() - t0) / 1e9
    val seeded = Fs.dirBytes(root)
    println(f"SIGSTORE docs=$nDocs%7d seed        wall=$dtSeed%6.2fs bytes=$seeded")
    // incremental batch: signatures for `batchDocs` docs (re-stamped ids
    // so they read as NEW ingest rows)
    val batchSim = sim.limit(batchDocs)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val batchMh = mh.limit(batchDocs)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val t1 = System.nanoTime()
    graft.operators.DocIndexStore.appendSimhash(root, batchSim)
    graft.operators.DocIndexStore.appendMinhash(root, batchMh)
    val dtApp = (System.nanoTime() - t1) / 1e9
    println(f"SIGSTORE docs=$nDocs%7d append_$batchDocs%-4d wall=$dtApp%6.2fs " +
      f"batch_bytes=${Fs.dirBytes(root) - seeded} total_bytes=${Fs.dirBytes(root)}")
    Fs.deleteRec(root)
    spark.stop()
  }

}
