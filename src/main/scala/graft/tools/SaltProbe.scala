package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the banded simhash join's bucket skew and the salted-join
  * trade at a given lake: top (chunk_idx, chunk_val) bucket sizes, then
  * wall time of `Dedup.simhashPairs` at several salt factors (losslessness
  * is SkewSpec's contract; this probe informs the auto-salting threshold).
  *
  * args: [sfDir] [maxHamming] [partitions] [salts...]
  *
  * `sfDir` may be `boiler:<hotDocs>:<uniqueDocs>` to synthesize the
  * degenerate boilerplate corpus instead of reading a lake: `hotDocs`
  * identical texts (ONE simhash — every chunk bucket hot) + `uniqueDocs`
  * diverse ones. With a dominant group the crossover ratio is
  * structurally c_max²/(W/P) ≈ P/nChunks, so sweeping `partitions`
  * sweeps the ratio across the hotFactor bar — the near-bar calibration
  * the round-12 probe (ratio 3.2, firmly below) couldn't reach.
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1_synth")
    val maxHamming = args.lift(1).map(_.toInt).getOrElse(8)
    val partitions = args.lift(2).map(_.toInt).getOrElse(32)
    val salts = if (args.length > 3) args.drop(3).map(_.toInt).toSeq else Seq(0, 4, 8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs =
      if (sfDir.startsWith("boiler:")) {
        val parts = sfDir.split(":")
        val (hot, uniq) = (parts(1).toLong, parts(2).toLong)
        spark.range(hot).select(col("id").as("doc_id"),
            lit("the same boilerplate footer text repeated on every " +
              "page of the corpus site year after year").as("text"))
          .union(spark.range(uniq).select((col("id") + 100000000L).as("doc_id"),
            concat(lit("unique document number "), col("id"),
              lit(" carries words w"), col("id") * 7, lit(" w"),
              col("id") * 13, lit(" w"), col("id") * 29, lit(" tail"),
              col("id")).as("text")))
      } else graft.Lake.table(spark, sfDir, "documents")
    val sigs = graft.operators.Dedup.simhash(docs, "doc_id", "text")
      .localCheckpoint()
    // bucket histogram: the candidate join's per-bucket work is size².
    // Chunk layout comes from Dedup.simhashChunks — the SAME definition
    // the join shuffles on, so the probe cannot silently measure
    // different buckets than the join uses.
    val chunks = graft.operators.Dedup
      .simhashChunks(sigs, "doc_id", maxHamming + 1)
    val top = chunks.groupBy("chunk_idx", "chunk_val").count()
      .orderBy(col("count").desc).limit(5).collect()
    println("[salt] top buckets: " +
      top.map(r => s"(${r.get(0)},${r.get(1)})=${r.getLong(2)}").mkString(", "))
    // the crossover inputs (Skew.chooseSalts / SCALING.md formula):
    // c_max, W = Σc², the fair per-partition share W/P, and the decision
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val h = chunks.groupBy("chunk_idx", "chunk_val").count()
      .agg(max("count").as("cmax"), // double-squared: see Skew.chooseSalts
        sum(col("count").cast("double") * col("count")).as("w"))
      .head()
    val (cmax, w) = (h.getLong(0).toDouble, h.getDouble(1))
    val chosen = graft.operators.Skew.chooseSalts(
      chunks, Seq("chunk_idx", "chunk_val"), parts, hotFactor = 16.0,
      maxSalts = 64)
    println(f"[salt] cmax=${cmax.toLong} W=${w.toLong} fair=W/P=${w / parts}%.0f " +
      f"ratio=cmax2/fair=${cmax * cmax * parts / w}%.2f chooseSalts=$chosen")
    salts.foreach { s =>
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.simhashPairs(sigs, "doc_id", maxHamming,
        salts = s).count()
      println(f"[salt] salts=$s%2d pairs=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
