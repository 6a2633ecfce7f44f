package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design (the whole point of these shapes at 100 TB):
  *  - Exact dedup is one hash-aggregate — map-side partial `min`/`count`
  *    combine before the shuffle, so traffic is one row per distinct hash.
  *  - MinHash signatures are 1 row/doc after a single explode+groupBy whose
  *    `min()` aggregates also combine map-side; the doc×shingle blow-up
  *    never crosses the network.
  *  - LSH candidates come from an equi-join on (band_idx, band_hash) — a
  *    shuffle keyed by tiny band hashes instead of the O(n²) cross join;
  *    exact Jaccard verification then runs ONLY over candidate docs.
  *  - All hashing is md5-derived → deterministic, seedless, and exactly
  *    reproducible in the DuckDB oracle.
  */
object Dedup {

  /** Exact dedup: group by content hash; keep the smallest id as keeper
    * (deterministic survivor rule).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))

  /** Distinct (id, shingle) pairs — the shared front end of the
    * MinHash/Jaccard family.
    */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol),
        explode(TextFns.charShingles(col(textCol), k)).as("shingle"))
      .distinct()

  private def minhashCol(i: Int): Column =
    min(md5(concat(lit(i.toString), lit("|"), col("shingle")))).as(s"mh_$i")

  /** MinHash signatures: `numHashes` permutations simulated by salted md5
    * (hash_i(s) = md5(i ‖ '|' ‖ s)), min taken lexicographically over the
    * doc's shingles, then grouped into `numBands` band hashes. 1 row/doc.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 5, numHashes: Int = 8,
                        numBands: Int = 2): DataFrame = {
    require(numHashes % numBands == 0)
    val rowsPerBand = numHashes / numBands
    val sh = shingleTable(docs, idCol, textCol, k)
    val aggs = (0 until numHashes).map(minhashCol)
    val sigs = sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    (0 until numBands).foldLeft(sigs) { (df, b) =>
      val parts = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh_$i"))
      df.withColumn(s"band_$b", md5(concat(parts: _*)))
    }
  }

  /** LSH candidate pairs: docs sharing any band hash (a < b). The join is
    * keyed on (band_idx, band_hash) — at scale this is the only shuffle, and
    * AQE handles hot buckets.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, numBands: Int = 2): DataFrame = {
    val bands = sigs.select(col(idCol).as("id"),
      explode(array((0 until numBands).map(b =>
        struct(lit(b).as("band_idx"), col(s"band_$b").as("band_hash"))): _*)).as("b"))
      .select(col("id"), col("b.band_idx"), col("b.band_hash"))
    bands.as("l").join(bands.as("r"),
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"))
      .distinct()
  }

  /** Exact Jaccard over a given candidate pair set — verification stage of
    * the LSH pipeline. Shingle join is restricted (semi-join) to docs that
    * appear in `candidates` first, so cost scales with candidates, not
    * corpus.
    */
  def jaccardVerify(candidates: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    val candDocs = candidates.select(col("a_id").as(idCol))
      .union(candidates.select(col("b_id"))).distinct()
    val shc = sh.join(candDocs, idCol, "left_semi")
    val sizes = shc.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = shc.as("l").join(shc.as("r"),
        col("l.shingle") === col("r.shingle") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .groupBy(col(s"l.$idCol").as("a_id"), col(s"r.$idCol").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    candidates.join(inter, Seq("a_id", "b_id"), "inner")
      .join(sizes.withColumnRenamed(idCol, "a_id").withColumnRenamed("sz", "sz_a"), "a_id")
      .join(sizes.withColumnRenamed(idCol, "b_id").withColumnRenamed("sz", "sz_b"), "b_id")
      .withColumn("jaccard",
        round(col("inter") * lit(1.0) /
          (col("sz_a") + col("sz_b") - col("inter")), 6))
      .select("a_id", "b_id", "inter", "jaccard")
  }

  /** N-gram Jaccard near-dup pairs WITHOUT LSH: candidates are pairs sharing
    * at least one *rare* shingle (document frequency ≤ maxDf — the classic
    * prefix/rare-token pruning that keeps the self-join from exploding on
    * stopword-like shingles), then exact Jaccard ≥ `minJaccard`.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, maxDf: Int = 50,
                   minJaccard: Double = 0.8): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, k)
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("shingle")
    val shr = sh.join(rare, "shingle", "left_semi")
    val cands = shr.as("l").join(shr.as("r"),
        col("l.shingle") === col("r.shingle") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a_id"), col(s"r.$idCol").as("b_id"))
      .distinct()
    jaccardVerify(cands, sh, idCol).filter(col("jaccard") >= minJaccard)
  }

  /** SimHash: 60-bit signature over whitespace tokens (with multiplicity).
    * Computed as 60 per-bit ±1 sums in ONE aggregation (no per-bit row
    * explosion) — map-side combinable, 1 row/doc out.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 60): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextFns.words(col(textCol))).as("w"))
      .select(col(idCol), TextFns.hash60(col("w")).as("h"))
    val sums = (0 until bits).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"s_$j"))
    val agg = toks.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val sig = (0 until bits).map(j =>
      when(col(s"s_$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** Hamming-distance near-dup pairs over simhash signatures. Exact
    * all-pairs here; at corpus scale the candidate step is chunked banding
    * ((d+1)-way pigeonhole on the signature) before `bit_count(xor)`.
    */
  def simhashPairs(sigs: DataFrame, idCol: String, maxHamming: Int): DataFrame =
    sigs.as("l").join(sigs.as("r"), col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a_id"), col(s"r.$idCol").as("b_id"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
}
