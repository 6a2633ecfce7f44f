package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level text cleaning for training-data pipelines. */
object Clean {

  /** C4-style boilerplate removal over pre-segmented documents (the C4
    * pipeline drops any line occurring verbatim more than a handful of
    * times in the corpus — nav bars, cookie banners, footers; Raffel et
    * al., "Exploring the Limits of Transfer Learning with a Unified
    * Text-to-Text Transformer", §2.2). Input is one row per
    * `(doc, position, segment)`; a segment whose corpus-wide document
    * frequency reaches `minDf` is boilerplate. Output is one row per doc:
    * the surviving segments reassembled in position order plus kept /
    * dropped counters.
    *
    * Scale shape: segment identity travels as md5 — the df aggregation
    * and the flag join are both keyed on the 16-byte hash, never the
    * segment text, so shuffle width is independent of segment length.
    * The df side is `groupBy(hash).agg(count_distinct(doc))` (map-side
    * combined); boilerplate hashes are a tiny minority, so AQE turns the
    * flag join into a broadcast. Reassembly is one `collect_list` over
    * `(pos, seg)` structs sorted row-locally — no window, no global sort.
    */
  def removeBoilerplate(segs: DataFrame, idCol: String, posCol: String,
                        segCol: String, minDf: Int): DataFrame = {
    // a NULL segment is NO CONTENT and is dropped on entry. Left in, it
    // breaks every downstream step in a different direction: md5(NULL)
    // is NULL so the df join can never flag it boilerplate however often
    // it recurs, it inflates n_kept, and array_join silently omits its
    // text — n_kept would disagree with the reassembled clean_text
    val hashed = segs.filter(col(segCol).isNotNull)
      .withColumn("__seg_hash", md5(col(segCol)))
    val bp = hashed.groupBy(col("__seg_hash"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__seg_hash"), lit(true).as("__is_bp"))
    val kept = sum(when(!col("__is_bp"), 1L).otherwise(0L))
    hashed.join(bp, Seq("__seg_hash"), "left")
      .withColumn("__is_bp", coalesce(col("__is_bp"), lit(false)))
      .groupBy(col(idCol))
      .agg(
        // NULL (not "") when every segment was boilerplate — the
        // zero-surviving-rows semantics of SQL's `string_agg … FILTER`
        when(kept > 0, array_join(transform(
          array_sort(collect_list(when(!col("__is_bp"),
            struct(col(posCol).as("p"), col(segCol).as("s"))))),
          x => x.getField("s")), " ")).as("clean_text"),
        kept.as("n_kept"),
        sum(when(col("__is_bp"), 1L).otherwise(0L)).as("n_dropped"))
  }
}
