package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Byte-pair-encoding merge training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016 — the
  * tokenizer-training loop of every modern LLM data pipeline).
  *
  * Scale shape: the corpus is touched ONCE — a word-frequency aggregation
  * (map-side combined) whose output is bounded by word TYPES, not corpus
  * size. Every subsequent iteration runs on that vocab table: pair counts
  * are a freq-weighted aggregation over adjacent symbol pairs, the argmax
  * pair is one `orderBy().limit(1)` (TakeOrderedAndProject — the learned
  * merge rule is model data, like a centroid), and the merge applies as a
  * row-local left-to-right fold over each word's symbol array. Iteration
  * state is localCheckpointed per step — the same iterative-DataFrame
  * lineage discipline as [[Graph.connectedComponents]].
  */
object Bpe {

  /** ONE merge rule applied to a symbol array as a row-local
    * left-to-right non-overlapping fold: append each symbol unless the
    * accumulated tail is exactly (ml, mr) — then the tail collapses into
    * the merged symbol. A just-merged symbol can never re-merge in the
    * same pass (standard BPE). THE shared definition for train and
    * encode — the round trip and the DuckDB oracle both depend on the
    * two sides folding bit-identically, so the expression must not be
    * able to fork between them.
    */
  private def mergeFold(symbols: Column, ml: String, mr: String): Column =
    aggregate(symbols, array().cast("array<string>"),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === lit(ml) && x === lit(mr),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(ml + mr))))
          .otherwise(concat(acc, array(x))))


  /** Learn `steps` merge rules over whitespace-tokenized text. Returns
    * `(step, merge_left, merge_right, merged, pair_freq)` — the ordered
    * merge table that IS the trained tokenizer. Determinism: best pair =
    * max summed frequency, ties to the lexicographically smallest
    * (left, right).
    */
  def train(docs: DataFrame, textCol: String, steps: Int): DataFrame = {
    require(steps >= 1, "bpe: steps must be >= 1")
    val spark = docs.sparkSession
    var cur = docs
      .select(explode(TextFns.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("s"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val top = cur.filter(size(col("s")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("s")) - 1),
            i => struct(element_at(col("s"), i).as("ml"),
              element_at(col("s"), i + 1).as("mr")))).as("p"))
        .groupBy(col("p.ml").as("ml"), col("p.mr").as("mr"))
        .agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("ml").asc, col("mr").asc)
        .head(1)
      if (top.isEmpty) exhausted = true // every word fully merged: done
      else {
        val best = top.head
        val (ml, mr, f) = (best.getString(0), best.getString(1), best.getLong(2))
        merges += ((step, ml, mr, ml + mr, f))
        if (step < steps) {
        // left-to-right non-overlapping merge as a row-local fold: append
        // each symbol unless the accumulated tail is exactly (ml, mr) —
        // then the tail collapses into the merged symbol. A just-merged
        // symbol can never re-merge in the same pass (standard BPE).
          cur = cur.withColumn("s",
            when(size(col("s")) < 2, col("s"))
              .otherwise(mergeFold(col("s"), ml, mr)))
            .localCheckpoint()
        }
        step += 1
      }
    }
    import spark.implicits._
    merges.result()
      .toDF("step", "merge_left", "merge_right", "merged", "pair_freq")
  }

  /** Apply an ORDERED merge table to the corpus vocabulary — the encode
    * half of the train→encode pair. Returns `(w, symbols)`: each DISTINCT
    * word with its post-merge symbol array. Vocab-bounded by design: at
    * 100 TB you encode word TYPES once and join docs against the result
    * (broadcast — the vocab is model-sized), never re-folding per
    * occurrence. Cost: ONE word-type dedup (`distinct()` — the same
    * map-side-combined shuffle `train`'s vocab aggregation pays) followed
    * by a narrow per-word fold projection. Each merge rule is the same
    * row-local left-to-right non-overlapping fold used during training,
    * applied in rule order as nested codegen'd `aggregate` expressions —
    * which bounds this FORM to small merge tables (tens of rules: the
    * expression tree grows linearly with the rule count and a
    * production-size tokenizer's 30k+ merges would breach codegen method
    * limits). At real tokenizer sizes use [[encodeTyped]] — the same
    * vocab-bounded contract with the per-word fold as a typed map over
    * the driver-held merge table (BpeSpec holds the two equal).
    */
  def encode(docs: DataFrame, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val chars = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    // no size-1 guard per level (unlike train's in-place update): the
    // fold is a no-op on singleton arrays anyway, and a `when(cur, cur)`
    // wrapper would duplicate the nested expression tree per rule
    val sym = merges.foldLeft(chars) { case (cur, (ml, mr)) =>
      mergeFold(cur, ml, mr)
    }
    docs.select(explode(TextFns.words(col(textCol))).as("w")).distinct()
      .select(col("w"), sym.as("symbols"))
  }

  /** [[encode]] for PRODUCTION-size merge tables: identical semantics
    * (each rule a left-to-right non-overlapping pass, rules in order),
    * but the per-word fold runs as a typed map over the broadcast-held
    * rule list instead of one nested Catalyst expression per rule — rule
    * count stops being an expression-tree bound (a 30k-merge tokenizer
    * is a loop bound here, where [[encode]]'s nesting would breach
    * codegen method limits). Same vocab-bounded shape: word types dedup
    * once, then one mapPartitions pass. BpeSpec holds the two encoders
    * equal on random corpora and drives this one at a rule count the
    * expression form cannot reach.
    */
  def encodeTyped(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules = merges.toArray
    docs.select(explode(TextFns.words(col(textCol))).as("w")).distinct()
      .as[String]
      .mapPartitions { it =>
        it.map { w =>
          // split by CODE POINT, not UTF-16 unit: Spark's substr (the
          // train/encode seeding) counts code points, so a supplementary
          // char (emoji, CJK-ext) is ONE seed symbol there — splitting
          // it into surrogate halves here would diverge the encoders
          var syms = w.codePoints().toArray
            .map(cp => new String(Character.toChars(cp)))
          var r = 0
          while (r < rules.length) {
            val (ml, mr) = rules(r)
            if (syms.length >= 2) {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (out.nonEmpty && out.last == ml && syms(i) == mr) {
                  out(out.length - 1) = ml + mr // tail collapses; the
                  // merged symbol cannot re-merge in the same pass:
                  // the next comparison reads out.last == ml+mr ≠ ml
                } else out += syms(i)
                i += 1
              }
              syms = out.toArray
            }
            r += 1
          }
          (w, syms.toSeq)
        }
      }
      .toDF("w", "symbols")
  }
}
