package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Lake
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Graph, Similarity}
import graft.queries.CoreQueries.Q

/** Round-2 training-data pipeline operators: dedup clustering (connected
  * components), Gopher-style repetition quality, embedding quantization,
  * nearest-centroid classification, stratified sampling, vocabulary
  * building, per-window trending. Same parity discipline as DataQueries:
  * md5-derived hashing, exact decimal sums, IEEE-identical float chains.
  */
object DataQueries2 {

  import Shared.{docs, cosSql}

  // ---------------------------------------------------- dedup clustering

  /** Connected components over simhash near-dup pairs: the transitive
    * closure that turns pairwise near-dup hits into duplicate GROUPS with
    * a deterministic min-id keeper — the step between "find near-dups"
    * and "drop them" in a dedup pipeline.
    */
  def d09DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.simhashPairs(
      DocIndex.index(spark, dir).simhash, "doc_id",
      maxHamming = 8)
    Graph.connectedComponents(pairs, "a_id", "b_id")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .orderBy("doc_id")
  }

  val d09Oracle: String =
    s"""WITH RECURSIVE ${DataQueries.simhashCtes},
       |pairs AS (
       |  SELECT l.doc_id AS a, r.doc_id AS b
       |  FROM sims l JOIN sims r ON l.doc_id < r.doc_id
       |  WHERE bit_count(xor(l.simhash, r.simhash)) <= 8),
       |edges AS (SELECT a AS u, b AS v FROM pairs
       |          UNION SELECT b, a FROM pairs),
       |reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
       |         FROM reach GROUP BY u)
       |SELECT doc_id, cluster_id,
       |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
       |FROM comp ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- repetition quality

  /** Gopher-style repetition signals, all ROW-LOCAL (zero shuffle):
    * distinct-token fraction, top-token fraction, duplicate-2-gram
    * fraction. The per-doc O(distinct×tokens) top-token count trades
    * asymptotics for narrowness — at 100 TB a shuffle per doc-token is
    * the cost that matters, not 10^4 in-row comparisons.
    */
  def t07Repetition(spark: SparkSession, dir: String): DataFrame = {
    // all five counters come from ONE native O(tokens) hash-count pass
    // (plans.TokenStats); the Column-composed form is O(distinct×tokens)
    // interpreted lambdas per doc — 6× growth at 10× corpus. The struct is
    // materialized in its own projection, then the fractions read its
    // fields (non-cheap multi-referenced aliases stay materialized).
    import org.apache.spark.sql.graft.{Bridge => B}
    import graft.plans.TokenStats
    val n = col("ts.n_tokens")
    docs(spark, dir)
      .select(col("doc_id"),
        B.column(TokenStats(B.expression(col("text")))).as("ts"))
      .select(
        col("doc_id"), n.as("n_tokens"),
        round(col("ts.n_distinct") * lit(1.0) / n, 4).as("distinct_frac"),
        round(col("ts.top_count") * lit(1.0) / n, 4).as("top_word_frac"),
        round(when(col("ts.n_grams") > 0,
            lit(1.0) - col("ts.n_distinct_grams") * lit(1.0) / col("ts.n_grams"))
          .otherwise(lit(0.0)), 4).as("dup_2gram_frac"))
      .orderBy("doc_id")
  }

  val t07Oracle: String =
    """WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), w -> length(w) > 0) AS ws
      |  FROM documents),
      |g AS (SELECT doc_id, ws, len(ws) AS n,
      |  CASE WHEN len(ws) >= 2
      |       THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
      |       ELSE [] END AS grams
      |  FROM t)
      |SELECT doc_id, n AS n_tokens,
      |  round(len(list_distinct(ws)) * 1.0 / n, 4) AS distinct_frac,
      |  round(list_max(list_transform(list_distinct(ws),
      |    d -> len(list_filter(ws, x -> x = d)))) * 1.0 / n, 4) AS top_word_frac,
      |  round(CASE WHEN len(grams) > 0
      |    THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
      |    ELSE 0.0 END, 4) AS dup_2gram_frac
      |FROM g ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ embedding quantization

  /** Int8 scalar quantization of the embedding column (per-vector min/max
    * affine code), entirely row-local, with integer-exact checksums: the
    * quantized-code sum and the reconstruction error in femto units
    * (floor(err·10^12) summed as BIGINT) — both engine-portable without
    * any float-accumulation-order concern.
    */
  def s04Quantize(spark: SparkSession, dir: String): DataFrame = {
    VectorFns.register(spark)
    // mn/mx materialized as columns: referenced inside the per-element
    // transform lambdas, inline array_min/array_max would be recomputed
    // for every element (same trap as t07's inline token array)
    val e = Lake.table(spark, dir, "embeddings")
      .select(col("vec_id"), VectorFns.toDoubleArray(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        array_min(col("v")).as("mn"), array_max(col("v")).as("mx"))
    val mn = col("mn")
    val mx = col("mx")
    val scale = (mx - mn) / lit(255.0)
    def qOf(x: Column): Column =
      least(floor((x - mn) * lit(255.0) / (mx - mn)), lit(255.0)).cast("long")
    val qSum = aggregate(transform(col("v"), x => qOf(x)), lit(0L), _ + _)
    val errE12 = aggregate(
      transform(col("v"),
        x => floor(abs(x - (mn + qOf(x).cast("double") * scale)) * lit(1e12)).cast("long")),
      lit(0L), _ + _)
    e.select(col("vec_id"), size(col("v")).as("n_dims"),
        round(mn, 6).as("v_min"), round(mx, 6).as("v_max"),
        qSum.as("q_sum"), errE12.as("err_e12"))
      .orderBy("vec_id")
  }

  val s04Oracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      |m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx,
      |        (list_max(v) - list_min(v)) / 255.0 AS scale FROM e)
      |SELECT vec_id, len(v) AS n_dims,
      |  round(mn, 6) AS v_min, round(mx, 6) AS v_max,
      |  CAST(list_sum(list_transform(v,
      |    x -> CAST(least(floor((x - mn) * 255.0 / (mx - mn)), 255) AS BIGINT)))
      |    AS BIGINT) AS q_sum,
      |  CAST(list_sum(list_transform(v,
      |    x -> CAST(floor(abs(x - (mn + CAST(least(floor((x - mn) * 255.0 / (mx - mn)), 255) AS BIGINT) * scale)) * 1e12) AS BIGINT)))
      |    AS BIGINT) AS err_e12
      |FROM m ORDER BY vec_id""".stripMargin

  // ------------------------------------- nearest-centroid classification

  /** Nearest-centroid classification over the labeled embeddings: per-label
    * mean vectors (exact decimal whole-array sums → identical doubles in
    * both engines), then every vector is assigned to its cosine-nearest
    * centroid ([[Similarity.ivfAssign]]'s narrow argmax) and the confusion
    * matrix is one keyed aggregation.
    *
    * The centroid build is ONE [[DecimalVecSum]] pass — k×d buffer state
    * across the shuffle, no per-dimension row explosion (the round-7
    * posexplode form was 27× slower than the oracle here).
    */
  def s05CentroidClassify(spark: SparkSession, dir: String): DataFrame = {
    VectorFns.register(spark)
    val ev = Lake.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        VectorFns.toDoubleArray(col("embedding")).as("vec"))
    val carr = ev.groupBy("label")
      .agg(graft.functions.DecimalVecSum.sum12(col("vec")).as("cs"))
      .select(col("label").cast("long").as("centroid_id"),
        transform(col("cs._2"), x => x / col("cs._1")).as("cvec"))
    // label rides through the assignment — no corpus-corpus re-join
    Similarity.ivfAssign(ev, carr)
      .groupBy(col("label").cast("int").as("label"),
        col("centroid_id").cast("int").as("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "pred_label")
  }


  val s05Oracle: String =
    s"""WITH e AS (SELECT vec_id, label,
       |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |dims AS (SELECT label, i AS pos, v[i] AS x
       |         FROM e, unnest(generate_series(1, len(v))) AS t(i)),
       |cent AS (SELECT label, pos,
       |    CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
       |  FROM dims GROUP BY 1, 2),
       |carr AS (SELECT label, list(m ORDER BY pos) AS cv FROM cent GROUP BY label),
       |best AS (SELECT vec_id, label, pred FROM (
       |    SELECT e.vec_id, e.label, c.label AS pred,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.label ASC) AS rn
       |    FROM e CROSS JOIN carr c) WHERE rn = 1)
       |SELECT CAST(label AS INT) AS label, CAST(pred AS INT) AS pred_label,
       |  count(*) AS n
       |FROM best GROUP BY 1, 2 ORDER BY label, pred_label""".stripMargin

  // ----------------------------------------------- stratified sampling

  /** Deterministic stratified sampling: per-language keep rates applied
    * via the content hash (reshuffle-proof, like d07's split) — the
    * standard "rebalance the language mix" step. Pure narrow filter.
    */
  def d10StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", 500)
      .when(col("lang") === "de", 250).otherwise(100)
    docs(spark, dir)
      .withColumn("keep", TextFns.hash28(col("text")) % 1000 < rate)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        count(when(col("keep"), 1)).as("n_sampled"))
      .withColumn("sampled_frac",
        round(col("n_sampled") * lit(1.0) / col("n_total"), 4))
      .orderBy("lang")
  }

  val d10Oracle: String =
    """WITH d AS (SELECT lang,
      |  ('0x' || substr(md5(text), 1, 7))::BIGINT % 1000 <
      |    CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 ELSE 100 END AS keep
      |  FROM documents)
      |SELECT lang, count(*) AS n_total,
      |  count(CASE WHEN keep THEN 1 END) AS n_sampled,
      |  round(count(CASE WHEN keep THEN 1 END) * 1.0 / count(*), 4)
      |    AS sampled_frac
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ----------------------------------------------- vocabulary building

  /** Tokenizer-vocab building: corpus word frequencies, top 20 by
    * (count desc, word asc). Map-side-combined groupBy + distributed
    * top-k (TakeOrderedAndProject) — no global sort.
    */
  def t09VocabTopK(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(TextFns.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(20)

  val t09Oracle: String =
    """SELECT w, cnt FROM (
      |  SELECT w, count(*) AS cnt,
      |    row_number() OVER (ORDER BY count(*) DESC, w ASC) AS rn
      |  FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |                                  w -> length(w) > 0)) AS w
      |        FROM documents)
      |  GROUP BY w)
      |WHERE rn <= 20""".stripMargin

  // ------------------------------------------------- per-window top-k

  /** Trending events: top-3 event types per 5-minute window — the keyed
    * top-k shape (rank window PARTITIONED by the time bucket, so it scales
    * with the window count, never a global sort).
    */
  def st05Trending(spark: SparkSession, dir: String): DataFrame = {
    val counts = Lake.spread(Lake.table(spark, dir, "events"), col("event_id"))
      .groupBy(window(col("ts"), "5 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("window_start"), col("event_type"), col("n"))
    val w = Window.partitionBy("window_start")
      .orderBy(col("n").desc, col("event_type").asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("window_start", "rn")
  }

  val st05Oracle: String =
    """SELECT window_start, event_type, n, rn FROM (
      |  SELECT window_start, event_type, n,
      |    row_number() OVER (PARTITION BY window_start
      |                       ORDER BY n DESC, event_type ASC) AS rn
      |  FROM (SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
      |          event_type, count(*) AS n
      |        FROM events GROUP BY 1, 2))
      |WHERE rn <= 3 ORDER BY window_start, rn""".stripMargin

  // ------------------------------------------------ stream-stream join

  /** Purchases with the count of preceding views by the same user within
    * 10 minutes — batch form of the watermarked stream-stream interval
    * join ([[graft.streaming.Streams.viewsBeforePurchases]]; streaming
    * parity in StreamingSpec).
    */
  def st06IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Lake.table(spark, dir, "events")
    graft.streaming.Streams.viewsBeforePurchases(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"), minutes = 10)
      .select("event_id", "user_id", "n_prior_views")
      .orderBy("event_id")
  }

  val st06Oracle: String =
    """SELECT p.event_id AS event_id, p.user_id AS user_id,
      |       count(*) AS n_prior_views
      |FROM events p JOIN events v
      |  ON v.user_id = p.user_id
      | AND v.ts >= p.ts - INTERVAL 10 MINUTE AND v.ts < p.ts
      |WHERE p.event_type = 'purchase' AND v.event_type = 'view'
      |GROUP BY 1, 2 ORDER BY p.event_id""".stripMargin

  // ------------------------------------------------------------ TF-IDF

  /** Top TF-IDF term per document: corpus df table (map-side-combined,
    * joined back UNHINTED — document frequency is vocabulary-sized and
    * vocabulary grows with the corpus, so a forced broadcast would OOM at
    * web scale; AQE broadcasts only when it fits), per-doc tf,
    * score = tf·ln(N/df), keyed top-1 window. The word explode is the only
    * corpus-wide shuffle.
    */
  def t10TfIdf(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val nDocs = d.count()
    val words = d.select(col("doc_id"), explode(TextFns.words(col("text"))).as("w"))
    // materialized once: tf feeds BOTH the df derivation and the score
    // join — without the barrier each consumer re-runs the corpus-wide
    // explode+groupBy. df then falls out of tf directly (tf rows are
    // already distinct per (doc, w)), replacing the second explode AND
    // the distinct shuffle with one vocab-sized aggregation.
    val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("w").asc)
    tf.join(dfreq, "w")
      .withColumn("score", col("tf") * log(lit(nDocs.toDouble) / col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("w").as("top_term"),
        round(col("score"), 6).as("tfidf"))
      .orderBy("doc_id")
  }

  val t10Oracle: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |                                    w -> length(w) > 0)) AS w
      |  FROM documents),
      |tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2),
      |dfreq AS (SELECT w, count(*) AS df
      |          FROM (SELECT DISTINCT doc_id, w FROM words) GROUP BY w),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (SELECT doc_id, w, tf * ln(n_docs / df) AS score
      |           FROM tf JOIN dfreq USING (w), n)
      |SELECT doc_id, w AS top_term, round(score, 6) AS tfidf FROM (
      |  SELECT doc_id, w, score, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, w ASC) AS rn FROM scored)
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- sequence packing

  /** Concatenate-and-chunk sequence packing per source: documents in
    * doc_id order are laid end-to-end and cut into 2048-token bins;
    * a doc's bin = floor(start_offset / 2048). Keyed running sum —
    * partition-parallel by source, never a global window. 2048 is a
    * power of two, so the double division is EXACT at bin boundaries
    * (engine-portable floor).
    */
  def t11SequencePack(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    docs(spark, dir)
      .select(col("source"), col("doc_id"),
        size(TextFns.words(col("text"))).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("n_tokens")) / lit(2048.0)).cast("long"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("source", "pack_id")
  }

  val t11Oracle: String =
    """WITH t AS (SELECT source, doc_id,
      |    len(list_filter(regexp_split_to_array(text, '\s+'), w -> length(w) > 0))
      |      AS n_tokens
      |  FROM documents),
      |c AS (SELECT source, doc_id, n_tokens,
      |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM t)
      |SELECT source,
      |  CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      |FROM c GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin

  // ------------------------------------------------- per-source quota

  /** Domain-quota capping (crawl-style): keep at most 20 docs per source
    * by doc_id order; report kept/total per source. Keyed rank window.
    */
  def d11SourceCap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    docs(spark, dir)
      .withColumn("rn", row_number().over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        count(when(col("rn") <= 20, 1)).as("n_kept"))
      .orderBy("source")
  }

  val d11Oracle: String =
    """SELECT source, count(*) AS n_total,
      |  count(CASE WHEN rn <= 20 THEN 1 END) AS n_kept
      |FROM (SELECT source, row_number() OVER (PARTITION BY source
      |        ORDER BY doc_id) AS rn FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------- document chunking

  /** Sliding-window token chunking (window 40, stride 20) — the canonical
    * LLM preprocessing step. Entirely row-local: chunk starts come from a
    * `sequence`, the chunk itself from `slice`, its identity from an md5
    * over the joined tokens; 1 doc row explodes to ceil(n/stride) chunk
    * rows with no shuffle.
    */
  def t13ChunkStats(spark: SparkSession, dir: String): DataFrame = {
    val win = 40
    val stride = 20
    val ws = TextFns.words(col("text"))
    val n = size(ws)
    val starts = sequence(lit(1), greatest(n - 1, lit(1)), lit(stride))
    docs(spark, dir)
      .select(col("doc_id"), ws.as("ws"), n.as("n"),
        posexplode(starts).as(Seq("chunk_idx", "s")))
      .select(col("doc_id"), col("chunk_idx"),
        size(slice(col("ws"), col("s"), lit(win))).as("chunk_tokens"),
        md5(concat_ws(" ", slice(col("ws"), col("s"), lit(win)))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  val t13Oracle: String =
    """WITH t AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), w -> length(w) > 0) AS ws
      |  FROM documents),
      |c AS (SELECT doc_id, ws,
      |    unnest(range(1, greatest(len(ws) - 1, 1) + 1, 20)) AS s,
      |    generate_subscripts(range(1, greatest(len(ws) - 1, 1) + 1, 20), 1) - 1
      |      AS chunk_idx
      |  FROM t)
      |SELECT doc_id, chunk_idx,
      |  len(ws[s:least(s + 39, len(ws))]) AS chunk_tokens,
      |  md5(array_to_string(ws[s:least(s + 39, len(ws))], ' ')) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ------------------------------------------- heavy hitters (UDAF sketch)

  /** Top-10 corpus words through the custom Space-Saving sketch Aggregator
    * ([[graft.functions.HeavyHitters]]) — the typed-UDAF surface. Capacity
    * 4096 ≫ the corpus vocabulary, so the sketch is provably exact here
    * and the DuckDB oracle checks it like any exact query; at open-corpus
    * scale the same code degrades gracefully to bounded-error counts with
    * only capacity-sized buffers crossing the shuffle.
    */
  def t12HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = docs(spark, dir)
      .select(explode(TextFns.words(col("text"))).as("w")).as[String]
    val sketch = words.select(
      new graft.functions.HeavyHitters(4096).toColumn) // Dataset[Seq[(w, cnt)]]
    sketch.toDF("sketch").select(explode(col("sketch")).as("e"))
      .select(col("e._1").as("w"), col("e._2").as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc).limit(10)
  }

  val t12Oracle: String =
    """SELECT w, cnt FROM (
      |  SELECT w, count(*) AS cnt,
      |    row_number() OVER (ORDER BY count(*) DESC, w ASC) AS rn
      |  FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |                                  w -> length(w) > 0)) AS w
      |        FROM documents)
      |  GROUP BY w)
      |WHERE rn <= 10""".stripMargin

  // ------------------------------------------------------- k-NN join

  /** Similarity-graph construction: each vector's top-3 cosine neighbors
    * within its IVF bucket — the bucketed k-NN JOIN (vs s01's single-query
    * lookup). The self-join is keyed by centroid_id, so work is
    * Σ bucket², never corpus²; ranking is a keyed window per vector.
    */
  def s06KnnJoin(spark: SparkSession, dir: String): DataFrame = {
    VectorFns.register(spark)
    val e = Lake.table(spark, dir, "embeddings")
      .select(col("vec_id"), VectorFns.toDoubleArray(col("embedding")).as("vec"))
    val centroids = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("vec").as("cvec"))
    // materialized: the bucket self-join reads the assignment on BOTH
    // sides — unmaterialized, the corpus scan + 8-cosine argmax projection
    // would re-evaluate once per side, every run
    val assigned = Similarity.ivfAssign(e, centroids).localCheckpoint()
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("cos").desc, col("b_id").asc)
    assigned.as("l").join(assigned.as("r"),
        col("l.centroid_id") === col("r.centroid_id") &&
        col("l.vec_id") =!= col("r.vec_id"))
      .select(col("l.vec_id").as("a_id"), col("r.vec_id").as("b_id"),
        VectorFns.cosine(col("l.vec"), col("r.vec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("a_id"), col("rank"), col("b_id"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("a_id", "rank")
  }

  val s06Oracle: String =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
       |assign AS (SELECT vec_id, v, centroid_id FROM (
       |  SELECT e.vec_id, e.v, c.centroid_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.centroid_id) AS rn
       |  FROM e CROSS JOIN cent c) WHERE rn = 1)
       |SELECT a_id, rank, b_id, cosine FROM (
       |  SELECT l.vec_id AS a_id, r.vec_id AS b_id,
       |    round(${cosSql("l.v", "r.v")}, 6) AS cosine,
       |    row_number() OVER (PARTITION BY l.vec_id
       |      ORDER BY ${cosSql("l.v", "r.v")} DESC, r.vec_id ASC) AS rank
       |  FROM assign l JOIN assign r
       |    ON l.centroid_id = r.centroid_id AND l.vec_id <> r.vec_id)
       |WHERE rank <= 3 ORDER BY a_id, rank""".stripMargin

  // ---------------------------------------------------- dedup filtering

  /** APPLY the exact dedup: keep one doc per content hash (min doc_id
    * survivor), report per-language before/after counts — the filter step
    * that turns d01's duplicate census into the deduplicated corpus.
    * One keyed window, no join back.
    */
  def d12DedupFilter(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
      .orderBy(col("doc_id").asc)
    docs(spark, dir)
      .withColumn("rn", row_number().over(w))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_before"),
        count(when(col("rn") === 1, 1)).as("n_after"))
      .orderBy("lang")
  }

  val d12Oracle: String =
    """SELECT lang, count(*) AS n_before,
      |  count(CASE WHEN rn = 1 THEN 1 END) AS n_after
      |FROM (SELECT lang, row_number() OVER (PARTITION BY md5(text)
      |        ORDER BY doc_id ASC) AS rn FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("d09_dedup_clusters", d09DedupClusters _, Some(d09Oracle)),
    ("d10_stratified_sample", d10StratifiedSample _, Some(d10Oracle)),
    ("t07_repetition", t07Repetition _, Some(t07Oracle)),
    ("t09_vocab_topk", t09VocabTopK _, Some(t09Oracle)),
    ("s04_quantize", s04Quantize _, Some(s04Oracle)),
    ("s05_centroid_classify", s05CentroidClassify _, Some(s05Oracle)),
    ("st05_trending", st05Trending _, Some(st05Oracle)),
    ("st06_interval_join", st06IntervalJoin _, Some(st06Oracle)),
    ("t10_tfidf", t10TfIdf _, Some(t10Oracle)),
    ("t11_sequence_pack", t11SequencePack _, Some(t11Oracle)),
    ("d11_source_cap", d11SourceCap _, Some(d11Oracle)),
    ("s06_knn_join", s06KnnJoin _, Some(s06Oracle)),
    ("d12_dedup_filter", d12DedupFilter _, Some(d12Oracle)),
    ("t12_heavy_hitters", t12HeavyHitters _, Some(t12Oracle)),
    ("t13_chunk_stats", t13ChunkStats _, Some(t13Oracle)))
}
