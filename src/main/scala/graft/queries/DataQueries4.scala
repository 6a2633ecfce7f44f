package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Pii
import graft.operators.KMeans
import graft.queries.CoreQueries.Q

/** Round-6 training-data pipeline operators: regex-rule PII inspection
  * and redaction (the reference's DLP-inspection theme as a narrow Spark
  * projection), token-budget mixture construction (select documents per
  * source until a weighted character budget is filled), and K-Means
  * centroid training (the model-build loop behind the IVF index family).
  * Parity discipline as elsewhere: shared Java∩RE2 regex subset,
  * decimal-summed means, deterministic ORDER BY everywhere.
  */
object DataQueries4 {

  import Shared.{docs, emb, cosSql}

  // ------------------------------------------ PII inspect + redact (t15)

  /** PII inspection/redaction over the documents table. The synthetic
    * corpus carries no organic PII, so the query plants a deterministic
    * contact line on a doc_id-keyed subset (emails on ≡0 mod 3, phones on
    * ≡0 mod 5, SSNs on ≡0 mod 7 — both engines derive the identical
    * string) and then runs the REAL operator: [[Pii.findingCounts]] +
    * [[Pii.redact]], one codegen'd row-local pass, zero shuffle at any
    * corpus size — the m01 stub-kernel discipline applied to DLP rules.
    */
  def t15PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val email = when(id % 3 === 0,
      concat(lit(" contact user"), id.cast("string"), lit("@example.com")))
      .otherwise(lit(""))
    val phone = when(id % 5 === 0,
      concat(lit(" call 415-555-"),
        lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit(""))
    val ssn = when(id % 7 === 0,
      concat(lit(" ssn "), lpad((id % 1000).cast("string"), 3, "0"),
        lit("-"), lpad((id % 100).cast("string"), 2, "0"),
        lit("-"), lpad((id % 10000).cast("string"), 4, "0")))
      .otherwise(lit(""))
    // Locale.ROOT: under a Turkish default locale "EMAIL_ADDRESS" would
    // lowercase its I to dotless ı, so the n_emaıl_address column never
    // matches the col("n_email_address") reference below (the
    // ConfigDispatch locale trap, r13)
    val counts = Pii.findingCounts(col("raw"))
      .map { case (name, c) =>
        c.as("n_" + name.toLowerCase(java.util.Locale.ROOT)) }
    docs(spark, dir)
      .select(id, concat(col("text"), email, phone, ssn).as("raw"))
      .select(Seq(col("doc_id")) ++ counts :+
        Pii.redact(col("raw")).as("redacted"): _*)
      .withColumn("has_pii",
        col("n_email_address") + col("n_phone_number") + col("n_us_ssn") > 0)
      .orderBy("doc_id")
  }

  val t15Oracle: String = {
    // Rules hold the runtime regex (single backslashes) — exactly what
    // DuckDB wants inside a single-quoted literal
    val Seq(emailRe, phoneRe, ssnRe) = Pii.Rules.map(_._2)
    val redacted = Pii.Rules.foldLeft("raw") { case (acc, (n, re)) =>
      s"regexp_replace($acc, '$re', '[$n]', 'g')"
    }
    s"""WITH r AS (SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||
       |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' call 415-555-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' ssn ' ||
       |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
       |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS raw
       |  FROM documents),
       |f AS (SELECT doc_id,
       |    len(regexp_extract_all(raw, '$emailRe')) AS n_email_address,
       |    len(regexp_extract_all(raw, '$phoneRe')) AS n_phone_number,
       |    len(regexp_extract_all(raw, '$ssnRe')) AS n_us_ssn,
       |    $redacted AS redacted
       |  FROM r)
       |SELECT doc_id, n_email_address, n_phone_number, n_us_ssn, redacted,
       |  n_email_address + n_phone_number + n_us_ssn > 0 AS has_pii
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------- token-budget mixture (d17)

  /** Mixture construction to a per-source character budget: upweighted
    * sources (src0–src4, weight 2) get a 6000-char budget, the rest 3000;
    * documents are taken in deterministic md5 order until the budget is
    * filled (greedy prefix — the first doc crossing the line is kept, so
    * every non-empty source contributes). This is the token-budget
    * counterpart of d10 (rate sampling) / d11 (row caps): mixtures for
    * training runs are specified in tokens, not rows. One per-source
    * window cumsum — partition-parallel across sources; a pathologically
    * hot source would shard into hash sub-buckets with per-bucket budgets
    * (the d07 content-hash trick) rather than sort one giant partition.
    */
  def d17MixtureBudget(spark: SparkSession, dir: String): DataFrame = {
    val budget = when(
      col("source").isin("src0", "src1", "src2", "src3", "src4"), 6000L)
      .otherwise(3000L)
    val w = Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .withColumn("budget", budget)
      .withColumn("cum_chars", sum(col("n_chars")).over(w))
      .filter(col("cum_chars") - col("n_chars") < col("budget"))
      .select("doc_id", "source", "n_chars", "cum_chars", "budget")
      .orderBy("doc_id")
  }

  val d17Oracle: String =
    """WITH b AS (SELECT doc_id, source, n_chars,
      |    CASE WHEN source IN ('src0','src1','src2','src3','src4')
      |         THEN 6000 ELSE 3000 END AS budget,
      |    CAST(sum(n_chars) OVER (PARTITION BY source
      |      ORDER BY md5(text), doc_id ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cum_chars
      |  FROM documents)
      |SELECT doc_id, source, n_chars, cum_chars,
      |  CAST(budget AS BIGINT) AS budget
      |FROM b WHERE cum_chars - n_chars < budget
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- K-Means training (s09)


  /** Two Lloyd iterations from the same 8 seed vectors the IVF queries
    * use as their fixed "model" — the training loop that would produce
    * those centroids for real. Output is the final centroid table in
    * exploded (cluster_id, dim, value) form plus member counts.
    */
  def s09KmeansTrain(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val init = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("vec").as("cvec"))
    KMeans.train(e, init, iters = 2)
      .select(col("centroid_id").as("cluster_id"), col("n_members"),
        posexplode(col("cvec")).as(Seq("dim", "value")))
      .orderBy("cluster_id", "dim")
  }

  val s09Oracle: String = {
    def assign(cents: String): String =
      s"""SELECT vec_id, centroid_id FROM (
         |  SELECT e.vec_id, c.centroid_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.centroid_id) AS rn
         |  FROM e CROSS JOIN $cents c) WHERE rn = 1""".stripMargin
    def means(a: String): String =
      s"""SELECT centroid_id, dim, count(*) AS n,
         |  round(CAST(sum(CAST(val AS DECIMAL(18,12))) AS DOUBLE)
         |    / count(*), 9) AS m
         |FROM (SELECT a.centroid_id, t.i - 1 AS dim, e.v[t.i] AS val
         |      FROM $a a JOIN e ON a.vec_id = e.vec_id,
         |        unnest(generate_series(1, len(e.v))) AS t(i))
         |GROUP BY centroid_id, dim""".stripMargin
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
       |a1 AS (${assign("c0")}),
       |m1 AS (${means("a1")}),
       |c1 AS (SELECT centroid_id, list(m ORDER BY dim) AS cv
       |       FROM m1 GROUP BY centroid_id),
       |a2 AS (${assign("c1")}),
       |m2 AS (${means("a2")})
       |SELECT centroid_id AS cluster_id, n AS n_members, dim, m AS value
       |FROM m2 ORDER BY cluster_id, dim""".stripMargin
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("t15_pii_redact", t15PiiRedact _, Some(t15Oracle)),
    ("d17_mixture_budget", d17MixtureBudget _, Some(d17Oracle)),
    ("s09_kmeans_train", s09KmeansTrain _, Some(s09Oracle)))
}
