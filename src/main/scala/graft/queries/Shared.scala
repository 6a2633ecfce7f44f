package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Lake
import graft.functions.VectorFns

/** Fixture/oracle helpers shared by the DataQueries* files — ONE
  * definition each. The cosine-accumulation SQL in particular is the
  * parity contract for every ANN/near-dup oracle (it must mirror
  * CosineSimilarity's accumulation exactly); per-file copies had to be
  * edited in lockstep, and a drifting copy would silently fork half the
  * gates.
  */
private[queries] object Shared {

  /** The documents corpus, spread across the machine when the scan is a
    * degenerate single partition (Lake.spread) — every consumer runs
    * per-row text work (shingles, hashes, token stats) above this scan.
    */
  def docs(spark: SparkSession, dir: String): DataFrame =
    Lake.spread(Lake.table(spark, dir, "documents"), col("doc_id"))

  def emb(spark: SparkSession, dir: String): DataFrame = {
    VectorFns.register(spark)
    Lake.spread(Lake.table(spark, dir, "embeddings"), col("vec_id"))
      .select(col("vec_id"), VectorFns.toDoubleArray(col("embedding")).as("vec"))
  }

  /** DuckDB cosine between two `array<double>` expressions, mirroring
    * CosineSimilarity's accumulation exactly.
    */
  def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** The embeddings CTE every vector oracle opens with. */
  val embCte: String =
    "e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)"

  /** Render a Scala string list as a DuckDB list literal. */
  def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")
}
