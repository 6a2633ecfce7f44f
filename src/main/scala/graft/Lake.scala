package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the local test lake (TESTDATA.md): one parquet file per table.
  *
  * At 100 TB scale each table would be a partitioned/bucketed directory tree
  * (or a Delta/Iceberg table) instead of a single file; all operators below
  * only touch tables through these readers, so swapping the storage layer is
  * a one-file change. Reads are plain `spark.read.parquet`, so Catalyst
  * pushes filters and prunes columns into the scan.
  */
object Lake {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's vectorized
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]); read the raw int64
    * nanos and truncate to micros with exact integer division (`div`, not
    * `/` — ~1.7e18 ns overflows double precision). DuckDB truncates ns→µs
    * the same way, so oracle parity holds.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every lake table as a temp view so `spark.sql` config
    * expressions (ConfigEval) can reference them by bare name — the local
    * equivalent of the reference's fully-qualified
    * `project.dataset.table` names (DataCatalogController.py:1722–1728).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
