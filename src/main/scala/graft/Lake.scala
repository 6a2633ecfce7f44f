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
    // memoized per (session, dir, table): the frame is an immutable plan,
    // and rebuilding it pays a parquet footer schema inference per call —
    // protocol queries re-read lake tables dozens of times per run.
    // STATIC-LAKE INVARIANT (round-20 advice): the memo pins the file
    // listing and inferred schema at first access for the session's
    // lifetime. That is the lake's contract — the test lake is generated
    // once and never rewritten mid-session (TESTDATA.md), and a real
    // deployment swaps storage through a table format whose snapshots
    // re-resolve per read. Regenerating a lake dir under a live session
    // is out of contract; tests that need it use a fresh dir.
    tableCache.get(spark, s"$dir/$name") {
      if (name == "events") events(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    }

  // weak-ref single-session memoizer — see SessionCache for the discipline
  private val tableCache = new graft.queries.SessionCache[DataFrame]

  /** The lake's `events.ts` physical type has varied across driver data
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
    * with [PARQUET_TYPE_ILLEGAL] unless read as raw int64 nanos) and plain
    * TIMESTAMP(MICROS) stored NTZ. Normalize both to session-zone
    * TimestampType so every consumer sees one shape:
    *  - int64 nanos → exact integer division to micros (`div`, not `/` —
    *    ~1.7e18 ns overflows double precision), matching DuckDB's ns→µs
    *    truncation for oracle parity;
    *  - TIMESTAMP_NTZ → cast to TIMESTAMP (session TZ is pinned to UTC in
    *    every entrypoint, so the wall-clock value is unchanged and DuckDB's
    *    naive timestamps compare equal).
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => raw // already the normalized shape
      case other => throw new IllegalStateException(
        s"events.ts has unhandled physical type $other — a new driver data " +
          "generation drifted; add its normalization here so consumers " +
          "never see an unnormalized column")
    }
  }

  /** Scale-adaptive scan spread (optimization guide §2.5 "input skew":
    * one unsplittable input → repartition immediately after the read).
    * The bench lake stores each table as a SINGLE-row-group parquet file,
    * so its scan plans as ONE partition and every row-local projection
    * above it (shingling, minhash, langid, vector math) runs on one core
    * of the machine. When the scan yields fewer partitions than the
    * session's parallelism, hash-repartition by the row key so per-row
    * work uses every core. At lake scale a table scan already carries
    * ≥ cores splits and this inserts NO exchange — the branch never
    * shuffles production payloads; it only widens degenerate tiny scans.
    * Keyed repartition (not round-robin): deterministic under task retry
    * (guide §2.5 / SPARK-38388) and skips the sort-before-repartition
    * pass a keyless repartition pays.
    */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // structural probe, not df.rdd.getNumPartitions: safe here either way
    // (spread inputs are exchange-free scans, so forcing the adaptive
    // plan executes nothing), but the probe skips building the query RDD
    // per call and cannot silently start executing if a consumer ever
    // hands spread a shuffle-bearing frame (PlanProbe's contract)
    graft.sources.PlanProbe.scanPartitions(df) match {
      case Some(n) if n < target => df.repartition(target, key)
      case _ => df
    }
  }

  /** Register every lake table as a temp view so `spark.sql` config
    * expressions (ConfigEval) can reference them by bare name — the local
    * equivalent of the reference's fully-qualified
    * `project.dataset.table` names (DataCatalogController.py:1722–1728).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    // ALWAYS re-register: a caller may legitimately shadow a lake name
    // with its own temp view (SchedulerSpec does), and registerAll's
    // contract is "these names point at the lake again". The expensive
    // half (footer schema inference) is memoized in [[table]]; the view
    // put itself is a driver-side catalog insert.
    tableNames.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
