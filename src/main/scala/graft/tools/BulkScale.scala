package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.{FieldSpec, TagConfig}
import graft.operators.{ConfigDispatch, EngineInputs}

/** Measures the set-based dynamic-config path at the reference's load-test
  * asset counts (examples/load/configs/static_asset_1m.json scales to 10⁶
  * assets/config): q30's 7-field config over the sf0.1 events family at
  * 1k / 10k / 100k / 1M expanded assets. Reports wall time and the SQL
  * execution count — the invariant that makes the path survive the load
  * point is a CONSTANT execution count regardless of asset cardinality
  * (plan size is O(#fields); the asset dimension lives in DATA, not in
  * the plan). Since round 9 the measurement goes through
  * [[ConfigDispatch.applyConfig]]'s automatic shard-threshold routing —
  * the production entry point — so the number includes the routing's own
  * metadata-sized expansion count (+1 execution over the bare
  * GroupedEval call).
  */
object BulkScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            counter.incrementAndGet()
          case _ => ()
        }
    })
    val fields = Seq(
      FieldSpec("n_rows", "double", Some("select count(*) from $table")),
      FieldSpec("n_users", "double",
        Some("select count(distinct user_id) from $table")),
      FieldSpec("total_value", "string",
        Some("select cast(sum(cast(value as decimal(18,2))) as string) from $table")),
      FieldSpec("clicks", "double",
        Some("select count(*) from $table where event_type = 'click'")),
      FieldSpec("asset_label", "string",
        Some("select concat('$dataset', '.', '$table')")),
      FieldSpec("env", "enum", None, Some("PROD")))
    val events = graft.Lake.table(spark, sfDir, "events")
    Seq(1000, 10000, 100000, 1000000).foreach { n =>
      val pad = math.max(4, n.toString.length)
      val catalog = spark.range(0, n)
        .select(lit("p").as("project"), lit("lake").as("dataset"),
          concat(lit("events_"), lpad(col("id").cast("string"), pad, "0"))
            .as("table"))
      val config = TagConfig(configType = "DYNAMIC_TAG_TABLE",
        templateId = "gov", fields = fields,
        includedUris = Seq("bigquery/project/p/dataset/lake/events_*"))
      val shard = concat(lit("events_"),
        lpad((col("event_id") % n).cast("string"), pad, "0"))
      counter.set(0)
      val t0 = System.nanoTime()
      // the production entry point: dispatch expands, counts, and routes
      // set-based past the threshold (499 here so every point takes the
      // sharded path and the series stays comparable)
      val noTags = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq()))
      val out = ConfigDispatch.applyConfig(spark, config,
        EngineInputs(catalog, noTags,
          shardedSource = Some((events, shard)),
          shardRouteThreshold = 499L))
      out.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener events are async
      println(f"BULKSCALE assets=$n%7d rows=${n * fields.length}%8d " +
        f"wall=$dt%6.1fs sql_executions=${counter.get()}")

      // END-TO-END: the same tag rows through the ACID write path the
      // engine actually persists with — compute + applyWithDeletes MERGE
      // + CAS commit + manifest publish (the reference's load test
      // verifies WRITTEN tags, examples/load/check_tags.py:11–48; a noop
      // sink leaves the commit leg unmeasured). Wall includes recomputing
      // the aggregation (this is the whole job, not just the sink).
      val store = java.nio.file.Files
        .createTempDirectory(s"graft_bulk_store_$n").toString
      val t1 = System.nanoTime()
      val v0 = graft.operators.TagStore.mergeCommit(spark, store, out)
      val dtCommit = (System.nanoTime() - t1) / 1e9
      println(f"BULKSCALE_COMMIT assets=$n%7d first_merge wall=$dtCommit%6.1fs " +
        f"version=$v0 store_bytes=${Fs.dirBytes(store)}")
      if (n == 1000000) {
        // steady state at the 1M envelope: a SECOND full merge pays the
        // read-existing + MERGE + snapshot rewrite (the write-amplified
        // form)...
        val t2 = System.nanoTime()
        val v1 = graft.operators.TagStore.mergeCommit(spark, store, out)
        val dtRe = (System.nanoTime() - t2) / 1e9
        println(f"BULKSCALE_COMMIT assets=$n%7d re_merge    wall=$dtRe%6.1fs " +
          f"version=$v1 store_bytes=${Fs.dirBytes(store)}")
        // ...while the delta-log path appends only the batch: seed the
        // log with the full 1M-asset state, then land a 1k-asset
        // incremental batch — committed bytes must scale with the BATCH,
        // not the table (the 100 TB write-path contract).
        val logStore = java.nio.file.Files
          .createTempDirectory("graft_bulk_log").toString
        graft.operators.TagStore.appendMergeCommit(spark, logStore, out)
        val seeded = Fs.dirBytes(logStore)
        val inc = out.filter(col("asset_uri") <
          "bigquery/project/p/dataset/lake/events_0000999")
        val t3 = System.nanoTime()
        graft.operators.TagStore.appendMergeCommit(spark, logStore, inc)
        val dtApp = (System.nanoTime() - t3) / 1e9
        println(f"BULKSCALE_COMMIT assets=$n%7d append_1k   wall=$dtApp%6.1fs " +
          f"batch_bytes=${Fs.dirBytes(logStore) - seeded} log_bytes=${Fs.dirBytes(logStore)}")
        Fs.deleteRec(logStore)
      }
      Fs.deleteRec(store)
    }
    spark.stop()
  }

}
