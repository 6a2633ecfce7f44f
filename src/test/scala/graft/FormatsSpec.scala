package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink format breadth beyond the parquet lake: ORC (built into
  * spark-sql) and CSV round-trips, with partition pruning asserted on the
  * partitioned ORC read.
  */
class FormatsSpec extends SparkSpec {

  test("ORC sink/source round-trip with partition pruning") {
    val docs = Lake.table(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft_orc").toString
    docs.withColumn("part", col("doc_id") % 4)
      .write.mode("overwrite").partitionBy("part").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === docs.count())
    val pruned = back.filter(col("part") === 1)
    assert(pruned.count() === docs.filter(col("doc_id") % 4 === 1).count())
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("CSV sink/source round-trip preserves the import-shaped rows") {
    val docs = Lake.table(spark, sf, "documents")
      .select("doc_id", "lang", "source", "n_chars") // no free text in CSV
    val dir = Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", true).csv(dir)
    val back = spark.read.option("header", true)
      .schema(docs.schema).csv(dir)
    assert(back.count() === docs.count())
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
  }
}
