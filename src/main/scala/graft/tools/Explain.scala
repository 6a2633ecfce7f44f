package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"===== $name")
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      println(plan.take(6000))
      println("shingle_minhash count: " +
        "shingle_minhash".r.findAllIn(plan).length)
    }
    spark.stop()
  }
}
