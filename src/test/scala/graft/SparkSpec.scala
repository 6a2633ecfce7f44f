package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one per suite (lazy), UTC, local shuffle sizing. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // fixed path, not createTempDirectory: the builder runs once per
    // suite even when getOrCreate reuses the session, and a fresh dir
    // per suite accumulates hundreds of empty /tmp entries across runs
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_wh_test")).toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  def sf: String = "/root/testdata/sf0.001"
}
