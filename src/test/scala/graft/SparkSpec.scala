package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one per suite (lazy), UTC, local shuffle sizing. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // per-process fixed path: stable across suites in one JVM (getOrCreate
    // reuses the session, so no per-suite dir litter) but keyed by pid so
    // two concurrent test JVMs never share managed-table locations —
    // BucketingSpec's pre-test recursive deletes would otherwise destroy
    // the other run's in-flight tables
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft_wh_test_${ProcessHandle.current().pid()}")).toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  def sf: String = "/root/testdata/sf0.001"
}
