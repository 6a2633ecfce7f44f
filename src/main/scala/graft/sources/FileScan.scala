package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-system asset scan (SURVEY.md §2 A2: `find_gcs_resources`,
  * Resources.py:271–336).
  *
  * The reference lists GCS blobs under a `gs://bucket/folder` glob and emits
  * (bucket, blob) work items, skipping directories. The Spark-native form
  * is a Hadoop FS glob — the same code path works for gs:// via the GCS
  * Hadoop connector on a real cluster, and for file:// locally. Listing
  * happens on the driver (it is metadata, not data); the resulting manifest
  * DataFrame is the work set that fans out.
  */
object FileScan {

  final case class FileAsset(path: String, name: String, size: Long,
                             modification_time: Long)

  /** Expand a glob to non-directory files as a DataFrame. A matched
    * DIRECTORY expands to the files under it (recursively) — the
    * reference's prefix-list semantics: a config naming a plain folder
    * URI (`gs://bucket/folder`, no wildcard) lists every blob under the
    * prefix (Resources.py:271–336). Previously a directory match was
    * simply dropped, so such configs silently produced an EMPTY work set
    * — valid in the reference, a no-op here, with no error anywhere.
    */
  def listFiles(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val p = new Path(glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val files = statuses.iterator.flatMap { s =>
      if (!s.isDirectory) Iterator.single(s)
      else {
        val it = fs.listFiles(s.getPath, true)
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
      }
    }
    files
      .map(s => FileAsset(s.getPath.toString, s.getPath.getName,
        s.getLen, s.getModificationTime))
      .toSeq.toDF()
  }
}
