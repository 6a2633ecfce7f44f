package graft.tools

import org.apache.hadoop.fs.{FSDataInputStream, FileStatus, LocalFileSystem, LocatedFileStatus, Path, RemoteIterator}

/** A LocalFileSystem with a configurable per-metadata-op latency —
  * the object-store cost model the scale probes need: on S3/GCS every
  * LIST / HEAD / GET-open is a ~10–100 ms round trip, while the local
  * fs answers from the dentry cache in microseconds, so a threshold
  * tuned on local listing costs (DocIndexStore's `compactAboveDirs`)
  * is untested against the costs it actually exists to bound.
  *
  * Registered by REPLACING the `file` scheme implementation
  * (`spark.hadoop.fs.file.impl`, the Spark DebugFilesystem pattern) so
  * every Hadoop-FS code path — manifest listing, footer opens, commit
  * renames' existence probes — pays [[SlowFs.opLatencyMs]] per
  * metadata op with zero changes to operator code, and `LocalFileSystem`
  * subtype checks (AtomicStore's hard-link publish branch) still hold.
  * Latency is a volatile the measuring tool flips on AFTER fixture
  * prep, so corpus loading doesn't contaminate the measurement.
  * Tools-only: never registered outside the scale probes.
  */
class SlowFs extends LocalFileSystem {
  private def nap(): Unit = {
    val ms = SlowFs.opLatencyMs
    if (ms > 0) Thread.sleep(ms)
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    nap(); super.listStatus(f)
  }
  override def listLocatedStatus(f: Path): RemoteIterator[LocatedFileStatus] = {
    nap(); super.listLocatedStatus(f)
  }
  override def getFileStatus(f: Path): FileStatus = {
    nap(); super.getFileStatus(f)
  }
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    nap(); super.open(f, bufferSize)
  }
}

object SlowFs {
  /** Synthetic per-metadata-op latency; 0 = passthrough. */
  @volatile var opLatencyMs: Long = 0L
}
