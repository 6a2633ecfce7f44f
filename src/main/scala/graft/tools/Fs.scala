package graft.tools

/** Local-filesystem helpers shared by the scale probes (BulkScale,
  * SigStoreScale): byte-size a directory tree and remove it. Tools-only —
  * operator code goes through the Hadoop FileSystem API instead.
  */
private[tools] object Fs {

  def dirBytes(p: String): Long = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  def deleteRec(p: String): Unit = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    finally s.close()
  }
}
