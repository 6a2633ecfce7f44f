package graft

import graft.sources.FileScan

/** File-system asset scan semantics (Resources.py:271–336): wildcard
  * globs match files, and a plain FOLDER URI prefix-lists every file
  * under it — the reference accepts both shapes, so a directory match
  * must expand, not silently vanish from the work set.
  */
class FileScanSpec extends SparkSpec {

  test("a wildcard-free directory URI lists the files under it (recursively)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_filescan")
    java.nio.file.Files.writeString(dir.resolve("a.csv"), "x,y\n1,2\n")
    java.nio.file.Files.createDirectory(dir.resolve("sub"))
    java.nio.file.Files.writeString(dir.resolve("sub").resolve("b.csv"),
      "x\n3\n")
    // plain folder URI — the reference's gs://bucket/folder shape: every
    // blob under the prefix, never an empty no-op
    val all = FileScan.listFiles(spark, dir.toString)
      .select("name").collect().map(_.getString(0)).toSet
    assert(all === Set("a.csv", "b.csv"))
    // wildcard still matches files only at its own level
    val glob = FileScan.listFiles(spark, s"$dir/*.csv")
      .select("name").collect().map(_.getString(0)).toSet
    assert(glob === Set("a.csv"))
    // a wildcard that matches the SUBDIRECTORY expands it too
    val starAll = FileScan.listFiles(spark, s"$dir/*")
      .select("name").collect().map(_.getString(0)).toSet
    assert(starAll === Set("a.csv", "b.csv"))
  }
}
