package graft

/** Scratch-dir helper for write-path queries and profiling harnesses: one
 * fixed path per tag under the system tmpdir, wiped on entry so repeated
 * Verify/Bench/Explain invocations never accumulate temp parquet dirs. */
object Scratch {

  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rm)
    f.delete(): Unit
  }

  /** Recursive delete by path — the ONE copy of the walker (the
   * rehearsal harnesses were growing private clones). */
  def rm(path: String): Unit = rm(new java.io.File(path))

  /** Wipe and recreate the tag's scratch dir; returns its path. */
  def freshDir(tag: String): String = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft-$tag")
    rm(dir); dir.mkdirs()
    dir.toString
  }

  /** Fixture-dir-scoped fresh scratch dir: two harness runs over
   * DIFFERENT fixture dirs (e.g. concurrent sf0.001/sf0.01 Verifies)
   * must not share a write-path topic dir — an interleaved wipe/append
   * from the other run corrupts the slower run's read-back counts. */
  def freshDirFor(tag: String, sfDir: String): String =
    freshDir(tag + "-" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))

  /** Fixture-dir-scoped [[clearDir]] — same concurrency rationale as
   * [[freshDirFor]]. */
  def clearDirFor(tag: String, sfDir: String): String =
    clearDir(tag + "-" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))

  /** Wipe the tag's scratch dir WITHOUT recreating it (for callers whose
   * writers create the directory themselves, e.g. saveAsTable). */
  def clearDir(tag: String): String = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft-$tag")
    rm(dir)
    dir.toString
  }
}
