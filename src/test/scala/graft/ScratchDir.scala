package graft

/** One per-invocation scratch-dir helper for specs (pid + UUID so
  * parallel suites and parallel JVMs never collide; deleted when the
  * body returns) — the test-side twin of the catalog entries'
  * `withScratch`, extracted because each new spec was hand-rolling the
  * same four lines. */
object ScratchDir {
  def withDir[T](slug: String)(body: String => T): T = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-$slug-" +
      ProcessHandle.current().pid() + "-" +
      java.util.UUID.randomUUID().toString.take(8)
    try body(base)
    finally graft.util.LocalFs.deleteRecursively(base)
  }
}
