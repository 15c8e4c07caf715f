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

  /** The no-lambda variant for specs whose helper structure makes
    * [[withDir]]'s scoping brace awkward (per-test `tmp(tag)` helpers,
    * multi-dir fixtures): every dir lives under ONE pid+UUID root that a
    * JVM shutdown hook deletes, so suite runs stop accumulating litter
    * under tmpdir (the bare `Files.createTempDirectory` call sites this
    * replaced never cleaned up at all — r15 verdict #5's sweep). The
    * counter suffix keeps same-slug calls within one JVM distinct. */
  private lazy val root: String = {
    val r = s"${System.getProperty("java.io.tmpdir")}/graft-scratch-" +
      ProcessHandle.current().pid() + "-" +
      java.util.UUID.randomUUID().toString.take(8)
    new java.io.File(r).mkdirs(): Unit
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.util.LocalFs.deleteRecursively(r)))
    r
  }
  private val seq = new java.util.concurrent.atomic.AtomicLong

  def dir(slug: String): String = {
    val d = s"$root/$slug-${seq.incrementAndGet()}"
    new java.io.File(d).mkdirs(): Unit
    d
  }
}
