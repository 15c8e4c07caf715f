package graft.util

/** Local-filesystem scratch helpers. [[AtomicPublish]] is the Hadoop-FS
  * publish protocol; this is the `java.io.File` side — currently just the
  * recursive delete every scratch-dir user (bench staging, the stateful
  * lifecycle catalog entries, specs) had hand-copied.
  */
object LocalFs {

  /** Delete `f` and everything under it; silent no-op on a missing path. */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def deleteRecursively(path: String): Unit =
    deleteRecursively(new java.io.File(path))
}
