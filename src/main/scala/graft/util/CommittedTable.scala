package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** "Does this table structurally hold committed parquet data?" — decided
  * from the filesystem, never by swallowing a read failure (the
  * [[graft.streaming.WatchlistMonitor]] sweep's discipline, extracted in
  * r14 because [[graft.streaming.CorpusIngest.compactGraduated]] had
  * re-grown the Try-as-removed shape): a `scala.util.Try` around
  * `spark.read` folds a transient IO error into "table gone", and for
  * callers whose gone-branch is destructive (wipe the graduated markers,
  * re-sweep the whole watched set) that misread silently redoes — or
  * undoes — corpus-scale work. Structurally: a dir that is missing, or
  * holds no committed data file (a crash mid-first-write leaves only
  * `_temporary/`; an all-rejected stream leaves only `_SUCCESS`), has
  * never durably held rows, while a genuine read failure on a healthy
  * table PROPAGATES from the actual read that follows. NOT defended:
  * a concurrent `mode("overwrite")` of the same table — its
  * delete→write window is structurally identical to "removed", so
  * callers owe their gone-branch a single-writer contract (every
  * maintenance path here runs in one exclusive window).
  */
object CommittedTable {

  /** True iff `path` exists and holds at least one committed parquet
    * data file — recursive (partitioned layouts), skipping `_`/`.`
    * markers and anything under a HIDDEN (`_`/`.`-prefixed) ancestor
    * dir below the queried root: `_temporary/` committer staging and a
    * crash-orphaned `.compact_staging_*` dir alike (r14 ADVICE — this
    * is the same ancestor rule as
    * [[graft.operators.TableCompaction]]'s committed-file predicate, so
    * the two emptiness views cannot diverge inside a compaction crash
    * window; plain Spark readers also skip both shapes). */
  def hasData(spark: SparkSession, path: String): Boolean = {
    val p0 = new Path(path)
    val fs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = fs.makeQualified(p0)
    if (!fs.exists(p)) false
    else {
      val rootPath = p.toUri.getPath
      def hiddenAncestor(f: Path): Boolean = {
        var cur = f.getParent
        while (cur != null && cur.toUri.getPath != rootPath) {
          val n = cur.getName
          if (n.startsWith(".") || n.startsWith("_")) return true
          cur = cur.getParent
        }
        false
      }
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        found = f.isFile && n.endsWith(".parquet") &&
          !n.startsWith("_") && !n.startsWith(".") &&
          !hiddenAncestor(f.getPath)
      }
      found
    }
  }
}
