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
    * markers and anything still under a `_temporary/` staging dir. */
  def hasData(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) false
    else {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        found = f.isFile && n.endsWith(".parquet") &&
          !n.startsWith("_") && !n.startsWith(".") &&
          !f.getPath.toString.contains("/_temporary/")
      }
      found
    }
  }
}
