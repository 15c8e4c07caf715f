package graft.util

import org.apache.spark.sql.DataFrame

/** The AUX-TABLE seam that graduates engine-side-by-construction entries
  * to the full rows+schema+hash oracle gate (r15 verdict #2): the
  * multimodal families decode media the SQL oracle cannot (no image /
  * audio / video stack in DuckDB), but everything DOWNSTREAM of the
  * fingerprint — the banded candidate join, the transitive clusters, the
  * retention arithmetic, the band-health histogram — is exact integer /
  * decimal math that can silently rot behind a rows-only check. So the
  * catalog entry exports its deterministic intermediate (the (id, 64-bit
  * hash) fingerprint frame) to a scratch parquet during the Verify run,
  * and the entry's oracle SQL reads that parquet back via
  * `read_parquet(...)` and recomputes the downstream math BRUTE-FORCE in
  * DuckDB — the decode stays engine-side, the join/cluster/rollup math
  * gets a hash gate, and because the oracle is brute-force (all-pairs
  * Hamming, recursive-CTE closure) while the engine is banded/pointer-
  * jumped, a hash match also re-proves the banding's lossless-recall
  * guarantee on every Verify run.
  *
  * DISABLED outside Verify ([[enabled]] reads the system property
  * [[graft.Verify]] sets): bench and spec invocations of the same
  * entries pay zero extra work, so headline timings are untouched. The
  * export path is deterministic per (aux name) under the JVM's tmpdir —
  * the same JVM builds the oracle SQL strings, so the literal the DuckDB
  * side reads is exactly the path the export wrote. One export per
  * (name, sfDir) per JVM: several entries share one fingerprint aux
  * (ext101/ext105/ext120 all read the image hashes), and Verify runs the
  * catalog 4 queries at a time, so the once-guard also serializes racing
  * first-writers.
  */
object OracleAux {

  /** Set by [[graft.Verify]] before running the catalog. */
  val EnableProp = "graft.oracle.aux"

  private def enabled: Boolean = sys.props.get(EnableProp).contains("1")

  private val exported =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The aux table's directory for `name` — deterministic per JVM. */
  def dir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-oracle-aux/$name"

  /** The DuckDB-side glob for `name`, embedded into oracle SQL. */
  def glob(name: String): String = s"${dir(name)}/*.parquet"

  /** Export `df` (a deterministic frame: same input dir ⇒ same rows) as
    * the aux table `name`, once per (name, sfDir) per JVM; a no-op
    * returning `df` untouched unless [[EnableProp]] is set. The frame is
    * coalesced to one file — aux tables are fingerprint-sized (8 bytes +
    * id per item), never data-sized. */
  def export(name: String, sfDir: String, df: DataFrame): DataFrame = {
    if (enabled)
      exported.compute(name, (_, prev) => {
        if (prev != sfDir)
          df.coalesce(1).write.mode("overwrite").parquet(dir(name))
        sfDir
      }): Unit
    df
  }
}
