package graft.streaming

import java.io.{BufferedWriter, File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{ForeachWriter, Row}

/** Row-at-a-time sink with the reference Cassandra sink's delivery contract
  * (/root/reference/dvaf/processor/.../sink/CassandraSinkFunction.java:14-53
  * + CassandraService.java:147-166): one "insert" per row, per-row errors
  * swallowed (at-least-once, lossy on error), one connection per partition
  * (open/close lifecycle). Here the connector target is JSON-lines files —
  * the same `ForeachWriter` shape plugs in any row-oriented store client.
  */
class JsonlForeachWriter(outDir: String) extends ForeachWriter[Row] {

  @transient private var writer: BufferedWriter = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    new File(outDir).mkdirs()
    // one file per (partition, epoch) — replays overwrite deterministically.
    // Explicit UTF-8: the escaping below passes non-ASCII through raw, which
    // is only valid if the writer encodes UTF-8 regardless of file.encoding.
    writer = new BufferedWriter(new OutputStreamWriter(
      new FileOutputStream(
        new File(outDir, s"part-$partitionId-epoch-$epochId.jsonl"), false),
      StandardCharsets.UTF_8))
    true
  }

  // field-name prefixes are identical for every row of a partition — derive
  // once on first row instead of re-allocating fieldNames + tuples per row
  private var fieldPrefixes: Array[String] = _

  override def process(row: Row): Unit =
    try {
      if (fieldPrefixes == null)
        fieldPrefixes = row.schema.fieldNames.map(n => "\"" + n + "\":")
      val sb = new java.lang.StringBuilder(64)
      sb.append('{')
      var i = 0
      while (i < fieldPrefixes.length) {
        if (i > 0) sb.append(',')
        sb.append(fieldPrefixes(i))
        row.get(i) match {
          case null => sb.append("null")
          // bare NaN/Infinity tokens are not JSON — render as null
          case d: java.lang.Double if d.isNaN || d.isInfinite => sb.append("null")
          case f: java.lang.Float if f.isNaN || f.isInfinite => sb.append("null")
          case n: Number => sb.append(n.toString)
          case b: Boolean => sb.append(b.toString)
          case other => sb.append(graft.util.Json.quote(other.toString))
        }
        i += 1
      }
      sb.append('}')
      writer.write(sb.toString)
      writer.newLine()
    } catch {
      case e: Exception =>
        // per-row error swallow: log and continue (CassandraService.java:163-165)
        System.err.println(s"[JsonlForeachWriter] row failed: ${e.getMessage}")
    }

  override def close(errorOrNull: Throwable): Unit =
    if (writer != null) writer.close()
}
