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

  override def process(row: Row): Unit =
    try {
      val json = row.schema.fieldNames.zipWithIndex.map { case (name, i) =>
        val v = row.get(i)
        val rendered = v match {
          case null => "null"
          // bare NaN/Infinity tokens are not JSON — render as null
          case d: java.lang.Double if d.isNaN || d.isInfinite => "null"
          case f: java.lang.Float if f.isNaN || f.isInfinite => "null"
          case n: Number => n.toString
          case b: Boolean => b.toString
          case other => "\"" + other.toString.flatMap {
            case '"' => "\\\""
            case '\\' => "\\\\"
            case '\n' => "\\n"
            case '\r' => "\\r"
            case '\t' => "\\t"
            case c if c < ' ' => f"\\u${c.toInt}%04x"
            case c => c.toString
          } + "\""
        }
        "\"" + name + "\":" + rendered
      }.mkString("{", ",", "}")
      writer.write(json)
      writer.newLine()
    } catch {
      case e: Exception =>
        // per-row error swallow: log and continue (CassandraService.java:163-165)
        System.err.println(s"[JsonlForeachWriter] row failed: ${e.getMessage}")
    }

  override def close(errorOrNull: Throwable): Unit =
    if (writer != null) writer.close()
}
