package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction for training corpora.
  *
  * Patterns are restricted to the Java-regex ∩ RE2 common subset (no
  * lookaround, no backreferences, ASCII `\b` word boundaries) so the SAME
  * pattern strings run under Spark's codegen'd regexp functions, the
  * DuckDB/RE2 oracle, and any pushdown engine. Everything here is map-side
  * codegen'd built-ins — redaction adds no shuffle and rides whole-stage
  * codegen.
  *
  * Redaction order is emails → phones → IPs: an email's domain may embed
  * an IP-shaped run (`user@10.0.0.1.net`) — the IP pass would tear the
  * address apart and leave the local part unredacted, so addresses collapse
  * first; the remaining two cannot overlap (phones have no dots, IPs no
  * dashes).
  */
object Redaction {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** NANP-ish / TPC-H-style dashed phone: 2-3 digit country/area prefix. */
  val phoneRe = "\\b\\d{2,3}-\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Replace every email/phone/IPv4 match with a typed placeholder. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** Per-document PII match counts (email/phone/IPv4), as long columns.
    * Counted on the RAW text independently — counts are diagnostic, the
    * scrub order only matters for the rewritten string.
    */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(emailRe), lit(0))).cast("long"),
    "n_phones" -> size(regexp_extract_all(text, lit(phoneRe), lit(0))).cast("long"),
    "n_ips" -> size(regexp_extract_all(text, lit(ipv4Re), lit(0))).cast("long"))
}
