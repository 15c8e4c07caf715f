package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class FimSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "x"),
    (4L, "")).toDF("doc_id", "text")

  test("segment lengths are non-negative and sum to the document length") {
    val r = Fim.split(docs, "text", "doc_id")
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("n")), "doc_id")
      .collect()
    assert(r.length == 4)
    r.foreach { row =>
      val (p, m, s, n) = (row.getAs[Long]("p_len"), row.getAs[Long]("m_len"),
        row.getAs[Long]("s_len"), row.getAs[Long]("n"))
      assert(p >= 0 && m >= 0 && s >= 0)
      assert(p + m + s == n, s"doc ${row.getLong(0)}: $p+$m+$s != $n")
    }
  }

  test("the middle digest matches the actual substring at the computed cut points") {
    val split = Fim.split(docs, "text", "doc_id")
    val check = split
      .join(docs, "doc_id")
      .withColumn("expected",
        md5(col("text").substr((col("p_len") + 1).cast("int"), col("m_len").cast("int"))))
      .filter(col("middle_md5") =!= col("expected"))
    assert(check.isEmpty)
  }

  test("splits are deterministic across runs and spmPermille pins the mode mix") {
    val a = Fim.split(docs, "text", "doc_id").collect().map(_.toSeq).toSet
    val b = Fim.split(docs, "text", "doc_id").collect().map(_.toSeq).toSet
    assert(a == b)
    assert(Fim.split(docs, "text", "doc_id", spmPermille = 0)
      .select("fim_mode").distinct().collect().map(_.getString(0)).toSeq == Seq("psm"))
    assert(Fim.split(docs, "text", "doc_id", spmPermille = 1000)
      .select("fim_mode").distinct().collect().map(_.getString(0)).toSeq == Seq("spm"))
  }
}
