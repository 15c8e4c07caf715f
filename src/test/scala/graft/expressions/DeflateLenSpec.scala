package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.TextFunctions

/** deflate_len semantics: byte-exact parity with an independent
  * java.util.zip recomputation (eval AND codegen paths), null handling,
  * the repetitive-text ordering the quality filter relies on, and the SQL
  * registration.
  */
class DeflateLenSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def reference(s: String): Int = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes("UTF-8"))
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.size()
  }

  private val texts = Seq(
    "",
    "a",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "the quick brown fox jumps over the lazy dog",
    "ab" * 500,
    (0 until 200).map(i => (i * 2654435761L % 997).toString).mkString(" "),
    "naïve — déjà vu ✓")

  test("matches an independent java.util.zip recomputation byte-for-byte") {
    val got = texts.toDF("t")
      .select(TextFunctions.deflateLen(col("t")).as("n"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == texts.map(reference))
  }

  test("null in, null out") {
    val got = Seq[Option[String]](Some("x"), None).toDF("t")
      .select(TextFunctions.deflateLen(col("t")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got(0).isDefined && got(1).isEmpty)
  }

  test("repetitive text compresses far below natural text of equal length") {
    val rep = "spam " * 200
    val nat = (0 until 200).map(i =>
      ((i * 6364136223846793005L + 1442695040888963407L) % 99991).toString)
      .mkString(" ").padTo(rep.length, 'x').substring(0, rep.length)
    val Array(rRep, rNat) = Seq(rep, nat).toDF("t")
      .select((TextFunctions.deflateLen(col("t")).cast("double") /
        length(col("t"))).as("r"))
      .collect().map(_.getDouble(0))
    assert(rRep < rNat * 0.5, s"rep=$rRep nat=$rNat")
  }

  test("registered as SQL deflate_len with cast-through semantics") {
    graft.GraftFunctions.register(spark)
    val n = spark.sql("SELECT deflate_len('aaaaaaaaaaaaaaaa') AS n")
      .collect()(0).getInt(0)
    assert(n == reference("aaaaaaaaaaaaaaaa"))
  }

  test("the ext97 repetitive flag is live at gate SF: both values occur") {
    val out = graft.queries.ExtensionQueries.defs
      .find(_.name == "ext97_compression_quality").get
      .build(spark, "/root/testdata/sf0.01")
    val flags = out.select("is_repetitive").distinct().collect()
      .map(_.getBoolean(0)).toSet
    assert(flags == Set(true, false), s"flag values present: $flags")
  }
}
