package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Dev probe: where does ext08's time go at sf0.1. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(appName = "graft-lsh-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val sigs = docs.select(col("doc_id").as("id"),
      minHashSignature(shingles(tokens(col("text")), 3), 64).as("sig")).cache()
    time("signatures (5000 docs)")(println("sigs=" + sigs.count()))
    val banded = sigs.select(col("id"), col("sig"), explode(lshBands(col("sig"), 16, 4)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key")).cache()
    time("banding")(println("banded=" + banded.count()))
    val a = banded.select(col("band"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    val joined = a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
    time("banded self-join count")(println("pairs=" + joined.count()))
    val uniq = joined.select("id_a", "id_b", "sig_a", "sig_b").distinct()
    time("distinct pairs")(println("uniq=" + uniq.count()))
    spark.stop()
  }
}
