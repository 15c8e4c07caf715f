package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cv.AudioOps

/** Audio as a multimodal binary column: binaryFile reads + decode/feature/
  * resample UDFs, mirroring [[Images]]. Executor-side byte[] work only.
  */
object Audio {

  def readWavDir(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", "*.wav").load(dir)

  private val decodeUdf = udf((bytes: Array[Byte]) =>
    AudioOps.decodeWav(bytes).map(d => (d.sampleRate, d.channels, d.samples.length)))

  private val featuresUdf = udf((bytes: Array[Byte]) =>
    AudioOps.decodeWav(bytes).map { d =>
      val (rms, peak, zcr) = AudioOps.features(d)
      (math.rint(rms * 1e6) / 1e6, math.rint(peak * 1e6) / 1e6, math.rint(zcr * 1e6) / 1e6)
    })

  /** Decode metadata (undecodable rows dropped). */
  def decoded(audio: DataFrame): DataFrame =
    audio
      .withColumn("a", decodeUdf(col("content")))
      .filter(col("a").isNotNull)
      .select(
        col("path"),
        col("a._1").as("sample_rate"),
        col("a._2").as("channels"),
        col("a._3").as("n_samples"))

  /** Quality features per clip. */
  def withFeatures(audio: DataFrame): DataFrame =
    audio
      .withColumn("f", featuresUdf(col("content")))
      .filter(col("f").isNotNull)
      .select(
        col("path"),
        col("f._1").as("rms"),
        col("f._2").as("peak"),
        col("f._3").as("zero_crossing_rate"))
}
