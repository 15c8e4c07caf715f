package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cv.ImageOps

/** Multimodal image columns (SURVEY.md §2.B sources + the north-star
  * multimodal surface): images as opaque `binary` with typed metadata,
  * read back through the `binaryFile` source — the Spark face of the
  * pipeline's PNG side-output directory
  * (/root/reference/dvaf/processor/.../MotionDetector.java:133-177).
  *
  * Scale notes: `binaryFile` scans are distributed file listings + streamed
  * content; decode/resize/feature UDFs run executor-side per partition, so a
  * 100 TB image corpus parallelizes by file. The UDFs keep bytes as
  * `BinaryType` end-to-end (no base64 strings).
  */
object Images {

  /** All PNGs under `dir` as (path, modificationTime, length, content). */
  def readPngDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(dir)

  private val decodeUdf = udf((bytes: Array[Byte]) =>
    ImageOps.decode(bytes).map(d => (d.rows, d.cols, d.channels, d.px)))

  private val resizeUdf = udf(
    (px: Array[Byte], rows: Int, cols: Int, channels: Int, outRows: Int, outCols: Int) =>
      ImageOps.resizeBilinear(px, rows, cols, channels, outRows, outCols))

  private val featuresUdf = udf((px: Array[Byte], rows: Int, cols: Int, channels: Int) => {
    val (mean, std, edges) = ImageOps.features(px, rows, cols, channels)
    (mean, std, edges)
  })

  /** Decode the `content` column → image struct (rows, cols, channels, px);
    * undecodable files are dropped, mirroring the parse-null-filter contract
    * of the frame stream.
    */
  def decoded(images: DataFrame): DataFrame =
    images
      .withColumn("img", decodeUdf(col("content")))
      .filter(col("img").isNotNull)
      .select(
        col("path"),
        col("img._1").as("rows"),
        col("img._2").as("cols"),
        col("img._3").as("channels"),
        col("img._4").as("px"))

  /** Add a bilinear-resized pixel column (producer resize analog). */
  def withResized(decoded: DataFrame, outRows: Int, outCols: Int): DataFrame =
    decoded
      .withColumn("px_resized",
        resizeUdf(col("px"), col("rows"), col("cols"), col("channels"),
          lit(outRows), lit(outCols)))
      .withColumn("rows_resized", lit(outRows))
      .withColumn("cols_resized", lit(outCols))

  /** Add content features (mean/std luma, edge density). */
  def withFeatures(decoded: DataFrame): DataFrame =
    decoded
      .withColumn("f", featuresUdf(col("px"), col("rows"), col("cols"), col("channels")))
      .withColumn("mean_luma", round(col("f._1"), 4))
      .withColumn("std_luma", round(col("f._2"), 4))
      .withColumn("edge_density", round(col("f._3"), 6))
      .drop("f")

  /** Every-nth frame sampling by the sequence embedded in the side-output
    * filename `{camId}-T-{epochMillis}.png` — time-ordered per camera.
    */
  def sampleFrames(images: DataFrame, everyNth: Int): DataFrame = {
    val named = images
      .withColumn("fname", element_at(split(col("path"), "/"), -1))
      // stray files that don't match {cam}-T-{ms}.png are dropped BEFORE
      // the cast: under ANSI mode (Spark 4 default) casting the empty
      // string from a failed regexp_extract would abort the job
      .filter(col("fname").rlike("^.+-T-\\d+\\.png$"))
      .withColumn("camera_id", regexp_extract(col("fname"), "^(.*)-T-\\d+\\.png$", 1))
      .withColumn("epoch_ms", regexp_extract(col("fname"), "-T-(\\d+)\\.png$", 1).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("camera_id").orderBy(col("epoch_ms"))
    named
      .withColumn("seq", row_number().over(w))
      .filter((col("seq") - 1) % everyNth === 0)
      .drop("fname")
  }
}
