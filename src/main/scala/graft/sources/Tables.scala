package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB design): every loader is a plain parquet scan, so
  * Catalyst predicate pushdown / column pruning / partition pruning apply
  * unchanged when these paths point at partitioned cloud storage instead of
  * the local test fixtures. No collect(), no driver-side staging.
  */
object Tables {

  /** Plain parquet table scan. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table's `ts` column has shipped in two physical layouts
    * across driver testdata generations: parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]), so it is
    * read as a raw nanos long via `spark.sql.legacy.parquet.nanosAsLong` —
    * and parquet TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark
    * reads natively as TIMESTAMP_NTZ. This loader adapts on the scanned
    * schema and exposes an identical surface for both:
    *   - `ts_ns`  nanoseconds-since-epoch (long);
    *   - `ts_us`  microseconds-since-epoch (long) — the canonical event time
    *     used by every query (DuckDB also reads parquet event time at µs, so
    *     µs is the common precision of both engines);
    *   - `ts`     TimestampType at µs for date/window functions.
    * The session timezone is pinned UTC (GraftSession), so the NTZ→TZ cast
    * below is the identity on the stored micros — exactly DuckDB's
    * `epoch_us(ts)` on the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // NOTE session-wide effect, deliberately not restored: the conf must
    // still hold when the lazy plan executes, and any nanos-parquet read in
    // a graft session is this table. Declared here AND in GraftSession.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as long
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ => // TIMESTAMP(MICROS): TIMESTAMP_NTZ (or TIMESTAMP if adjusted)
        val cols = raw.columns.map(c => if (c == "ts") "ts_ns" else c) ++
          Seq("ts_us", "ts") // keep the nanos-era column order
        raw.withColumn("ts_us", expr("unix_micros(cast(ts as timestamp))"))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
          .withColumn("ts", expr("timestamp_micros(ts_us)"))
          .select(cols.head, cols.tail: _*)
    }
  }

  /** CSV scan with header. Pass a schema to keep the scan single-pass;
    * without one, inference is enabled and reads the data twice.
    */
  def csv(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** JSON-lines scan (schema optional, same single-pass note as csv). */
  def json(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  /** ORC scan — same columnar pushdown/pruning properties as parquet. */
  def orc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
