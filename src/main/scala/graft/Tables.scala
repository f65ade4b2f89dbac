package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * The `events` table is written with nanosecond timestamps, which Spark's
  * parquet reader rejects by default. We read the column as a raw Long
  * (spark.sql.legacy.parquet.nanosAsLong) and truncate to microseconds —
  * exactly what DuckDB does when it casts TIMESTAMP_NS → TIMESTAMP — so the
  * DuckDB oracle and the Spark plan see identical values.
  *
  * At 100 TB these reads are plain columnar scans: projection and predicates
  * fed by callers reach the parquet reader (PushedFilters / ReadSchema), so
  * no caching or materialization happens here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(path(dir, name))
        // ns → µs truncation (positive epochs: `div` == floor), matching DuckDB.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        spark.read.parquet(path(dir, name))
    }
    naiveTimestamps(raw)
  }

  /** Cast session-TZ timestamps to TimestampNTZ (identity under the pinned
    * UTC session zone). DuckDB's TIMESTAMP is timezone-naive, so emitting NTZ
    * keeps parquet schemas and pandas dtypes identical between our output and
    * the oracle's.
    */
  def naiveTimestamps(df: DataFrame): DataFrame = {
    val needsCast = df.schema.fields.exists(_.dataType == org.apache.spark.sql.types.TimestampType)
    if (!needsCast) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          col(f.name).cast(org.apache.spark.sql.types.TimestampNTZType).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
