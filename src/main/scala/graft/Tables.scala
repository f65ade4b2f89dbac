package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * The `events` table has been written two ways across testdata generations:
  * as int64 nanosecond epochs (readable only via
  * spark.sql.legacy.parquet.nanosAsLong, then truncated ns→µs the way DuckDB
  * casts TIMESTAMP_NS → TIMESTAMP) and as native `timestamp[us]`. We branch
  * on the LOADED schema rather than assuming one generation, and fail fast
  * with the offending file path on anything else — one readable assert
  * instead of sixty downstream analysis errors when the data drifts again.
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

  /** Scale-adaptive scan spreading (optimization guide §2.5, "input skew:
    * one huge unsplittable file ... otherwise repartition immediately
    * after the read"). A parquet row group is the atomic split unit, and
    * the driver's testdata tables are SINGLE-row-group files — so every
    * scan plans one task and any expensive per-row kernel downstream
    * (the k-hash MinHash ladder, PQ/rotation encodes, media decode,
    * tokenize+explode map sides) runs single-threaded regardless of
    * cores. Gated on the ACTUAL planned scan parallelism: a real corpus
    * (many files / row groups — at 100 TB thousands of splits) returns
    * `df` untouched, so no production shuffle is ever added; only the
    * degenerate local shape pays the (tiny: input is at most a few
    * single-row-group files) round-robin exchange. Callers must be
    * row-order-independent downstream — every consumer is an aggregate /
    * equi-join / total-order window under the engine-wide integer
    * arithmetic discipline; order-SENSITIVE paths (autoincrement
    * minting's zipWithIndex, coalesce(1) staging writes) must not route
    * through this. Streaming frames pass through untouched (`.rdd` is
    * undefined for them; micro-batch kernels inside foreachBatch see
    * plain batch frames and do spread). */
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    // Exchange-free gate BEFORE touching .rdd (r15 ADVICE): `.rdd`
    // re-plans the frame and, under AQE, eagerly materializes any upstream
    // shuffle stages at DataFrame-construction time — work the real
    // execution does not reuse. Spread only ever targets scan-adjacent
    // kernels, so frames whose analyzed plan contains anything wider than
    // project/filter/generate/union over leaves pass through untouched
    // (a post-shuffle frame's parallelism is already the shuffle's); for
    // the narrow survivors, planning .rdd runs no jobs.
    val narrow = df.queryExecution.analyzed.collectFirst {
      case p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
          if !(p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project] ||
               p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter] ||
               p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Generate] ||
               p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias] ||
               p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Union] ||
               p.children.isEmpty) => p
    }.isEmpty
    if (!narrow) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = name match {
      case "events" =>
        // nanosAsLong lets a TIMESTAMP(NANOS) file load as Long instead of
        // erroring; it is a no-op for files already stored as timestamp[us].
        // This MUST be the session conf: Spark 4.1's parquet reader resolves
        // the flag only from sessionState.conf (ParquetFileFormat
        // .setupHadoopConf / readSchema — verified in the bundled jar; a
        // per-read .option of the key is silently ignored). The set is
        // idempotent and the value never varies, so the global mutation is
        // benign.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(path(dir, name))
        normalizeEventsTs(df, src = path(dir, name))
      case _ =>
        spark.read.parquet(path(dir, name))
    }
    naiveTimestamps(raw)
  }

  /** Schema-adaptive `ts` normalization shared by the batch loader and the
    * streaming readers: int64 nanos → µs truncation (positive epochs:
    * `div` == floor, matching DuckDB's TIMESTAMP_NS → TIMESTAMP cast);
    * native timestamp passes through; anything else fails fast naming the
    * source, so the next testdata drift is one readable error instead of
    * sixty analysis failures.
    */
  def normalizeEventsTs(df: DataFrame, src: String = "events"): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        df
      case other =>
        throw new IllegalStateException(
          s"$src: column `ts` has unexpected type $other (expected int64 " +
            "nanos or timestamp[us]); the testdata schema has drifted — " +
            "update Tables.normalizeEventsTs")
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
