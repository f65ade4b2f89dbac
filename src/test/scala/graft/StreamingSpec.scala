package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
import graft.streaming.{Schedule, StreamingSync}
import graft.sync.SyncEngine

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = LocalDateTime.parse(s)

  private def batch(rows: Seq[(Long, String, String, Double)]) =
    rows.toDF("id", "dt", "kind", "value")
      .withColumn("dt", col("dt").cast("timestamp_ntz"))

  test("streaming sync drains a multi-file source idempotently (AvailableNow)") {
    val srcDir = tmpDir()
    // three overlapping micro-batch files: redelivered + changed rows
    batch(Seq((1L, "2024-01-01T00:00:00", "a", 1.0), (2L, "2024-01-02T00:00:00", "b", 2.0)))
      .coalesce(1).write.parquet(s"$srcDir/f1")
    batch(Seq((2L, "2024-01-02T00:00:00", "b", 2.0), (3L, "2024-01-03T00:00:00", "c", 3.0)))
      .coalesce(1).write.parquet(s"$srcDir/f2")
    batch(Seq((3L, "2024-01-03T00:00:00", "c", 30.0), (4L, "2024-01-04T00:00:00", "d", 4.0)))
      .coalesce(1).write.parquet(s"$srcDir/f3")
    // flatten part files into one stream dir
    val flat = tmpDir()
    val fs = new org.apache.hadoop.fs.Path(flat)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("f1", "f2", "f3").zipWithIndex.foreach { case (f, i) =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$srcDir/$f"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach(st => fs.rename(st.getPath, new org.apache.hadoop.fs.Path(s"$flat/part_$i.parquet")))
    }

    val engine = new SyncEngine(spark, tmpDir())
    val spec = PipeSpec(PipeKeys("stream", "events"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")))

    val schema = StreamingSync.parquetSchema(spark, flat)
    val stream = StreamingSync.parquetStream(spark, flat, schema, maxFilesPerTrigger = Some(1))
    val q = StreamingSync.run(engine, spec, stream, tmpDir())
    q.awaitTermination(120000)

    val out = engine.getData(spec).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // id=3 was updated by the later batch (30.0 wins)
    assert(out.find(_.getLong(0) == 3L).get.getAs[Double]("value") == 30.0)
  }

  test("watermark dedup drops redelivered keys inside the window") {
    val dir = s"${tmpDir()}/src"
    batch(Seq(
      (1L, "2024-01-01T00:00:00", "a", 1.0),
      (1L, "2024-01-01T00:00:00", "a", 1.0),
      (2L, "2024-01-01T01:00:00", "b", 2.0)))
      .coalesce(1).write.parquet(dir)
    val schema = StreamingSync.parquetSchema(spark, dir)
    val stream = StreamingSync.parquetStream(spark, dir, schema)
    val deduped = StreamingSync.withWatermarkDedup(stream, "dt", Seq("id"))
    val outDir = s"${tmpDir()}/out"
    val q = deduped.writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", tmpDir())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(outDir).select("id").distinct().count() == 2)
    assert(spark.read.parquet(outDir).count() == 2)
  }

  test("windowed counts aggregate into tumbling chunks") {
    val dir = s"${tmpDir()}/src"
    batch(Seq(
      (1L, "2024-01-01T00:10:00", "a", 1.0),
      (2L, "2024-01-01T00:20:00", "a", 1.0),
      (3L, "2024-01-01T01:10:00", "a", 1.0)))
      .coalesce(1).write.parquet(dir)
    val schema = StreamingSync.parquetSchema(spark, dir)
    val stream = StreamingSync.parquetStream(spark, dir, schema)
    val outDir = s"${tmpDir()}/out"
    val q = StreamingSync.windowedCounts(stream, "dt", "1 hour")
      .writeStream.outputMode("append")
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", tmpDir())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode only emits windows closed by the watermark; with
    // AvailableNow over a bounded source the final watermark closes all but
    // the last open window — accept >= 1 emitted rows with correct counts.
    val rows = spark.read.parquet(outDir).collect()
    rows.foreach { r =>
      val cnt = r.getAs[Long]("cnt")
      assert(cnt == 2 || cnt == 1)
    }
  }

  test("runningSyncTimes: stateful per-id bookmarks advance monotonically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingSync.runningSyncTimes(input.toDF().toDF("id", "dt"), "id", "dt")
      .toDF("id", "sync_time")
      .writeStream.format("memory").queryName("st_out").outputMode("update").start()
    try {
      input.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // late row for id 1 (no emit), newer row for id 2 (emit)
      input.addData((1L, ts("2023-12-31 00:00:00")), (2L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      val rows = spark.table("st_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
      assert(rows.size == 3)
      assert(rows.contains((1L, ts("2024-01-01 00:00:00"))))
      assert(rows.contains((2L, ts("2024-01-01 01:00:00"))))
      assert(rows.contains((2L, ts("2024-01-02 00:00:00"))))
      assert(!rows.contains((1L, ts("2023-12-31 00:00:00"))))
    } finally q.stop()
  }

  test("schedule DSL maps to triggers") {
    assert(Schedule.toTrigger("every 10 minutes") == Trigger.ProcessingTime("10 minutes"))
    assert(Schedule.toTrigger("every 1 second") == Trigger.ProcessingTime("1 seconds"))
    assert(Schedule.toTrigger("hourly") == Trigger.ProcessingTime("1 hours"))
    assert(Schedule.toTrigger("once").isInstanceOf[Trigger])
    intercept[IllegalArgumentException](Schedule.toTrigger("fortnightly vibes"))
  }

  test("schedule DSL next-fire goldens (reference tests/utils/test_schedule.py)") {
    import java.time.LocalDateTime
    val from = LocalDateTime.parse("2024-01-01T00:00:00")
    def fires(s: String, n: Int = 3): Seq[String] =
      Schedule.nextFires(s, from, n).map(_.toString)

    assert(fires("every 10 seconds starting 2024-05-01") ==
      Seq("2024-05-01T00:00", "2024-05-01T00:00:10", "2024-05-01T00:00:20"))
    assert(fires("* * * * * starting 2024-05-01") ==
      Seq("2024-05-01T00:00", "2024-05-01T00:01", "2024-05-01T00:02"))
    assert(fires("daily starting May 1, 2024") ==
      Seq("2024-05-01T00:00", "2024-05-02T00:00", "2024-05-03T00:00"))
    assert(fires("weekly starting 2024-05-01") ==
      Seq("2024-05-01T00:00", "2024-05-08T00:00", "2024-05-15T00:00"))
    assert(fires("monthly starting 2024-05-01") ==
      Seq("2024-05-01T00:00", "2024-06-01T00:00", "2024-07-01T00:00"))
    assert(fires("every 3 seconds starting 2024-01-23 01:23:34") ==
      Seq("2024-01-23T01:23:34", "2024-01-23T01:23:37", "2024-01-23T01:23:40"))
    assert(fires("weekly & daily starting 2024-05-01") ==
      Seq("2024-05-01T00:00", "2024-05-08T00:00", "2024-05-15T00:00"))
    assert(fires("every 3 days & every 5 days starting 2024-05-01") ==
      Seq("2024-05-01T00:00", "2024-05-16T00:00", "2024-05-31T00:00"))
    assert(fires("every 13 minutes & every 17 minutes starting 2024-05-01") ==
      Seq("2024-05-01T00:00", "2024-05-01T03:41", "2024-05-01T07:22"))
    assert(fires("every 13 minutes | every 17 minutes starting 2024-05-01") ==
      Seq("2024-05-01T00:00", "2024-05-01T00:13", "2024-05-01T00:17"))
    assert(fires("every 7 minutes and every 3 days starting 2024-05-01") ==
      Seq("2024-05-01T00:00", "2024-05-22T00:00", "2024-06-12T00:00"))
    // cron subset: weekday mornings at a fixed minute
    assert(fires("30 6 * * mon-fri starting 2024-05-01") ==
      Seq("2024-05-01T06:30", "2024-05-02T06:30", "2024-05-03T06:30"))
  }
}

class ScheduleEdgeSpec extends SparkSpec {
  import java.time.LocalDateTime
  import graft.streaming.Schedule

  private val base = LocalDateTime.of(2026, 1, 5, 10, 0, 0) // a Monday

  test("wrapped day-of-week ranges fire on the wrapped days (fri-sun)") {
    val fires = Schedule.nextFires("fri-sun", base, 3)
    assert(fires.nonEmpty)
    assert(fires.forall(t => Set(5, 6, 7).contains(t.getDayOfWeek.getValue)))
  }

  test("dow 7 is Sunday (standard cron) and full names resolve") {
    val sun = Schedule.nextFires("0 0 * * 7", base, 1).head
    assert(sun.getDayOfWeek == java.time.DayOfWeek.SUNDAY)
    val tue = Schedule.nextFires("tuesday", base, 1).head
    assert(tue.getDayOfWeek == java.time.DayOfWeek.TUESDAY)
  }

  test("impossible cron specs fail fast instead of hanging") {
    intercept[IllegalArgumentException] {
      Schedule.nextFires("0 0 31 2 *", base, 1) // Feb 31 never exists
    }
  }

  test("'A & B' with a non-minute-aligned anchor still fires") {
    val anchored = base.withSecond(30)
    val fires = Schedule.nextFires("hourly & mon-fri", anchored, 3)
    assert(fires.length == 3)
    assert(fires.forall(_.getSecond == 0))
    assert(fires.forall(t => t.getDayOfWeek.getValue <= 5))
  }

  test("ISO 'T' starting anchors parse (case preserved)") {
    val fires = Schedule.nextFires(
      "every 1 day starting 2026-02-01T06:30:00", base, 2)
    assert(fires == Seq(
      LocalDateTime.of(2026, 2, 1, 6, 30), LocalDateTime.of(2026, 2, 2, 6, 30)))
  }
}

class EpochUnitsSpec extends SparkSpec {
  test("unitsForMinutes rounds UP on coarse axes and preserves zero") {
    import graft.dsl.EpochAxis.unitsForMinutes
    assert(unitsForMinutes("hour", 90) == 2)   // was 1: narrowed the window
    assert(unitsForMinutes("hour", 60) == 1)
    assert(unitsForMinutes("day", 1441) == 2)
    assert(unitsForMinutes("day", 1440) == 1)
    assert(unitsForMinutes("minute", 5) == 5)
    assert(unitsForMinutes("second", 2) == 120)
    assert(unitsForMinutes("hour", 0) == 0)    // explicit no-pad stays none
  }
}
