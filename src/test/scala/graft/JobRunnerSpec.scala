package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
import graft.jobs.{JobRunner, JobStatus}
import graft.sources.FnSource
import graft.sync.SyncEngine

/** e2e for the jobs runner (reference jobs/_Job.py:69+): a scheduled job
  * fires N times, records N SyncResults, failures are captured without
  * killing the loop, and stop() is prompt even mid-sleep. */
class JobRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def mkEngine() = new SyncEngine(spark, tmpDir())

  private val spec = PipeSpec(PipeKeys("jobs", "ticks"),
    columns = ColumnRoles(Map("datetime" -> "ts", "primary" -> "id")))

  test("a scheduled job fires N times and records N sync results") {
    val eng = mkEngine()
    val calls = new AtomicInteger(0)
    val src = new FnSource((s, _, _, _) => {
      val n = calls.incrementAndGet()
      Seq((java.sql.Timestamp.valueOf(f"2024-01-01 10:0$n%d:00"), n.toLong, s"v$n"))
        .toDF("ts", "id", "v")
    })
    val runner = new JobRunner(eng)
    val job = runner.start("ticks", spec, src, "every 1 second", maxRuns = Some(3))
    assert(job.awaitRuns(3, timeoutMs = 60000), s"only ${job.runCount} runs")
    job.stop()
    assert(job.runs.size == 3)
    assert(job.runs.forall(_.succeeded), job.runs.map(_.result).mkString("; "))
    assert(job.runs.map(_.result.toOption.get.inserted).sum == 3)
    assert(job.status == JobStatus.Completed)
    // the synced pipe really holds the three fetched rows
    assert(eng.getData(spec).select($"id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // fires advance monotonically
    val fires = job.runs.map(_.fire)
    assert(fires == fires.sorted && fires.distinct.size == fires.size)
  }

  test("a failing fire is captured as a run, and the loop continues") {
    val eng = mkEngine()
    val calls = new AtomicInteger(0)
    val src = new FnSource((s, _, _, _) => {
      val n = calls.incrementAndGet()
      if (n == 2) throw new RuntimeException("transient upstream outage")
      Seq((java.sql.Timestamp.valueOf(f"2024-01-01 10:0$n%d:00"), n.toLong))
        .toDF("ts", "id")
    })
    val runner = new JobRunner(eng)
    val job = runner.start("flaky", spec.copy(keys = PipeKeys("jobs", "flaky")),
      src, "every 1 second", maxRuns = Some(3))
    assert(job.awaitRuns(3, timeoutMs = 60000))
    job.stop()
    val results = job.runs.map(_.result)
    assert(results.count(_.isRight) == 2 && results.count(_.isLeft) == 1)
    assert(results(1).left.exists(_.contains("transient upstream outage")))
  }

  test("stop() interrupts a far-future sleep promptly") {
    val eng = mkEngine()
    val src = new FnSource((s, _, _, _) =>
      Seq((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L)).toDF("ts", "id"))
    val runner = new JobRunner(eng)
    val job = runner.start("sleepy", spec.copy(keys = PipeKeys("jobs", "sleepy")),
      src, "every 1 hour starting 2099-01-01")
    val t0 = System.currentTimeMillis()
    job.stop()
    assert(System.currentTimeMillis() - t0 < 5000, "stop must not wait out the sleep")
    assert(job.status == JobStatus.Stopped && job.runs.isEmpty)
  }

  test("registry semantics: names, duplicates, eager schedule validation") {
    val eng = mkEngine()
    val src = new FnSource((s, _, _, _) =>
      Seq((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L)).toDF("ts", "id"))
    val runner = new JobRunner(eng)
    intercept[IllegalArgumentException] {
      runner.start("bad name/", spec, src, "every 1 second")
    }
    intercept[IllegalArgumentException] {
      runner.start("oops", spec, src, "every 1 blorp")
    }
    assert(runner.get("oops").isEmpty, "failed start must not register")
    val j = runner.start("dup", spec.copy(keys = PipeKeys("jobs", "dup")),
      src, "every 1 hour starting 2099-01-01")
    intercept[IllegalArgumentException] {
      runner.start("dup", spec, src, "every 1 second")
    }
    assert(runner.list.map(_._1) == Seq("dup"))
    runner.delete("dup")
    assert(runner.get("dup").isEmpty && !j.isAlive)
  }
}

/** Regression: interval schedules must WAIT their period between fires —
  * nextFires' at-or-after anchor contract would otherwise re-yield the
  * anchor and run the job back-to-back continuously. */
class JobIntervalSpec extends SparkSpec {
  import spark.implicits._

  test("'every 2 seconds' fires are spaced by the interval, not back-to-back") {
    val eng = new graft.sync.SyncEngine(spark, tmpDir())
    val spec = graft.catalog.PipeSpec(graft.catalog.PipeKeys("jobs", "spaced"),
      columns = graft.catalog.ColumnRoles(Map("datetime" -> "ts", "primary" -> "id")))
    val src = new graft.sources.FnSource((s, _, _, _) =>
      Seq((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L)).toDF("ts", "id"))
    val runner = new graft.jobs.JobRunner(eng)
    val t0 = System.currentTimeMillis()
    val job = runner.start("spaced", spec, src, "every 2 seconds", maxRuns = Some(3))
    assert(job.awaitRuns(3, timeoutMs = 60000))
    job.stop()
    val elapsed = System.currentTimeMillis() - t0
    // first fire immediate, then two 2-second waits -> >= ~4s total
    assert(elapsed >= 3500, s"3 fires completed in ${elapsed}ms — not interval-spaced")
    val fires = job.runs.map(_.fire)
    assert(fires.sliding(2).forall { case Seq(a, b) =>
      java.time.Duration.between(a, b).toMillis >= 1900 }, fires.toString)
  }

  test("a past 'starting' anchor catches up ONCE, then waits for the future grid") {
    val eng = new graft.sync.SyncEngine(spark, tmpDir())
    val spec = graft.catalog.PipeSpec(graft.catalog.PipeKeys("jobs", "catchup"),
      columns = graft.catalog.ColumnRoles(Map("datetime" -> "ts", "primary" -> "id")))
    val src = new graft.sources.FnSource((s, _, _, _) =>
      Seq((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L)).toDF("ts", "id"))
    val runner = new graft.jobs.JobRunner(eng)
    val job = runner.start("catchup", spec, src, "every 1 hour starting 2020-01-01")
    assert(job.awaitRuns(1, timeoutMs = 30000), "the catch-up fire must happen")
    // no missed-fire storm: after the catch-up the next fire is future-dated
    Thread.sleep(1500)
    assert(job.runCount == 1, s"missed-fire storm: ${job.runCount} runs")
    job.stop()
    assert(job.status == graft.jobs.JobStatus.Stopped)
  }
}
