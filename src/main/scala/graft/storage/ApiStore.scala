package graft.storage

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.{Duration, LocalDateTime}

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.SparkSession

import graft.catalog.PipeSpec
import graft.server.PipeServer
import graft.sources.HttpFetch

/** HTTP-backed [[InstanceStore]] — the client half of the API instance
  * connector (the reference's `connectors/api/_pipes.py:368-489`, which
  * implements the same instance interface as SQLConnector so a REMOTE
  * server can be the pipes backend). Every method maps onto one
  * [[graft.server.PipeServer]] route; running the engine's backend
  * contract suite over this store is the proof that the instance seam
  * survives serialization across a process boundary.
  *
  * Scale shape: writes are executor-parallel (each partition POSTs its own
  * staged part; one driver `commit` applies the patch under the server's
  * write lease), so patch data never funnels through the client driver.
  * Reads materialize eagerly (fetch + localCheckpoint) to give the same
  * snapshot semantics as the other backends — a lazy HTTP scan could
  * observe its own sync's mutation mid-plan. Row volume on this path is
  * patch-scale by construction (the engine diffs before it writes); bulk
  * analytical reads belong on the parquet backend directly, exactly as in
  * the reference deployment.
  *
  * Errors surface as the server-side exception class where the engine's
  * contracts depend on it (IllegalArgument/IllegalState), else IOException.
  */
final class ApiStore(spark: SparkSession, baseUrl: String, root: String,
                     val spec: PipeSpec) extends InstanceStore {

  import ApiStore._
  import PipeServer.{encodeAny, jsonOpts, jsonOptsJava}

  private def target = spec.targetName
  private def dtCol: Option[String] = spec.columns.datetime

  ApiStore.ensureRegistered(spark, baseUrl, root, spec)

  private def u(op: String, q: (String, String)*): String = {
    val qs = (Seq("root" -> root, "target" -> target) ++ q)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    s"$baseUrl/pipes/$op?$qs"
  }

  /** Instance-level request wrapper: a server that restarted (losing its
    * in-memory registry) answers every route with "not registered" even
    * though this client registered earlier — the process-wide cache then
    * pins the failure forever. Self-heal: invalidate the cache entry,
    * re-register, retry ONCE. */
  private def call(method: String, url: String): String =
    try ApiStore.call(method, url)
    catch {
      case e: IllegalArgumentException
          if Option(e.getMessage).exists(_.contains("is not registered")) =>
        ApiStore.registered.remove((baseUrl, root, target))
        ApiStore.ensureRegistered(spark, baseUrl, root, spec)
        ApiStore.call(method, url)
    }

  // ── reads ──────────────────────────────────────────────────────────────

  override def exists: Boolean = call("GET", u("exists")).toBoolean

  /** Schema DDL cached PROCESS-WIDE by (server, root, target): the engine
    * asks for the schema before every fetch (3-4 server footer reads per
    * sync at ~100-250 ms each) and creates a FRESH store handle per
    * operation, so a per-handle cache re-paid the GET on every handle
    * (r11 verdict: two ~100 ms schema calls per sync). Every write path
    * through ANY handle of this process invalidates the shared key; a
    * FOREIGN writer mutating concurrently is already excluded by the lease
    * model (and would race the data reads themselves, not just the
    * schema) — the same argument the old per-handle cache leaned on,
    * and the same keying [[ApiStore.registered]] already uses. */
  private def schemaKey = (baseUrl, root, target)
  private def invalidateSchema(): Unit = {
    ApiStore.schemaCache.remove(schemaKey); ()
  }

  /** One schema-route GET — the trait default would full-fetch the table. */
  override def schemaDdl: Option[String] =
    ApiStore.schemaCache.get(schemaKey) match {
      case Some(v) => v
      case None =>
        val (code, body) = request("GET", u("schema"))
        val v =
          if (code == 200) Some(body)
          else if (code == 404) None
          else Some(call("GET", u("schema"))) // surface mapped server errors
        ApiStore.schemaCache.put(schemaKey, v)
        v
    }

  private def fetchDf(dataUrls: Seq[String]): DataFrame = {
    val ddl = schemaDdl.getOrElse(call("GET", u("schema")))
    val schema = StructType.fromDDL(ddl)
    import spark.implicits._
    // executor-side pulls (tasks fetch, not the driver) — one task per
    // window URL so ranged reads stream k-way concurrently from the server
    // — then an eager checkpoint for snapshot semantics (class doc)
    val lines = spark.createDataset(dataUrls)
      .repartition(dataUrls.size)
      .flatMap(HttpFetch.lines(_))(Encoders.STRING)
    lines.select(from_json(col("value"), schema, jsonOptsJava).as("r"))
      .select("r.*").localCheckpoint(true)
  }

  private def rangeUrl(begin: Option[Any], end: Option[Any],
                       endInclusive: Boolean): String = {
    val bq = begin.map(encodeAny).toSeq.flatMap { case (k, v) =>
      Seq("begin" -> v, "beginK" -> k) }
    val eq = end.map(encodeAny).toSeq.flatMap { case (k, v) =>
      Seq("end" -> v, "endK" -> k) }
    u("data", (bq ++ eq :+ ("endIncl" -> endInclusive.toString)): _*)
  }

  /** Split a ranged read into `ApiStore.fetchParallelism` half-open windows
    * along the datetime axis (the final window carries the caller's end
    * bound and inclusivity, so the union is EXACTLY the requested range).
    * Missing bounds resolve from the server's sync-time bookmarks; the axis
    * kind (timestamp vs integer epoch) comes from the cached schema DDL —
    * probing values would misread an epoch axis as seconds. Returns None
    * (caller falls back to one URL) for axis-less pipes, empty pipes,
    * non-splittable dtypes, or a collapsed range. */
  private def windowUrls(begin: Option[Any], end: Option[Any],
                         endInclusive: Boolean): Option[Seq[String]] = {
    import org.apache.spark.sql.types._
    val k = ApiStore.fetchParallelism
    if (k <= 1) return None
    val dt = dtCol.getOrElse(return None)
    val ddl = schemaDdl.getOrElse(return None)
    val field = StructType.fromDDL(ddl).fields.find(_.name == dt)
      .getOrElse(return None)
    def toMicros(v: Any): Option[Long] = v match {
      case d: LocalDateTime => Some(d.toEpochSecond(java.time.ZoneOffset.UTC)
        * 1000000L + d.getNano / 1000L)
      case t: java.sql.Timestamp => toMicros(t.toLocalDateTime)
      case n: Long => Some(n)
      case n: Int  => Some(n.toLong)
      case _       => None
    }
    val isTs = field.dataType match {
      case TimestampType | TimestampNTZType => true
      case LongType | IntegerType           => false
      case _                                => return None
    }
    def bookmark(newest: Boolean): Option[Any] = {
      val s = call("GET", u("sync_time", "newest" -> newest.toString,
        "epoch" -> (!isTs).toString))
      if (s.isEmpty) None
      else if (isTs) Some(LocalDateTime.parse(s)) else Some(s.toLong)
    }
    def fromMicros(us: Long): Any =
      if (isTs) LocalDateTime.ofEpochSecond(us / 1000000L,
        (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)
      else us
    val lo = toMicros(begin.orElse(bookmark(newest = false)).getOrElse(return None))
      .getOrElse(return None)
    val hiBound = end.orElse(bookmark(newest = true)).getOrElse(return None)
    val hi = toMicros(hiBound).getOrElse(return None)
    if (hi <= lo) return None // single-point or empty range: one URL is right
    // k boundaries, integer interpolation: lo = b0 < b1 < … < b_{k} where
    // the last window's end is the CALLER's bound (inclusive when the
    // caller's was, or when it came from the newest bookmark)
    val cuts = (1 until k).map(i => lo + (hi - lo) * i / k).distinct
      .filter(c => c > lo && c < hi)
    val bounds = (lo +: cuts) :+ hi
    val lastIncl = end.isEmpty || endInclusive
    Some(bounds.sliding(2).toSeq.zipWithIndex.map { case (Seq(a, b), i) =>
      val isLast = i == bounds.size - 2
      rangeUrl(Some(fromMicros(a)),
        if (isLast) Some(hiBound) else Some(fromMicros(b)),
        endInclusive = isLast && lastIncl)
    })
  }

  override def read: DataFrame = {
    if (!exists) throw new IllegalArgumentException(
      s"pipe $target does not exist")
    fetchDf(windowUrls(None, None, endInclusive = false)
      .getOrElse(Seq(u("data"))))
  }

  override def readRange(begin: Option[Any], end: Option[Any],
                         endInclusive: Boolean): DataFrame = {
    if (dtCol.isEmpty) {
      require(begin.isEmpty && end.isEmpty,
        s"pipe $target has no datetime axis; bounded reads are undefined")
      return read
    }
    if (!exists) throw new IllegalArgumentException(
      s"pipe $target does not exist")
    fetchDf(windowUrls(begin, end, endInclusive)
      .getOrElse(Seq(rangeUrl(begin, end, endInclusive))))
  }

  override def readIn(values: Seq[Any]): DataFrame = {
    val _ = dtCol.getOrElse(
      throw new IllegalArgumentException("readIn requires a datetime axis"))
    if (!exists) throw new IllegalArgumentException(
      s"pipe $target does not exist")
    if (values.isEmpty) return read.where(lit(false))
    val enc0 = values.map(encodeAny)
    val kinds = enc0.map(_._1).distinct
    require(kinds.size == 1, s"mixed value kinds in readIn: $kinds")
    fetchDf(Seq(u("in", "values" -> enc0.map(_._2).mkString(","), "kind" -> kinds.head)))
  }

  override def rowCount: Long = call("GET", u("count")).toLong

  // ── writes ─────────────────────────────────────────────────────────────

  /** Executor-parallel staged upload + one atomic commit (see class doc).
    *
    * Idempotent under task retry and speculation: every POST is keyed by
    * (partition, task-attempt, batch-seq) — a re-executed task stages under
    * a FRESH attempt id instead of appending to a shared file — and each
    * attempt seals itself with a `stage_done` marker carrying its batch
    * count. Commit then applies exactly ONE complete attempt per partition
    * (any complete attempt of a partition holds the same rowset), so a
    * retried or speculated task can never double its rows into the patch. */
  private def upload(df: DataFrame, mode: String,
                     extra: Seq[(String, String)] = Seq.empty): Unit = {
    val wid = java.util.UUID.randomUUID().toString
    stage(df, wid)
    call("POST", u("commit", (Seq("wid" -> wid, "mode" -> mode,
      "schema" -> df.schema.toDDL) ++ extra): _*))
    invalidateSchema()
  }

  /** Stage one DataFrame's rows under `wid` (no commit). */
  private def stage(df: DataFrame, wid: String): Unit = {
    val stageBase  = u("stage", "wid" -> wid)
    val doneBase   = u("stage_done", "wid" -> wid)
    val cols = df.columns
    // Cap upload streams: staging is network-bound, and every partition
    // costs two fixed-price POSTs plus a staged file the commit must list
    // and re-read — 32 shuffle partitions of a 10k-row patch were measured
    // SLOWER end-to-end than 8 coalesced streams (empty-partition POST
    // overhead, 4x the staged files). coalesce() narrows without a shuffle.
    val jsonDs = df
      .select(to_json(struct(cols.map(col).toIndexedSeq: _*), jsonOptsJava).as("j"))
      .select("j").as(Encoders.STRING)
    val streams = math.max(1,
      math.min(ApiStore.uploadParallelism, jsonDs.rdd.getNumPartitions))
    jsonDs.coalesce(streams)
      .foreachPartition { (it: Iterator[String]) =>
        val tc  = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val att = tc.taskAttemptId() // globally unique per attempt (zombies included)
        var n = 0
        it.grouped(10000).foreach { b =>
          HttpFetch.post(s"$stageBase&pid=$pid&att=$att&seq=$n", b.mkString("\n"))
          n += 1
        }
        // seal even when n=0 — commit must be able to tell "this attempt
        // completed with no rows" from "this attempt died mid-stage"
        HttpFetch.post(s"$doneBase&pid=$pid&att=$att&n=$n", "")
      }
  }

  override def create(df: DataFrame, cluster: Boolean): Unit =
    upload(df, "create")
  override def overwrite(df: DataFrame): Unit = upload(df, "overwrite")
  override def append(df: DataFrame): Unit = upload(df, "append")

  override def upsert(patch: DataFrame, keys: Seq[String],
                      knownChunks: Option[Seq[String]],
                      strayScan: StrayScan): Unit = {
    require(keys.nonEmpty, "upsert requires key columns")
    val strayQ = strayScan match {
      case StrayScan.Full => Seq("stray" -> "full")
      case StrayScan.Off  => Seq("stray" -> "off")
      case StrayScan.Bounded(lo, hi) =>
        val (lk, lv) = encodeAny(lo); val (hk, hv) = encodeAny(hi)
        Seq("stray" -> "bounded", "sLo" -> lv, "sLoK" -> lk,
            "sHi" -> hv, "sHiK" -> hk)
    }
    val kcQ = knownChunks.map(c => Seq("kc" -> c.mkString("\n"))).getOrElse(Seq.empty)
    upload(patch, "upsert", Seq("keys" -> keys.mkString(",")) ++ strayQ ++ kcQ)
  }

  /** Both diff halves staged under ONE commit, each under its OWN write
    * id: the server reads each half's ND-JSON exactly once. (The r10
    * design rode both halves in one staging tagged by a `__graft_upd`
    * column; the server then parsed the FULL patch once per half just to
    * filter it — for the typical blind-heavy diff, the small update half
    * paid a full-patch scan.) The two stagings run as ONE Spark job
    * (r11 verdict: two sequential staging jobs paid the local[32]
    * fixed job overhead twice per sync): the halves union client-side
    * with a one-bit tag, and each task routes its rows to the right
    * write id — the server-side per-wid layout is identical to two
    * separate stagings, so parse-once is preserved. */
  override def applyDelta(updates: DataFrame, inserts: DataFrame,
                          keys: Seq[String], knownChunks: Option[Seq[String]],
                          strayScan: StrayScan): Unit = {
    require(keys.nonEmpty, "applyDelta requires key columns")
    val strayQ = strayScan match {
      case StrayScan.Full => Seq("stray" -> "full")
      case StrayScan.Off  => Seq("stray" -> "off")
      case StrayScan.Bounded(lo, hi) =>
        val (lk, lv) = encodeAny(lo); val (hk, hv) = encodeAny(hi)
        Seq("stray" -> "bounded", "sLo" -> lv, "sLoK" -> lk,
            "sHi" -> hv, "sHiK" -> hk)
    }
    val kcQ = knownChunks.map(c => Seq("kc" -> c.mkString("\n"))).getOrElse(Seq.empty)
    val widU = java.util.UUID.randomUUID().toString
    val widI = java.util.UUID.randomUUID().toString
    stagePair(updates, widU, inserts, widI)
    call("POST", u("commit", (Seq("wid" -> widI, "widU" -> widU,
      "mode" -> "delta", "schema" -> inserts.schema.toDDL,
      "keys" -> keys.mkString(",")) ++ strayQ ++ kcQ): _*))
    invalidateSchema()
  }

  /** Stage two DataFrames under their own write ids in ONE Spark job.
    * Same idempotency contract as [[stage]]: batches key on (partition,
    * attempt, per-wid seq) and each attempt seals BOTH wids with its batch
    * counts, so commit still applies exactly one complete attempt per
    * partition per wid. Union partitions are side-homogeneous, but
    * coalesce may merge across the seam — tasks route per ROW on the tag,
    * which is correct either way. */
  private def stagePair(dfA: DataFrame, widA: String,
                        dfB: DataFrame, widB: String): Unit = {
    val stageA = u("stage", "wid" -> widA); val doneA = u("stage_done", "wid" -> widA)
    val stageB = u("stage", "wid" -> widB); val doneB = u("stage_done", "wid" -> widB)
    def js(df: DataFrame, tag: Int) = df
      .select(to_json(struct(df.columns.map(col).toIndexedSeq: _*), jsonOptsJava).as("j"),
        lit(tag).as("t"))
    val tagged = js(dfA, 0).unionByName(js(dfB, 1))
      .as(Encoders.tuple(Encoders.STRING, Encoders.scalaInt))
    val streams = math.max(1,
      math.min(ApiStore.uploadParallelism, tagged.rdd.getNumPartitions))
    tagged.coalesce(streams)
      .foreachPartition { (it: Iterator[(String, Int)]) =>
        val tc  = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val att = tc.taskAttemptId()
        val bufs = Array(new StringBuilder, new StringBuilder)
        val rows = Array(0, 0)
        val seqs = Array(0, 0)
        val bases = Array(stageA, stageB)
        def flush(t: Int): Unit = if (rows(t) > 0) {
          HttpFetch.post(s"${bases(t)}&pid=$pid&att=$att&seq=${seqs(t)}",
            bufs(t).result())
          bufs(t).clear(); rows(t) = 0; seqs(t) += 1
        }
        it.foreach { case (j, t) =>
          if (rows(t) > 0) bufs(t).append('\n')
          bufs(t).append(j); rows(t) += 1
          if (rows(t) == 10000) flush(t)
        }
        flush(0); flush(1)
        // seal even when empty — commit must be able to tell "this attempt
        // completed with no rows" from "this attempt died mid-stage"
        HttpFetch.post(s"$doneA&pid=$pid&att=$att&n=${seqs(0)}", "")
        HttpFetch.post(s"$doneB&pid=$pid&att=$att&n=${seqs(1)}", "")
      }
  }

  // ── deletion / maintenance ─────────────────────────────────────────────

  override def clear(predicate: Column, boundLo: Option[Any],
                     boundHi: Option[Any]): Unit = {
    // the predicate crosses the wire as its SQL form — the engine builds
    // clear predicates from params/bounds (literals + comparisons), which
    // round-trip through expr() exactly
    val sqlQ = Seq("sql" ->
      org.apache.spark.sql.GraftColumnBridge.expressionNow(predicate).sql)
    val loQ = boundLo.map(encodeAny).toSeq.flatMap { case (k, v) =>
      Seq("lo" -> v, "loK" -> k) }
    val hiQ = boundHi.map(encodeAny).toSeq.flatMap { case (k, v) =>
      Seq("hi" -> v, "hiK" -> k) }
    call("POST", u("clear", (sqlQ ++ loQ ++ hiQ): _*))
    invalidateSchema()
  }

  override def deduplicate(keys: Seq[String], orderBy: Seq[String]): Long = {
    require(keys.nonEmpty, "deduplicate requires key columns")
    val n = call("POST", u("dedup", "keys" -> keys.mkString(","),
      "orderBy" -> orderBy.mkString(","))).toLong
    invalidateSchema()
    n
  }

  override def drop(): Unit = { call("DELETE", u("drop")); invalidateSchema() }

  override def compact(): Unit = { call("POST", u("compact")); () }
  override def vacuum(): Unit = { call("POST", u("vacuum")); () }

  // ── sync bookkeeping ───────────────────────────────────────────────────

  override def syncTime(newest: Boolean): Option[LocalDateTime] =
    Some(call("GET", u("sync_time", "newest" -> newest.toString)))
      .filter(_.nonEmpty).map(LocalDateTime.parse)

  override def syncTimeEpoch(newest: Boolean): Option[Long] =
    Some(call("GET", u("sync_time", "newest" -> newest.toString,
      "epoch" -> "true"))).filter(_.nonEmpty).map(_.toLong)

  override def readMaxId: Option[Long] =
    Some(call("GET", u("maxid"))).filter(_.nonEmpty).map(_.toLong)

  override def writeMaxId(v: Long): Unit = {
    call("POST", u("maxid", "v" -> v.toString)); ()
  }

  /** Server-held TTL'd advisory lease — the HTTP form of the parquet
    * store's lock file. Re-entrant per (thread, server, root, target);
    * contention past the acquire timeout fails loudly, and a broken lease
    * (server forgot us past the TTL) warns on release like the parquet
    * backend. */
  override def withWriteLease[A](body: => A): A = {
    val key = s"$baseUrl|$root|$target"
    val held = ApiStore.heldLeases.get()
    if (held.contains(key)) return body
    val token = java.util.UUID.randomUUID().toString
    val acquireUrl = u("lock", "op" -> "acquire", "token" -> token,
      "ttlMs" -> PipeStorage.leaseStaleMs.toString)
    val deadline = System.currentTimeMillis() + PipeStorage.leaseAcquireTimeoutMs
    var acquired = false
    while (!acquired) {
      val (code, _) = request("POST", acquireUrl)
      if (code == 200) acquired = true
      else if (code == 409) {
        if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"could not acquire writer lease on $target within " +
            s"${PipeStorage.leaseAcquireTimeoutMs}ms — a concurrent writer holds it")
        Thread.sleep(25)
      } else throw new java.io.IOException(s"lease acquire -> HTTP $code")
    }
    held += key
    // HEARTBEAT: the server lock is a hard TTL — a leased operation longer
    // than leaseStaleMs would silently lose mutual exclusion mid-write
    // without renewal (the parquet backend heartbeats for the same reason).
    // A failed renew means the lease is gone; stop beating (release warns).
    val renewUrl = u("lock", "op" -> "renew", "token" -> token,
      "ttlMs" -> PipeStorage.leaseStaleMs.toString)
    val beatBroken = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = PipeStorage.leaseScheduler.scheduleAtFixedRate(
      () => try {
        if (!beatBroken.get() && request("POST", renewUrl)._1 != 200)
          beatBroken.set(true)
      } catch { case _: Exception => () },
      PipeStorage.leaseStaleMs / 3, PipeStorage.leaseStaleMs / 3,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    try body
    finally {
      held -= key
      beat.cancel(false)
      val (code, _) = request("POST",
        u("lock", "op" -> "release", "token" -> token))
      if (code == 410) System.err.println(
        s"[graft] WARNING: writer lease on $target was broken while held — " +
        "a concurrent writer may have interleaved")
    }
  }
}

object ApiStore {

  /** Store factory for [[graft.sync.SyncEngine]] — point the engine at a
    * running [[graft.server.PipeServer]] and every pipe under the engine's
    * root lives on that instance. */
  def factory(baseUrl: String): (SparkSession, String, PipeSpec) => InstanceStore =
    (s, root, spec) => new ApiStore(s, baseUrl, root, spec)

  private val heldLeases = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  /** Spec registration is idempotent server-side; cache by value so the
    * common handle-per-op pattern costs one POST per distinct spec. */
  /** Windows per ranged read (and executor tasks per fetch). DEFAULT OFF
    * (1): engine-issued reads on this path are patch-scale by construction
    * (class doc), and splitting a 10k-row read into 8 ranged requests was
    * measured ~40% SLOWER against the in-process server — per-request
    * planning dominates. Raise it for BULK reads against a remote server
    * fleet, where per-stream bandwidth is the bottleneck instead. */
  @volatile private[graft] var fetchParallelism: Int = 1

  /** Concurrent staged-upload streams per patch (executor-side POSTs). */
  @volatile private[graft] var uploadParallelism: Int = 8

  private val registered =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), PipeSpec]

  /** Process-wide schema-DDL cache (see instance doc on [[ApiStore.schemaDdl]]).
    * Value None = server answered 404 (pipe has no schema yet). */
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Option[String]]
  private def ensureRegistered(spark: SparkSession, baseUrl: String,
                               root: String, spec: PipeSpec): Unit = {
    val key = (baseUrl, root, spec.targetName)
    if (!registered.get(key).contains(spec)) {
      val json = PipeServer.specToJson(spark, spec)
      val url = s"$baseUrl/pipes/register?root=${enc(root)}"
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(json)).build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200) throw new java.io.IOException(
        s"register $url -> HTTP ${resp.statusCode()}: ${resp.body()}")
      registered.put(key, spec)
      ()
    }
  }

  private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  /** Raw request: (status, body). */
  private def request(method: String, url: String): (Int, String) = {
    val t0 = System.nanoTime()
    try requestInner(method, url)
    finally if (sys.env.contains("GRAFT_API_TRACE"))
      println(f"[api] ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $method ${url.takeWhile(_ != '?')} ${url.dropWhile(_ != '?').take(60)}")
  }
  private def requestInner(method: String, url: String): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val req = method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case "POST"   => b.POST(HttpRequest.BodyPublishers.noBody())
      case m        => throw new IllegalArgumentException(m)
    }
    val resp = client.send(req.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** Request + server-exception mapping (class doc). */
  private def call(method: String, url: String): String = {
    val (code, body) = request(method, url)
    if (code / 100 == 2) body
    else if (code == 500) {
      val i = body.indexOf(": ")
      val (cls, msg) =
        if (i >= 0) (body.take(i), body.drop(i + 2)) else ("", body)
      cls match {
        case "java.lang.IllegalArgumentException" =>
          throw new IllegalArgumentException(msg)
        case "java.lang.IllegalStateException" =>
          throw new IllegalStateException(msg)
        case _ => throw new java.io.IOException(s"$method $url -> $body")
      }
    } else throw new java.io.IOException(s"$method $url -> HTTP $code: $body")
  }
}
