package graft.storage

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.PipeSpec
import graft.kv.RespConn
import graft.server.PipeServer.{jsonOpts, jsonOptsJava}

/** Valkey-backed [[InstanceStore]] — the engine's KV instance connector
  * (the reference's `ValkeyConnector`, `connectors/valkey/_pipes.py:37-139`
  * + `_ValkeyConnector.py:215-289`, which implements the same instance
  * interface as SQLConnector over a Valkey server). Layout mirrors the
  * reference's `push_docs`: each row is one canonical-JSON document stored
  * as a sorted-set member, scored by its datetime-axis value; table
  * metadata (schema DDL, datetime column, autoincrement high-water) lives
  * in sibling string keys.
  *
  * Deliberate deviations from the reference's mechanism, same semantics:
  *   - scores are axis-EXACT (epoch microseconds for timestamp axes, axis
  *     units for integer-epoch axes) rather than the reference's
  *     second-granular `int(timestamp)` — IEEE doubles are exact to 2^53,
  *     so score ranges ARE the engine's bounded reads and no client-side
  *     re-filter pass is needed for correctness (one is still applied as
  *     cheap belt-and-braces);
  *   - mutations compute Spark-side and apply KV-side: reads carry each
  *     row's raw member string alongside its parsed columns, so upsert/
  *     clear/deduplicate ZREM exactly the members they read — no
  *     re-serialization round-trip that would have to be byte-identical.
  *
  * Scale shape: reads slice the zset by rank ranges (`LIMIT offset count`)
  * across executor tasks, each opening its own connection — the
  * partitioned-JDBC pattern; writes pipeline ZADD batches per partition.
  * Row volume is bounded by the KV server itself, exactly as in the
  * reference deployment: Valkey instances hold metadata/cache-scale pipes
  * (the reference docs position it the same way), while bulk analytical
  * data belongs on the parquet backend.
  *
  * Set semantics (reference parity): members are canonical row JSON, so
  * two FULLY identical rows collapse into one — the reference's
  * `zadd`/`sadd` document model behaves identically
  * (`_ValkeyConnector.py:270-279`). Rows differing in any column coexist.
  */
final class ValkeyStore(spark: SparkSession, host: String, port: Int,
                        root: String, val spec: PipeSpec) extends InstanceStore {

  import ValkeyStore._

  private def target = spec.targetName
  private def dtCol: Option[String] = spec.columns.datetime

  /** Root-scoped key prefix (the reference quotes the pipe target as the
    * table key; the root keeps two engines on one server disjoint). */
  private val p = s"graft:$root:$target"
  private val kDocs = s"$p:docs"
  private val kSchema = s"$p:schema"
  private val kDtCol = s"$p:dtcol"
  private val kMaxId = s"$p:maxid"
  private val kLease = s"$p:lease"

  private def withConn[A](f: RespConn => A): A = RespConn.withConn(host, port)(f)

  // ── schema ─────────────────────────────────────────────────────────────

  private def storedSchema: Option[StructType] =
    withConn(_.bulk("GET", kSchema)).map(StructType.fromDDL)

  /** Axis kind: integer-epoch axes score by raw value, timestamp axes by
    * epoch microseconds (UTC session — the engine-wide convention). */
  private def isEpochAxis(schema: StructType): Boolean =
    dtCol.exists(c => schema.fields.find(_.name == c)
      .exists(_.dataType.isInstanceOf[NumericType]))

  /** Rows with a NULL axis value sort below every real score (the KV
    * analogue of the parquet backend's null chunk): -1e18 is exactly
    * representable and far outside the epoch-µs range of real data. */
  private val NullScoreLong = -1000000000000000000L

  /** Axis score as an exact integer string (ZADD's score argument):
    * epoch-µs for timestamp axes, raw axis units for integer-epoch axes. */
  private def scoreCol(df: DataFrame): Column = dtCol match {
    case None => lit("0")
    case Some(c) =>
      val n = if (isEpochAxis(df.schema)) col(c).cast("long")
              else graft.dsl.RoundTime.epochMicros(col(c))
      coalesce(n, lit(NullScoreLong)).cast("string")
  }

  /** Same score, numeric (for driver-side min/max bounds aggregation). */
  private def scoreNum(df: DataFrame): Column = dtCol match {
    case None => lit(0.0)
    case Some(c) =>
      val n = if (isEpochAxis(df.schema)) col(c).cast("long")
              else graft.dsl.RoundTime.epochMicros(col(c))
      coalesce(n, lit(NullScoreLong)).cast("double")
  }

  private def scoreOf(v: Any): Double = v match {
    case d: LocalDateTime      => (d.toEpochSecond(ZoneOffset.UTC) * 1000000L +
                                   d.getNano / 1000).toDouble
    case t: java.sql.Timestamp => scoreOf(t.toLocalDateTime)
    case n: Long               => n.toDouble
    case n: Int                => n.toDouble
    case n: Double             => n
    case other => throw new IllegalArgumentException(
      s"unsupported bound type: ${other.getClass.getName}")
  }

  private def fmtScore(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e17) d.toLong.toString
    else d.toString

  // ── reads ──────────────────────────────────────────────────────────────

  override def exists: Boolean = withConn(_.num("EXISTS", kSchema)) == 1L

  /** Stored-key schema — `read` here is an eager full-set fetch, so the
    * trait default would materialize the whole table to answer a DDL. */
  override def schemaDdl: Option[String] = storedSchema.map(_.toDDL)

  /** Rank-sliced executor-parallel fetch of (member, score) rows in a
    * score range. Eagerly checkpointed for the same snapshot semantics as
    * the other backends (a lazy KV scan could observe its own sync's
    * mutation mid-plan). */
  private def rawRead(min: String, max: String): DataFrame = {
    val n = withConn(_.num("ZCOUNT", kDocs, min, max))
    val slices = ValkeyStore.rankSlices(n, batch = 10000L,
      parallelism = spark.sparkContext.defaultParallelism)
    val parts = slices.length
    val (h, pt, key) = (host, port, kDocs)
    import spark.implicits._
    spark.createDataset(slices).repartition(parts)
      .mapPartitions { it =>
        it.flatMap { case (off, cnt) =>
          RespConn.withConn(h, pt) { c =>
            c.arr("ZRANGEBYSCORE", key, min, max,
              "LIMIT", off.toString, cnt.toString)
          }
        }
      }(Encoders.STRING)
      .toDF(MemberCol)
      .localCheckpoint(true)
  }

  private def parsed(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(col(MemberCol),
        from_json(col(MemberCol), schema, jsonOptsJava).as("r"))
      .select(col(MemberCol) +: schema.fieldNames.toIndexedSeq.map(f => col(s"r.`$f`")): _*)

  private def readWithMembers(min: String = "-inf", max: String = "+inf"): DataFrame = {
    val schema = storedSchema.getOrElse(
      throw new IllegalArgumentException(s"pipe $target does not exist"))
    parsed(rawRead(min, max), schema)
  }

  override def read: DataFrame = readWithMembers().drop(MemberCol)

  override def readRange(begin: Option[Any], end: Option[Any],
                         endInclusive: Boolean): DataFrame = {
    val dt = dtCol.getOrElse {
      require(begin.isEmpty && end.isEmpty,
        s"pipe $target has no datetime axis; bounded reads are undefined")
      return read
    }
    val min = begin.map(b => fmtScore(scoreOf(b))).getOrElse("-inf")
    val max = end.map { e =>
      val s = fmtScore(scoreOf(e)); if (endInclusive) s else s"($s"
    }.getOrElse("+inf")
    // scores are axis-exact, so the range IS the filter; the Column
    // re-check below is belt-and-braces (and keeps plans self-describing)
    var df = readWithMembers(min, max).drop(MemberCol)
    begin.foreach(b => df = df.where(col(dt) >= lit(b)))
    end.foreach(e => df = df.where(if (endInclusive) col(dt) <= lit(e)
                                   else col(dt) < lit(e)))
    df
  }

  override def readIn(values: Seq[Any]): DataFrame = {
    val dt = dtCol.getOrElse(
      throw new IllegalArgumentException("readIn requires a datetime axis"))
    if (values.isEmpty) return read.where(lit(false))
    val scores = values.map(scoreOf)
    readWithMembers(fmtScore(scores.min), fmtScore(scores.max))
      .drop(MemberCol).where(col(dt).isin(values: _*))
  }

  override def rowCount: Long = withConn(_.num("ZCARD", kDocs))

  // ── writes ─────────────────────────────────────────────────────────────

  /** Serialize rows in stored-schema column order and pipeline ZADD
    * batches per partition. Caller holds the lease. */
  private def push(df: DataFrame, schema: StructType): Unit = {
    val cols = schema.fieldNames.toIndexedSeq
    val withNulls = cols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(schema(c).dataType))
    }
    val rows = withNulls
      .select(to_json(struct(cols.map(c => col(s"`$c`")): _*), jsonOptsJava).as("doc"),
              scoreCol(withNulls).as("score"))
    val (h, pt, key) = (host, port, kDocs)
    rows.select(col("score"), col("doc")).as(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .foreachPartition { (it: Iterator[(String, String)]) =>
        RespConn.withConn(h, pt) { c =>
          it.grouped(500).foreach { b =>
            val cmd = Seq("ZADD", key) ++ b.flatMap { case (s, d) => Seq(s, d) }
            c.command(cmd: _*); ()
          }
        }
      }
  }

  /** Merge new columns into the stored schema (evolution: old docs parse
    * with nulls for added fields, exactly like the parquet backend's
    * add-column path). */
  private def mergedSchema(df: DataFrame): StructType = {
    val base = storedSchema.getOrElse(StructType(Nil))
    val extra = df.schema.fields.filterNot(f => base.fieldNames.contains(f.name))
    StructType(base.fields ++ extra)
  }

  override def create(df: DataFrame, cluster: Boolean): Unit = withWriteLease {
    // maxid survives an overwrite (MemoryStore/parquet parity: the
    // autoincrement high-water is pipe state, not data state)
    withConn { c => c.command("DEL", kDocs, kSchema, kDtCol); () }
    writeMeta(df.schema)
    push(df, df.schema)
  }

  override def overwrite(df: DataFrame): Unit = create(df, cluster = true)

  override def append(df: DataFrame): Unit = withWriteLease {
    if (!exists) { create(df, cluster = true); return }
    val schema = mergedSchema(df)
    writeMeta(schema)
    push(df, schema)
  }

  private def writeMeta(schema: StructType): Unit = withConn { c =>
    c.command("SET", kSchema, schema.toDDL)
    dtCol.foreach(d => c.command("SET", kDtCol, d))
    ()
  }

  override def upsert(patch: DataFrame, keys: Seq[String],
                      knownChunks: Option[Seq[String]],
                      strayScan: StrayScan): Unit = withWriteLease {
    require(keys.nonEmpty, "upsert requires key columns")
    if (!exists) { create(patch); return }
    val schema = mergedSchema(patch)
    // candidate existing rows: when the keys pin the axis, only the
    // patch's score range can hold replaced rows (the KV analogue of
    // chunk pruning); otherwise scan the set (StrayScan semantics —
    // a keyed row may have moved axis value)
    val bounded = dtCol.exists(keys.contains)
    val existing =
      if (bounded) {
        val b = patch.agg(min(scoreNum(patch)), max(scoreNum(patch))).head()
        if (b.isNullAt(0)) return
        parsed(rawRead(fmtScore(b.getDouble(0)), fmtScore(b.getDouble(1))), schema)
      } else readWithMembers()
    val pk = patch.select(keys.map(col): _*).distinct()
    val cond = keys.map { k =>
      if (spec.nullIndices) existing(k) <=> pk(k) else existing(k) === pk(k)
    }.reduce(_ && _)
    val victims = existing.join(pk, cond, "left_semi").select(MemberCol)
    zremMembers(victims)
    writeMeta(schema)
    push(patch, schema)
  }

  private def zremMembers(members: DataFrame): Long = {
    val (h, pt, key) = (host, port, kDocs)
    members.as(Encoders.STRING).mapPartitions { it =>
      Iterator.single(if (it.isEmpty) 0L else RespConn.withConn(h, pt) { c =>
        it.grouped(500).map(b => c.num((Seq("ZREM", key) ++ b): _*)).sum
      })
    }(Encoders.scalaLong).collect().sum
  }

  // ── deletion / maintenance ─────────────────────────────────────────────

  override def clear(predicate: Column, boundLo: Option[Any],
                     boundHi: Option[Any]): Unit = withWriteLease {
    if (!exists) return
    val min = boundLo.map(v => fmtScore(scoreOf(v))).getOrElse("-inf")
    val max = boundHi.map(v => fmtScore(scoreOf(v))).getOrElse("+inf")
    // SQL DELETE three-valued logic: only predicate = TRUE rows go
    val victims = readWithMembers(min, max)
      .where(predicate <=> lit(true)).select(MemberCol)
    zremMembers(victims); ()
  }

  override def deduplicate(keys: Seq[String], orderBy: Seq[String]): Long =
    withWriteLease {
      require(keys.nonEmpty, "deduplicate requires key columns")
      if (!exists) return 0L
      val order = if (orderBy.nonEmpty) orderBy else keys
      val all = readWithMembers()
      // keep-latest per key (orderBy desc, member as a deterministic
      // final tiebreak), drop the rest — same ranking as ops.Dedup
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
        .orderBy(order.map(col(_).desc) :+ col(MemberCol).desc: _*)
      val losers = all.withColumn("__rn", row_number().over(w))
        .where(col("__rn") > 1).select(MemberCol)
      zremMembers(losers)
    }

  override def drop(): Unit = withWriteLease {
    withConn(_.command("DEL", kDocs, kSchema, kDtCol, kMaxId)); ()
  }

  // ── sync bookkeeping ───────────────────────────────────────────────────

  /** Scores are axis-exact, so the newest/oldest axis value IS the edge
    * member's score — one O(log n) probe, no document parse. */
  private def edgeScore(newest: Boolean): Option[Double] = {
    val rep =
      if (newest) withConn(_.arr("ZRANGE", kDocs, "0", "0", "REV", "WITHSCORES"))
      else // oldest REAL axis value: skip the null-score band
        withConn(_.arr("ZRANGEBYSCORE", kDocs, s"($NullScoreLong", "+inf",
          "WITHSCORES", "LIMIT", "0", "1"))
    rep.grouped(2).collectFirst { case Seq(_, s) => s.toDouble }
      .filter(_ != NullScoreLong.toDouble)
  }

  override def syncTime(newest: Boolean): Option[LocalDateTime] = {
    if (!exists || dtCol.isEmpty) return None
    if (storedSchema.exists(isEpochAxis)) return None
    edgeScore(newest).map { micros =>
      val m = micros.toLong
      LocalDateTime.ofEpochSecond(Math.floorDiv(m, 1000000L),
        (Math.floorMod(m, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    }
  }

  override def syncTimeEpoch(newest: Boolean): Option[Long] = {
    if (!exists || dtCol.isEmpty) return None
    edgeScore(newest).map(_.toLong)
  }

  override def readMaxId: Option[Long] =
    withConn(_.bulk("GET", kMaxId)).map(_.toLong)

  override def writeMaxId(v: Long): Unit = {
    withConn(_.command("SET", kMaxId, v.toString)); ()
  }

  /** Server-held TTL'd lease — `SET NX PX` with token-checked release, the
    * KV form of the parquet lock file. Re-entrant per (thread, server,
    * root, target); contention past the acquire timeout fails loudly. */
  override def withWriteLease[A](body: => A): A = {
    val leaseKey = s"$host:$port|$p"
    val held = ValkeyStore.heldLeases.get()
    if (held.contains(leaseKey)) return body
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + PipeStorage.leaseAcquireTimeoutMs
    withConn { c =>
      var acquired = false
      while (!acquired) {
        val r = c.command("SET", kLease, token, "NX", "PX",
          PipeStorage.leaseStaleMs.toString)
        r match {
          case graft.kv.Resp.Simple("OK") => acquired = true
          case _ =>
            if (System.currentTimeMillis() > deadline)
              throw new IllegalStateException(
                s"could not acquire writer lease on $target within " +
                s"${PipeStorage.leaseAcquireTimeoutMs}ms — a concurrent writer holds it")
            Thread.sleep(25)
        }
      }
    }
    held += leaseKey
    // HEARTBEAT: SET PX is a hard TTL — a leased operation longer than
    // leaseStaleMs (a big dedup/upsert) would silently lose mutual
    // exclusion mid-write without renewal. Extend only while the key still
    // holds OUR token; once broken, stop for good (release warns).
    val beatBroken = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = PipeStorage.leaseScheduler.scheduleAtFixedRate(
      () => try {
        if (!beatBroken.get()) withConn { c =>
          if (c.bulk("GET", kLease).contains(token)) {
            c.command("PEXPIRE", kLease, PipeStorage.leaseStaleMs.toString); ()
          } else beatBroken.set(true)
        }
      } catch { case _: Exception => () },
      PipeStorage.leaseStaleMs / 3, PipeStorage.leaseStaleMs / 3,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    try body
    finally {
      held -= leaseKey
      beat.cancel(false)
      withConn { c =>
        if (c.bulk("GET", kLease).contains(token)) { c.command("DEL", kLease); () }
        else System.err.println(
          s"[graft] WARNING: writer lease on $target was broken while held — " +
          "a concurrent writer may have interleaved")
      }
    }
  }
}

object ValkeyStore {
  /** Raw-member column carried through mutation-path reads. */
  private[storage] val MemberCol = "__vk_member"

  /** Rank-slice plan for an executor-parallel ZRANGEBYSCORE read of `n`
    * members: at most `parallelism` disjoint (offset, count) LIMIT windows
    * covering ranks [0, n) — one RESP connection per task, never one
    * driver-side pull. Exposed for the plan-shape spec. */
  private[graft] def rankSlices(n: Long, batch: Long, parallelism: Int): Seq[(Long, Long)] = {
    val parts = math.max(1L, math.min((n + batch - 1) / batch,
      parallelism.toLong)).toInt
    val per = (n + parts - 1) / parts
    (0 until parts).map(i => (i.toLong * per, per))
  }

  private val heldLeases = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  /** Store factory for [[graft.sync.SyncEngine]] — point the engine at a
    * Valkey server and every pipe under the engine's root lives there. */
  def factory(host: String, port: Int): (SparkSession, String, PipeSpec) => InstanceStore =
    (s, root, spec) => new ValkeyStore(s, host, port, root, spec)
}
