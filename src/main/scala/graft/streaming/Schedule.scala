package graft.streaming

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.streaming.Trigger

/** The reference's human schedule DSL
  * (meerschaum/utils/schedule.py:18-270; golden next-fire times in
  * tests/utils/test_schedule.py):
  *
  *   - interval forms: `every N second|minute|hour|day|week|month|year s`
  *   - aliases: secondly/minutely/hourly/daily/weekly/monthly/yearly
  *   - anchor: `... starting 2024-05-01[ 01:23:34]` / `starting May 1, 2024`
  *   - combining: `A & B` (fire when ALL coincide), `A | B` (union);
  *     `and`/`or` aliases
  *   - 5-field crontab parts (`* * * * *`, ranges, steps, lists) and bare
  *     day-of-week subsets (`mon-fri` → hourly at the anchor minute)
  *
  * [[nextFires]] is the pure next-fire computation (what an external
  * scheduler consumes — Spark has no calendar trigger); [[toTrigger]] maps
  * interval forms onto `Trigger.ProcessingTime` for Structured Streaming.
  */
object Schedule {

  private val Aliases = Map(
    "secondly" -> "every 1 second", "minutely" -> "every 1 minute",
    "hourly" -> "every 1 hour", "daily" -> "every 1 day",
    "weekly" -> "every 1 week", "monthly" -> "every 1 month",
    "yearly" -> "every 1 year")

  private val Dows = Seq("mon", "tue", "wed", "thu", "fri", "sat", "sun")

  /** One schedule part = a (possibly infinite) ascending stream of fire
    * times from an anchor. */
  private sealed trait Part { def fires(start: LocalDateTime): Iterator[LocalDateTime] }

  private final case class Every(n: Long, unit: String) extends Part {
    def fires(start: LocalDateTime): Iterator[LocalDateTime] =
      Iterator.iterate(start)(t => unit match {
        case "second" => t.plusSeconds(n)
        case "minute" => t.plusMinutes(n)
        case "hour"   => t.plusHours(n)
        case "day"    => t.plusDays(n)
        case "week"   => t.plusWeeks(n)
        case "month"  => t.plusMonths(n)
        case "year"   => t.plusYears(n)
      })
  }

  /** 5-field crontab: minute hour day-of-month month day-of-week. */
  private final case class Cron(minute: Set[Int], hour: Set[Int], dom: Set[Int],
                                month: Set[Int], dow: Set[Int]) extends Part {
    def matches(t: LocalDateTime): Boolean =
      minute(t.getMinute) && hour(t.getHour) && dom(t.getDayOfMonth) &&
        month(t.getMonthValue) && dow(t.getDayOfWeek.getValue % 7) // cron: sun=0
    // BOUNDED scan: an impossible calendar spec ("0 0 31 2 *") would
    // otherwise spin the minute iterator forever. Six years of minutes
    // covers every leap-year combination a real spec can need.
    def fires(start: LocalDateTime): Iterator[LocalDateTime] = new Iterator[LocalDateTime] {
      private var t = {
        var x = start.withSecond(0).withNano(0)
        if (x.isBefore(start)) x = x.plusMinutes(1)
        x
      }
      override def hasNext: Boolean = true
      override def next(): LocalDateTime = {
        var scanned = 0
        while (!matches(t)) {
          t = t.plusMinutes(1); scanned += 1
          if (scanned > 6 * 366 * 1440) throw new IllegalArgumentException(
            "cron spec never fires (no match within 6 years)")
        }
        val r = t; t = t.plusMinutes(1); r
      }
    }
  }

  private def cronField(s: String, lo: Int, hi: Int,
                        names: Map[String, Int] = Map.empty): Set[Int] = {
    // full names resolve via their 3-letter prefix ("tuesday" → "tue",
    // "january" → "jan"); unresolvable tokens fail with schedule context
    // instead of a bare NumberFormatException
    def resolve(tok: String): Int =
      names.getOrElse(tok, names.getOrElse(tok.take(3),
        try tok.toInt catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(s"unparseable cron token: '$tok'") }))
    def one(tok: String): Seq[Int] = {
      val (body, step) = tok.split("/") match {
        case Array(b)    => (b, 1)
        case Array(b, s) => (b, s.toInt)
      }
      val vals: Seq[Int] = body match {
        case "*" => lo to hi
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-")
          val (x, y) = (resolve(a.toLowerCase), resolve(b.toLowerCase))
          // wrapped ranges are valid cron ("fri-sun" = fri,sat,sun)
          if (x <= y) x to y else (x to hi) ++ (lo to y)
        case v => { val x = resolve(v.toLowerCase); Seq(x) }
      }
      // step applies to the SEQUENCE (wrapped ranges included)
      vals.zipWithIndex.collect { case (v, i) if i % step == 0 => v }
    }
    val set = s.split(",").toSeq.flatMap(one).toSet
    require(set.nonEmpty && set.forall(v => v >= lo && v <= hi),
      s"cron field '$s' out of range [$lo,$hi]")
    set
  }

  private val dowNames = Dows.zipWithIndex.map { case (d, i) => d -> ((i + 1) % 7) }.toMap
  private val monNames = Seq("jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec").zipWithIndex.map { case (m, i) => m -> (i + 1) }.toMap

  private def parsePart(s: String, anchor: LocalDateTime): Part = {
    val t = s.trim.toLowerCase
    val every = """every\s+(\d+)\s*([a-z]+?)s?$""".r
    t match {
      case every(n, unit) if Set("second", "minute", "hour", "day", "week", "month", "year")(unit) =>
        Every(n.toLong, unit)
      case cron if cron.split("\\s+").length == 5 =>
        val f = cron.split("\\s+")
        // dow accepts 0-7 (standard cron: both 0 and 7 are Sunday)
        Cron(cronField(f(0), 0, 59), cronField(f(1), 0, 23), cronField(f(2), 1, 31),
          cronField(f(3), 1, 12, monNames), cronField(f(4), 0, 7, dowNames).map(_ % 7))
      case dowish if Dows.exists(dowish.startsWith) =>
        // bare day-of-week subset: hourly at the anchor minute on those days
        // (reference: cron_kw day_of_week + hour '*' + minute start.minute)
        Cron(Set(anchor.getMinute), (0 to 23).toSet, (1 to 31).toSet,
          (1 to 12).toSet, cronField(dowish, 0, 7, dowNames).map(_ % 7))
      case other => throw new IllegalArgumentException(s"unparseable schedule part: '$other'")
    }
  }

  private def parseStart(s: String, default: LocalDateTime): LocalDateTime = {
    val t = s.trim
    if (t.isEmpty) return default
    val attempts: Seq[() => LocalDateTime] = Seq(
      () => LocalDateTime.parse(t, DateTimeFormatter.ISO_LOCAL_DATE_TIME),
      () => LocalDateTime.parse(t, DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")),
      () => java.time.LocalDate.parse(t, DateTimeFormatter.ofPattern("yyyy-MM-dd")).atStartOfDay(),
      () => java.time.LocalDate.parse(t,
        new java.time.format.DateTimeFormatterBuilder().parseCaseInsensitive()
          .appendPattern("MMMM d, yyyy").toFormatter(java.util.Locale.ENGLISH))
        .atStartOfDay())
    attempts.view.flatMap(f => try Some(f()) catch { case _: Exception => None })
      .headOption.getOrElse(
        throw new IllegalArgumentException(s"unparseable 'starting' time: '$s'"))
  }

  private def normalize(s: String): String =
    Aliases.foldLeft(s.toLowerCase.trim) { case (acc, (k, v)) => acc.replace(k, v) }
      .replace(" and ", " & ").replace(" or ", " | ")

  /** First `n` fire times of `schedule` at or after its anchor (`starting`
    * clause, else `from`). */
  def nextFires(schedule: String, from: LocalDateTime, n: Int): Seq[LocalDateTime] =
    fireIterator(schedule, from).take(n).toSeq

  /** Lazy merged fire stream (see [[nextFires]] for anchor semantics). */
  private def fireIterator(schedule: String, from: LocalDateTime): Iterator[LocalDateTime] = {
    // split the ORIGINAL string: lowercasing first would break the
    // case-sensitive 'T' of an ISO 'starting 2024-05-01T06:00:00' anchor
    val idx = schedule.toLowerCase.indexOf("starting")
    val (freqRaw, startRaw) =
      if (idx < 0) (schedule.trim, "")
      else (schedule.substring(0, idx).trim,
            schedule.substring(idx + "starting".length).trim)
    val anchor0 = parseStart(startRaw, from)
    val norm = normalize(freqRaw.toLowerCase)
    require(!(norm.contains("&") && norm.contains("|")),
      "cannot combine '&' and '|' logic in one schedule")
    val (parts, union) =
      if (norm.contains("|")) (norm.split("\\|").toSeq, true)
      else (norm.split("&").toSeq, false)
    val parsed = parts.map(p => parsePart(p, anchor0))
    // an '&' combination with a cron part intersects at MINUTE resolution:
    // cron candidates are second-truncated, so interval streams must align
    // to the same grid or exact-equality intersection never meets
    val anchor =
      if (!union && parsed.size > 1 && parsed.exists(_.isInstanceOf[Cron]))
        anchor0.withSecond(0).withNano(0)
      else anchor0
    val streams = parsed.map(_.fires(anchor))
    if (streams.size == 1) streams.head
    else if (union) mergeUnionIt(streams)
    else mergeIntersectIt(streams)
  }

  /** First fire STRICTLY after `after` — the job-loop form of
    * [[nextFires]]. The anchor (`starting` clause, else `after`) stays
    * fixed while the scan skips forward, so an interval schedule advances
    * to its next grid point instead of re-yielding the anchor (which is
    * what [[nextFires]]'s at-or-after contract does, by design, for golden
    * next-fire dumps). A schedule whose parts never coincide still fails
    * loudly via the intersect scan guard. */
  def nextFireAfter(schedule: String, after: LocalDateTime): Option[LocalDateTime] = {
    val it = fireIterator(schedule, after).dropWhile(!_.isAfter(after))
    if (it.hasNext) Some(it.next()) else None
  }

  private def mergeUnionIt(streams: Seq[Iterator[LocalDateTime]]): Iterator[LocalDateTime] =
    new Iterator[LocalDateTime] {
      private val bufs = streams.map(_.buffered)
      override def hasNext: Boolean = true
      override def next(): LocalDateTime = {
        val t = bufs.map(_.head).min
        bufs.foreach { b => while (b.head == t) b.next() }
        t
      }
    }

  private def mergeIntersectIt(streams: Seq[Iterator[LocalDateTime]]): Iterator[LocalDateTime] =
    new Iterator[LocalDateTime] {
      private val bufs = streams.map(_.buffered)
      private var pending: Option[LocalDateTime] = None
      private def advance(): Unit = {
        var guard = 0
        while (pending.isEmpty && guard < 10_000_000) {
          val max = bufs.map(_.head).max
          bufs.foreach { b => while (b.head.isBefore(max)) { b.next(); () } }
          if (bufs.forall(_.head == max)) {
            pending = Some(max)
            bufs.foreach(_.next())
          }
          guard += 1
        }
        if (pending.isEmpty) throw new IllegalArgumentException(
          "schedule parts never coincide within the scan horizon")
      }
      override def hasNext: Boolean = { if (pending.isEmpty) advance(); true }
      override def next(): LocalDateTime = {
        if (pending.isEmpty) advance()
        val v = pending.get; pending = None; v
      }
    }

  /** Map interval forms to a Structured Streaming trigger; `once`/`now` →
    * AvailableNow. Calendar forms (cron, month/year intervals) have no Spark
    * trigger — drive those with [[nextFires]] from an external scheduler. */
  def toTrigger(schedule: String): Trigger = {
    val norm = normalize(schedule.toLowerCase.split("starting", 2)(0))
    norm.trim match {
      case "once" | "available now" | "now" => Trigger.AvailableNow()
      case s =>
        parsePart(s, LocalDateTime.MIN) match {
          case Every(n, unit) if Set("second", "minute", "hour")(unit) =>
            Trigger.ProcessingTime(s"$n ${unit}s")
          case Every(n, "day")  => Trigger.ProcessingTime(s"${n * 24} hours")
          case Every(n, "week") => Trigger.ProcessingTime(s"${n * 7 * 24} hours")
          case _ => throw new IllegalArgumentException(
            s"no fixed-interval trigger for '$schedule'; use nextFires with an external scheduler")
        }
    }
  }
}
