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
    def fires(start: LocalDateTime): Iterator[LocalDateTime] =
      Iterator.iterate(start.withSecond(0).withNano(0))(_.plusMinutes(1))
        .filter(t => !t.isBefore(start) && matches(t))
  }

  private def cronField(s: String, lo: Int, hi: Int,
                        names: Map[String, Int] = Map.empty): Set[Int] = {
    def one(tok: String): Seq[Int] = {
      val (body, step) = tok.split("/") match {
        case Array(b)    => (b, 1)
        case Array(b, s) => (b, s.toInt)
      }
      val range = body match {
        case "*" => lo to hi
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-")
          names.getOrElse(a.toLowerCase, a.toInt) to names.getOrElse(b.toLowerCase, b.toInt)
        case v => { val x = names.getOrElse(v.toLowerCase, v.toInt); x to x }
      }
      range.by(step)
    }
    s.split(",").toSeq.flatMap(one).toSet
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
        Cron(cronField(f(0), 0, 59), cronField(f(1), 0, 23), cronField(f(2), 1, 31),
          cronField(f(3), 1, 12, monNames), cronField(f(4), 0, 6, dowNames))
      case dowish if Dows.exists(dowish.startsWith) =>
        // bare day-of-week subset: hourly at the anchor minute on those days
        // (reference: cron_kw day_of_week + hour '*' + minute start.minute)
        Cron(Set(anchor.getMinute), (0 to 23).toSet, (1 to 31).toSet,
          (1 to 12).toSet, cronField(dowish, 0, 6, dowNames))
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
  def nextFires(schedule: String, from: LocalDateTime, n: Int): Seq[LocalDateTime] = {
    val (freqRaw, startRaw) = schedule.toLowerCase.split("starting", 2) match {
      case Array(f, s) => (f.trim, s.trim)
      case Array(f)    => (f.trim, "")
    }
    val anchor = parseStart(startRaw, from)
    val norm = normalize(freqRaw)
    require(!(norm.contains("&") && norm.contains("|")),
      "cannot combine '&' and '|' logic in one schedule")
    val (parts, union) =
      if (norm.contains("|")) (norm.split("\\|").toSeq, true)
      else (norm.split("&").toSeq, false)
    val streams = parts.map(p => parsePart(p, anchor).fires(anchor))
    if (streams.size == 1) streams.head.take(n).toSeq
    else if (union) mergeUnion(streams, n)
    else mergeIntersect(streams, n)
  }

  private def mergeUnion(streams: Seq[Iterator[LocalDateTime]], n: Int): Seq[LocalDateTime] = {
    val bufs = streams.map(_.buffered)
    Iterator.continually {
      val next = bufs.minBy(_.head)
      val t = next.head
      bufs.foreach { b => while (b.head == t) b.next() }
      t
    }.take(n).toSeq
  }

  private def mergeIntersect(streams: Seq[Iterator[LocalDateTime]], n: Int): Seq[LocalDateTime] = {
    val bufs = streams.map(_.buffered)
    val out = Seq.newBuilder[LocalDateTime]
    var found = 0
    var guard = 0
    while (found < n && guard < 10_000_000) {
      val max = bufs.map(_.head).max
      bufs.foreach { b => while (b.head.isBefore(max)) { b.next(); () } }
      if (bufs.forall(_.head == max)) {
        out += max; found += 1
        bufs.foreach(_.next())
      }
      guard += 1
    }
    out.result()
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
