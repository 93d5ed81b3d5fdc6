package graft.expr

import java.time._
import java.time.format.DateTimeFormatter
import java.time.temporal.{ChronoUnit, TemporalAdjusters}

/** Moloch relative/snapped date parsing → epoch seconds.
  *
  * Mirrors the reference's `parseSeconds` (viewer/molochparser.jison:836-895):
  *   - `-5d`, `+2h`, `-1w@d` : offset from *now*, optional `@unit` snap
  *     applied before the offset;
  *   - `@h`, `@w`, `@w3` : snap now to the start of the unit (`@wN` snaps to
  *     week then moves to weekday N, Sunday=0);
  *   - `2019/01/01 10:10:10`, ISO-8601, bare epoch seconds.
  *
  * `now` is an explicit parameter so compiled plans are deterministic and
  * testable (the reference uses wall-clock moment()).
  */
object DateParse {

  private val unitRe = "(s|sec|secs|second|seconds)|(m|min|mins|minute|minutes)|(h|hr|hrs|hour|hours)|(d|day|days)|((?:w|week|weeks)\\d*)|(M|mon|mons|month|months)|(q|qtr|qtrs|quarter|quarters)|(y|yr|yrs|year|years)".r

  private def unitOf(s: String): Option[ChronoUnit] = s match {
    case unitRe(sec, min, hr, day, wk, mon, qtr, yr) =>
      if (sec != null) Some(ChronoUnit.SECONDS)
      else if (min != null) Some(ChronoUnit.MINUTES)
      else if (hr != null) Some(ChronoUnit.HOURS)
      else if (day != null) Some(ChronoUnit.DAYS)
      else if (wk != null) Some(ChronoUnit.WEEKS)
      else if (mon != null) Some(ChronoUnit.MONTHS)
      else if (qtr != null) Some(ChronoUnit.MONTHS) // quarters = 3 months
      else if (yr != null) Some(ChronoUnit.YEARS)
      else None
    case _ => None
  }

  private def isQuarter(s: String): Boolean = s.matches("q|qtr|qtrs|quarter|quarters")

  private def snapTo(d: ZonedDateTime, unitStr: String): ZonedDateTime = {
    val base = unitOf(unitStr).getOrElse(return d)
    base match {
      case ChronoUnit.SECONDS => d.truncatedTo(ChronoUnit.SECONDS)
      case ChronoUnit.MINUTES => d.truncatedTo(ChronoUnit.MINUTES)
      case ChronoUnit.HOURS   => d.truncatedTo(ChronoUnit.HOURS)
      case ChronoUnit.DAYS    => d.truncatedTo(ChronoUnit.DAYS)
      case ChronoUnit.WEEKS   =>
        // moment startOf('week') = Sunday 00:00; optional trailing digit
        // moves to that weekday (moment .day(n), Sunday=0).
        val sunday = d.truncatedTo(ChronoUnit.DAYS)
          .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.SUNDAY))
        "\\d+$".r.findFirstIn(unitStr) match {
          case Some(n) => sunday.plusDays(n.toLong)
          case None    => sunday
        }
      case ChronoUnit.MONTHS if isQuarter(unitStr) =>
        val startMonth = ((d.getMonthValue - 1) / 3) * 3 + 1
        d.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1).withMonth(startMonth)
      case ChronoUnit.MONTHS => d.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
      case ChronoUnit.YEARS  => d.truncatedTo(ChronoUnit.DAYS).withDayOfYear(1)
      case _ => d
    }
  }

  private def add(d: ZonedDateTime, sign: Int, n: Long, unitStr: String): ZonedDateTime =
    unitOf(unitStr) match {
      case Some(u) if isQuarter(unitStr) => d.plus(sign * n * 3, ChronoUnit.MONTHS)
      case Some(u)                       => d.plus(sign * n, u)
      case None                          => d
    }

  private val relRe = "^([+-])(\\d*)([a-zA-Z]*)(?:@([a-zA-Z0-9]+))?$".r
  private val snapRe = "^@([a-zA-Z0-9]+)$".r
  private val slashFmt = DateTimeFormatter.ofPattern("yyyy/MM/dd HH:mm:ss")
  private val slashFmtD = DateTimeFormatter.ofPattern("yyyy/MM/dd")

  def parseSeconds(str0: String, now: Instant, zone: ZoneId = ZoneOffset.UTC): Long = {
    val str = str0.trim.stripPrefix("\"").stripSuffix("\"")
    val z = now.atZone(zone)
    str match {
      case relRe(sign, num, unit, snap) =>
        val n = if (num.isEmpty) 1L else num.toLong
        val snapped = if (snap != null) snapTo(z, snap) else z
        add(snapped, if (sign == "-") -1 else 1, n, unit).toEpochSecond
      case snapRe(snap) => snapTo(z, snap).toEpochSecond
      case s if s.nonEmpty && s.forall(_.isDigit) => s.toLong
      case s =>
        try LocalDateTime.parse(s, slashFmt).atZone(zone).toEpochSecond
        catch { case _: Exception =>
          try LocalDate.parse(s, slashFmtD).atStartOfDay(zone).toEpochSecond
          catch { case _: Exception =>
            try ZonedDateTime.parse(s).toEpochSecond
            catch { case _: Exception =>
              try LocalDateTime.parse(s).atZone(zone).toEpochSecond
              catch { case _: Exception =>
                // user-input errors stay in the one documented
                // IllegalArgumentException family (Parser.scala) — a
                // DateTimeParseException escaping here would turn an
                // HTTP-400-class error into a 500
                throw new IllegalArgumentException(
                  s"unparseable date value '$s'")
              }
            }
          }
        }
    }
  }
}
