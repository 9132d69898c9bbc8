package graft.drivers

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Date-partitioned input resolution (reference util/DateRange.scala,
  * util/DaysRange.scala, IOUtils.resolveRange:49-69 +
  * getInputPathsWithinDateRange:115-160): training inputs live under
  * `base/yyyy/MM/dd` daily directories; a job selects either an absolute
  * `yyyyMMdd-yyyyMMdd` range or a relative `startDaysAgo-endDaysAgo`
  * window rendered against "today".
  */
case class DateRange(start: LocalDate, end: LocalDate) {
  require(!end.isBefore(start), s"range end $end before start $start")
  def dates: Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end)).toSeq
}

object DateRange {
  private val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")
  /** "20240101-20240131" */
  def parse(s: String): DateRange = s.split("-") match {
    case Array(a, b) =>
      DateRange(LocalDate.parse(a, fmt), LocalDate.parse(b, fmt))
    case _ => throw new IllegalArgumentException(
      s"date range must be yyyyMMdd-yyyyMMdd, got '$s'")
  }
}

/** "90-1" = from 90 days ago through 1 day ago. */
case class DaysRange(startDaysAgo: Int, endDaysAgo: Int) {
  require(startDaysAgo >= endDaysAgo,
    s"start $startDaysAgo must be ≥ end $endDaysAgo days ago")
  def toDateRange(today: LocalDate): DateRange =
    DateRange(today.minusDays(startDaysAgo), today.minusDays(endDaysAgo))
}

object DaysRange {
  def parse(s: String): DaysRange = s.split("-") match {
    case Array(a, b) => DaysRange(a.toInt, b.toInt)
    case _ => throw new IllegalArgumentException(
      s"days range must be start-end, got '$s'")
  }
}

object DateRanges {

  /** Exactly one of dateRange/daysRange may be set; both → error, neither
    * → None (read the bare input dirs). Mirrors IOUtils.resolveRange. */
  def resolve(dateRange: Option[String], daysRange: Option[String],
              today: LocalDate = LocalDate.now()): Option[DateRange] =
    (dateRange, daysRange) match {
      case (Some(d), None) => Some(DateRange.parse(d))
      case (None, Some(d)) => Some(DaysRange.parse(d).toDateRange(today))
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "specify date-range OR days-range, not both")
      case (None, None) => None
    }

  /** Expand base dirs × range into daily paths (`base/yyyy/MM/dd`),
    * dropping dates with no data unless errorOnMissing. No range →
    * the base dirs unchanged. */
  def inputPaths(spark: SparkSession, baseDirs: Seq[String],
                 range: Option[DateRange],
                 errorOnMissing: Boolean = false): Seq[String] =
    range match {
      case None => baseDirs
      case Some(r) =>
        val dayFmt = DateTimeFormatter.ofPattern("yyyy/MM/dd")
        baseDirs.flatMap { base =>
          val fs = new Path(base).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          r.dates.flatMap { d =>
            val p = s"$base/${d.format(dayFmt)}"
            if (fs.exists(new Path(p))) Some(p)
            else if (errorOnMissing)
              throw new IllegalArgumentException(s"missing input: $p")
            else None
          }
        }
    }
}
