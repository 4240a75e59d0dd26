package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._

/** TIME-UNIT / TRUNCATE partition transforms (X93) — `PARTITIONED BY
  * (days(ts))` / `months(ts)` / `hours(ts)` / `years(ts)` /
  * `truncate(w, col)`, or the path-write `transform` option: rows land
  * under `<col>_<kind>=<unit>` dirs with the unit rendered canonically
  * in UTC (`2024`, `2024-01`, `2024-01-15`, `2024-01-15-06`; truncate
  * renders the floored value / the escaped prefix). Like the
  * hash-bucket level the column STAYS in the data files (a unit holds
  * many values); the payoff is the reference's own date-dir layout
  * (CrawlData.py:111-113) generalized to raw timestamps: a range
  * predicate on the column prunes to a unit-range DIR set at planning
  * time — a 100 TB store probed for one week lists only that week's
  * dirs, before any footer or sidecar is touched. Composes with
  * identity partitioning (outer levels) and one bucket level (inner):
  * `PARTITIONED BY (region, days(ts), bucket(64, id))`.
  *
  * Pruning is THREE-VALUED and inclusive-boundary-safe (the X53
  * discipline): a dir is dropped only when some pushed conjunct
  * PROVABLY matches no row of the unit interval `[lo, hi)`; everything
  * else is kept and the residual filter still runs — skipping is
  * exact, never optimistic. Null column values land in the hive null
  * dir, which only `IsNull`-family predicates can drop.
  *
  * A transform-UNAWARE walk stays correct by construction: the column
  * lives in the files and `<col>_<kind>=` dirs are just deeper paths,
  * so entries written without the transform (a DML rewrite's honest
  * downgrade) serve all their files, and mixed-transform entries
  * degrade to unpruned — never to wrong rows. */
final case class StoreTransform(col: String, kind: String, width: Int = 0) {
  require(StoreTransform.kinds(kind), s"unknown transform kind '$kind'")
  require(kind != "trunc" || width > 0,
    s"truncate needs a positive width, got $width")
  def dirPrefix: String = s"${col}_$kind="
  /** The canonical user-facing spelling, recorded in sidecars and
    * round-tripped by [[StoreTransform.parse]]. */
  def spelling: String = kind match {
    case "year" => s"years($col)"
    case "month" => s"months($col)"
    case "day" => s"days($col)"
    case "hour" => s"hours($col)"
    case "trunc" => s"truncate($width, $col)"
  }
}

object StoreTransform {
  val kinds: Set[String] = Set("year", "month", "day", "hour", "trunc")

  /** `days(ts)` / `months(ts)` / `hours(ts)` / `years(ts)` /
    * `truncate(16, col)` → the spec. Singular spellings accepted. */
  def parse(s: String): StoreTransform = {
    val t = s.trim
    val open = t.indexOf('(')
    require(open > 0 && t.endsWith(")"),
      s"cannot parse transform '$s' — expected days(col)/months(col)/" +
        "hours(col)/years(col)/truncate(w, col)")
    val fn = t.substring(0, open).trim.toLowerCase(java.util.Locale.ROOT)
    val args = t.substring(open + 1, t.length - 1)
      .split(",").map(_.trim).filter(_.nonEmpty)
    fn match {
      case "day" | "days" =>
        require(args.length == 1, s"days() takes one column, got '$s'")
        StoreTransform(args(0), "day")
      case "month" | "months" =>
        require(args.length == 1, s"months() takes one column, got '$s'")
        StoreTransform(args(0), "month")
      case "hour" | "hours" =>
        require(args.length == 1, s"hours() takes one column, got '$s'")
        StoreTransform(args(0), "hour")
      case "year" | "years" =>
        require(args.length == 1, s"years() takes one column, got '$s'")
        StoreTransform(args(0), "year")
      case "truncate" | "trunc" =>
        require(args.length == 2,
          s"truncate() takes (width, col), got '$s'")
        StoreTransform(args(1), "trunc", args(0).toInt)
      case other =>
        throw new IllegalArgumentException(
          s"unknown partition transform '$other' in '$s'")
    }
  }

  /** The column types each transform kind accepts: time units need a
    * TIMESTAMP (hours) or TIMESTAMP/DATE (years/months/days); truncate
    * takes integral or string columns. */
  def validate(t: StoreTransform, dt: DataType): Unit = t.kind match {
    case "hour" =>
      require(dt == TimestampType,
        s"hours(${t.col}) needs a TIMESTAMP column, got $dt")
    case "year" | "month" | "day" =>
      require(dt == TimestampType || dt == DateType,
        s"${t.kind}s(${t.col}) needs a TIMESTAMP or DATE column, got $dt")
    case "trunc" =>
      require(Set[DataType](ByteType, ShortType, IntegerType, LongType,
        StringType)(dt),
        s"truncate(${t.width}, ${t.col}) needs an integral or string " +
          s"column, got $dt")
  }
}

private[sources] object TimeTransforms {

  private val MicrosPerHour = 3600L * 1000L * 1000L
  private val MicrosPerDay = 24L * MicrosPerHour
  private val NullDir = "__HIVE_DEFAULT_PARTITION__"

  /** %XX dir escaping for truncate-prefix values — the identity
    * partition levels' contract ([[EpochStore.parsePartitionValue]]'s
    * unescape inverts it). */
  private def escape(s: String): String = s.flatMap { ch =>
    if (ch.isLetterOrDigit || ch == '.' || ch == '_' || ch == '-')
      ch.toString
    else if (ch.toInt <= 0xFF) f"%%${ch.toInt}%02X"
    else throw new IllegalArgumentException(
      s"truncate prefix '$s' contains a non-Latin-1 character the %XX " +
        "dir escaping cannot round-trip — truncate a different column")
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val esc = c == '%' && i + 2 < s.length &&
        Character.digit(s.charAt(i + 1), 16) >= 0 &&
        Character.digit(s.charAt(i + 2), 16) >= 0
      if (esc) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The unit ORDINAL of one catalyst-internal value — epoch-day /
    * epoch-hour / months-since-epoch / calendar year for time kinds
    * (UTC truncation of the internal micros/days), the floored
    * multiple for integral truncate. Time values are UTC-anchored by
    * Spark's internal representation, so the unit is stable across
    * session timezones — the same row always lands in the same dir. */
  private def ordinalOf(v: Any, dt: DataType, t: StoreTransform): Long = {
    val days: Long = dt match {
      case TimestampType =>
        Math.floorDiv(v.asInstanceOf[Long], MicrosPerDay)
      case DateType => v.asInstanceOf[Int].toLong
      case _ => throw new IllegalStateException(s"no time domain for $dt")
    }
    t.kind match {
      case "day" => days
      case "hour" => Math.floorDiv(v.asInstanceOf[Long], MicrosPerHour)
      case "month" =>
        val ld = LocalDate.ofEpochDay(days)
        ld.getYear * 12L + (ld.getMonthValue - 1)
      case "year" => LocalDate.ofEpochDay(days).getYear.toLong
      case _ => throw new IllegalStateException(s"not a time kind: $t")
    }
  }

  private def renderOrdinal(o: Long, kind: String): String = kind match {
    case "day" => LocalDate.ofEpochDay(o).toString
    case "hour" =>
      val d = LocalDate.ofEpochDay(Math.floorDiv(o, 24L))
      f"$d-${Math.floorMod(o, 24L)}%02d"
    case "month" =>
      f"${Math.floorDiv(o, 12L)}%04d-${Math.floorMod(o, 12L) + 1}%02d"
    case "year" => f"$o%04d"
    case _ => throw new IllegalStateException(s"not a time kind: $kind")
  }

  private def parseOrdinal(raw: String, kind: String): Long = kind match {
    case "day" => LocalDate.parse(raw).toEpochDay
    case "hour" =>
      val d = LocalDate.parse(raw.substring(0, raw.length - 3)).toEpochDay
      d * 24L + raw.substring(raw.length - 2).toInt
    case "month" =>
      val i = raw.lastIndexOf('-')
      raw.substring(0, i).toLong * 12L + (raw.substring(i + 1).toInt - 1)
    case "year" => raw.toLong
    case _ => throw new IllegalStateException(s"not a time kind: $kind")
  }

  /** The unit's half-open interval `[lo, hi)` in the COLUMN's internal
    * scalar domain (micros for TIMESTAMP, epoch days for DATE, the raw
    * value for integral truncate) — what pushed-filter values convert
    * into for the satisfiability probe. */
  private def ordinalRange(o: Long, t: StoreTransform, dt: DataType)
      : (Long, Long) = {
    def dayRange(d0: Long, d1: Long): (Long, Long) = dt match {
      case TimestampType => (d0 * MicrosPerDay, d1 * MicrosPerDay)
      case DateType => (d0, d1)
      case _ => throw new IllegalStateException(s"no time domain for $dt")
    }
    t.kind match {
      case "day" => dayRange(o, o + 1)
      case "hour" => (o * MicrosPerHour, (o + 1) * MicrosPerHour)
      case "month" =>
        val lo = LocalDate.of(Math.floorDiv(o, 12L).toInt,
          Math.floorMod(o, 12L).toInt + 1, 1)
        dayRange(lo.toEpochDay, lo.plusMonths(1).toEpochDay)
      case "year" =>
        val lo = LocalDate.of(o.toInt, 1, 1)
        dayRange(lo.toEpochDay, lo.plusYears(1).toEpochDay)
      case "trunc" => (o, o + t.width)
      case _ => throw new IllegalStateException(s"$t")
    }
  }

  /** The dir VALUE one row's internal column value lands under —
    * writer-side (`null` → the hive null dir). */
  def dirValueOf(v: Any, dt: DataType, t: StoreTransform): String = {
    if (v == null) return NullDir
    (t.kind, dt) match {
      case ("trunc", StringType) =>
        escape(v.toString.take(t.width))
      case ("trunc", _) =>
        val x = v.asInstanceOf[Number].longValue()
        (x - Math.floorMod(x, t.width.toLong)).toString
      case _ => renderOrdinal(ordinalOf(v, dt, t), t.kind)
    }
  }

  /** A pushed-filter EXTERNAL value → the internal scalar domain
    * (micros / epoch days / long). None = unconvertible, never prune. */
  private def toInternal(v: Any, dt: DataType): Option[Long] =
    if (v == null) None
    else
      try org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToCatalyst(v) match {
        case l: java.lang.Long => Some(l)
        case i: java.lang.Integer => Some(i.toLong)
        case s: java.lang.Short => Some(s.toLong)
        case b: java.lang.Byte => Some(b.toLong)
        case _ => None
      } catch { case _: Exception => None }

  private def and3(a: Option[Boolean], b: Option[Boolean])
      : Option[Boolean] = (a, b) match {
    case (Some(false), _) | (_, Some(false)) => Some(false)
    case (Some(true), Some(true)) => Some(true)
    case _ => None
  }
  private def or3(a: Option[Boolean], b: Option[Boolean])
      : Option[Boolean] = (a, b) match {
    case (Some(true), _) | (_, Some(true)) => Some(true)
    case (Some(false), Some(false)) => Some(false)
    case _ => None
  }

  /** Three-valued evaluation of one pushed filter against a NUMERIC
    * unit interval `[lo, hi)` (integral domain — micros / days / raw):
    * Some(false) = provably no row of the unit satisfies it. `iv` =
    * None is the null dir (every row's column value is null). */
  private def evalNum(f: Filter, col: String, iv: Option[(Long, Long)],
                      dt: DataType): Option[Boolean] = {
    def conv(v: Any): Option[Long] = toInternal(v, dt)
    f match {
      case sources.And(l, r) =>
        and3(evalNum(l, col, iv, dt), evalNum(r, col, iv, dt))
      case sources.Or(l, r) =>
        or3(evalNum(l, col, iv, dt), evalNum(r, col, iv, dt))
      case sources.Not(c) => evalNum(c, col, iv, dt).map(!_)
      case sources.EqualTo(a, v) if a == col =>
        if (v == null || iv.isEmpty) Some(false)
        else conv(v) match {
          case Some(x) =>
            if (x < iv.get._1 || x >= iv.get._2) Some(false) else None
          case None => None
        }
      case sources.EqualNullSafe(a, v) if a == col =>
        if (v == null) Some(iv.isEmpty)
        else if (iv.isEmpty) Some(false)
        else conv(v) match {
          case Some(x) =>
            if (x < iv.get._1 || x >= iv.get._2) Some(false) else None
          case None => None
        }
      case sources.In(a, vs) if a == col =>
        if (iv.isEmpty) Some(false)
        else {
          val xs = vs.toSeq.flatMap(conv)
          if (xs.size < vs.count(_ != null)) None // unconvertible → keep
          else if (xs.exists(x => x >= iv.get._1 && x < iv.get._2)) None
          else Some(false)
        }
      case sources.GreaterThan(a, v) if a == col =>
        if (iv.isEmpty) Some(false)
        else conv(v).flatMap { x =>
          if (iv.get._2 - 1 <= x) Some(false)
          else if (iv.get._1 > x) Some(true)
          else None
        }
      case sources.GreaterThanOrEqual(a, v) if a == col =>
        if (iv.isEmpty) Some(false)
        else conv(v).flatMap { x =>
          if (iv.get._2 <= x) Some(false)
          else if (iv.get._1 >= x) Some(true)
          else None
        }
      case sources.LessThan(a, v) if a == col =>
        if (iv.isEmpty) Some(false)
        else conv(v).flatMap { x =>
          if (iv.get._1 >= x) Some(false)
          else if (iv.get._2 <= x) Some(true)
          else None
        }
      case sources.LessThanOrEqual(a, v) if a == col =>
        if (iv.isEmpty) Some(false)
        else conv(v).flatMap { x =>
          if (iv.get._1 > x) Some(false)
          else if (iv.get._2 - 1 <= x) Some(true)
          else None
        }
      case sources.IsNull(a) if a == col => Some(iv.isEmpty)
      case sources.IsNotNull(a) if a == col => Some(iv.nonEmpty)
      case sources.AlwaysFalse() => Some(false)
      case sources.AlwaysTrue() => Some(true)
      case _ => None
    }
  }

  /** Three-valued evaluation against a STRING-truncate unit: every row
    * of the dir shares the (unescaped) prefix `p` — or IS exactly a
    * value shorter than the width. `p` = None is the null dir. */
  private def evalStr(f: Filter, col: String, p: Option[String])
      : Option[Boolean] = f match {
    case sources.And(l, r) => and3(evalStr(l, col, p), evalStr(r, col, p))
    case sources.Or(l, r) => or3(evalStr(l, col, p), evalStr(r, col, p))
    case sources.Not(c) => evalStr(c, col, p).map(!_)
    case sources.EqualTo(a, v) if a == col =>
      if (v == null || p.isEmpty) Some(false)
      else v match {
        case s: String =>
          // rows of this dir either extend p or equal a value shorter
          // than the width (then p IS that value — s.startsWith(p)
          // still holds); anything failing the prefix test is absent
          if (s.startsWith(p.get) || p.get.startsWith(s)) None
          else Some(false)
        case _ => None
      }
    case sources.EqualNullSafe(a, v) if a == col =>
      if (v == null) Some(p.isEmpty)
      else evalStr(sources.EqualTo(a, v), col, p)
    case sources.In(a, vs) if a == col =>
      if (p.isEmpty) Some(false)
      else if (vs.exists {
        case s: String => s.startsWith(p.get) || p.get.startsWith(s)
        case null => false
        case _ => true // unconvertible → keep
      }) None
      else Some(false)
    case sources.GreaterThan(a, v) if a == col =>
      if (p.isEmpty) Some(false)
      else v match {
        case s: String =>
          if (p.get > s) Some(true)
          else if (s.startsWith(p.get)) None
          else Some(false) // p <= s and s doesn't extend p: all x <= s
        case _ => None
      }
    case sources.GreaterThanOrEqual(a, v) if a == col =>
      if (p.isEmpty) Some(false)
      else v match {
        case s: String =>
          if (p.get >= s) Some(true)
          else if (s.startsWith(p.get)) None
          else Some(false)
        case _ => None
      }
    case sources.LessThan(a, v) if a == col =>
      if (p.isEmpty) Some(false)
      else v match {
        case s: String =>
          if (p.get >= s) Some(false) // min row = p itself
          else if (s.startsWith(p.get)) None
          else Some(true) // p < s, s beyond the prefix subtree: all x < s
        case _ => None
      }
    case sources.LessThanOrEqual(a, v) if a == col =>
      if (p.isEmpty) Some(false)
      else v match {
        case s: String =>
          if (p.get > s) Some(false)
          else if (s.startsWith(p.get)) None
          else Some(true)
        case _ => None
      }
    case sources.StringStartsWith(a, v) if a == col =>
      if (p.isEmpty) Some(false)
      else {
        val q = p.get
        if (v.length <= q.length) {
          if (q.startsWith(v)) Some(true) else Some(false)
        } else if (v.startsWith(q)) None
        else Some(false)
      }
    case sources.IsNull(a) if a == col => Some(p.isEmpty)
    case sources.IsNotNull(a) if a == col => Some(p.nonEmpty)
    case sources.AlwaysFalse() => Some(false)
    case sources.AlwaysTrue() => Some(true)
    case _ => None
  }

  /** The dir-keep predicate for one scan: Some(rawDirValue => keep)
    * when any pushed conjunct references the transform column (a dir
    * is dropped only when some conjunct is provably unsatisfiable over
    * its unit), None when nothing can prune — the walk then skips the
    * parse entirely. Unparseable dir values always keep. */
  def unitKeep(filters: Array[Filter], t: StoreTransform, dt: DataType)
      : Option[String => Boolean] = {
    val relevant = filters.filter(_.references.contains(t.col))
    if (relevant.isEmpty) return None
    if (t.kind == "trunc" && dt == StringType)
      Some { raw =>
        val p = if (raw == NullDir) None else Some(unescape(raw))
        relevant.forall(f => evalStr(f, t.col, p) != Some(false))
      }
    else
      Some { raw =>
        val iv: Option[Option[(Long, Long)]] =
          if (raw == NullDir) Some(None)
          else (try {
            val o =
              if (t.kind == "trunc") raw.toLong else parseOrdinal(raw, t.kind)
            Some(ordinalRange(o, t, dt))
          } catch { case _: Exception => None }) match {
            case Some(r) => Some(Some(r))
            case None => None // unparseable → keep
          }
        iv match {
          case None => true
          case Some(interval) =>
            relevant.forall(f => evalNum(f, t.col, interval, dt) != Some(false))
        }
      }
  }
}
