package graft.time

/** CF-convention calendar bridge — the Spark re-expression of the
  * reference's cftime module (xarray_sql/cftime.py:1-248, SURVEY §2A A14).
  *
  * Two tiers, as in the reference:
  *   - Gregorian-like calendars (standard/gregorian/proleptic_gregorian,
  *     noleap/365_day, all_leap/366_day) convert exactly to microseconds
  *     since epoch -> Spark TimestampType;
  *   - non-Gregorian calendars (360_day, julian) cannot be represented on
  *     the real timeline, so their coordinates stay as int64 CF offsets
  *     ("<unit> since <ref-date>") -> Spark LongType, and the `cftime`
  *     function (CfTimeExpr) converts date-string literals to offsets so
  *     `WHERE time >= cftime('2000-07-01')` works.
  */
object CfCalendar {

  sealed trait Kind
  /** Representable on the proleptic Gregorian timeline -> timestamps. */
  case object GregorianLike extends Kind
  /** Needs offset arithmetic in its own calendar -> int64 offsets. */
  case object NonGregorian extends Kind

  def classify(calendar: String): Kind = calendar.toLowerCase match {
    case "standard" | "gregorian" | "proleptic_gregorian" => GregorianLike
    case "noleap" | "365_day" | "all_leap" | "366_day" => GregorianLike
    case "360_day" | "julian" => NonGregorian
    case other => throw new IllegalArgumentException(s"unknown calendar: $other")
  }

  private val monthDays = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  private val monthDaysLeap = Array(31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

  private def julianLeap(y: Int): Boolean = y % 4 == 0

  /** Days from the calendar's year 0 to the given date, in the calendar. */
  def daysFromYearZero(calendar: String, y: Int, m: Int, d: Int): Long = {
    require(m >= 1 && m <= 12 && d >= 1, s"bad date $y-$m-$d")
    calendar.toLowerCase match {
      case "360_day" =>
        y.toLong * 360L + (m - 1) * 30L + (d - 1)
      case "noleap" | "365_day" =>
        y.toLong * 365L + monthDays.take(m - 1).sum + (d - 1)
      case "all_leap" | "366_day" =>
        y.toLong * 366L + monthDaysLeap.take(m - 1).sum + (d - 1)
      case "julian" =>
        // year 0 is a leap year in the julian proleptic reckoning
        val leaps = (y + 3) / 4 // leap years in [0, y)
        val md = if (julianLeap(y)) monthDaysLeap else monthDays
        y.toLong * 365L + leaps + md.take(m - 1).sum + (d - 1)
      case "standard" | "gregorian" | "proleptic_gregorian" =>
        java.time.LocalDate.of(y, m, d).toEpochDay + 719528L // 0000-01-01
      case other => throw new IllegalArgumentException(s"unknown calendar: $other")
    }
  }

  /** Parse "days since 2000-01-01" / "hours since ..." style CF units.
    * `refMicros` is the reference datetime's intra-day component
    * ("days since 1850-01-01 12:00:00" -> 43_200_000_000): CF reference
    * dates routinely carry a time-of-day (ERA-style "hours since
    * 1900-01-01 00:00:0.0"), and dropping it shifts every decoded
    * timestamp by up to a day (cftime.date2num honors it). A nonzero
    * UTC offset on the reference ("... 00:00:00 +01:00") folds in here
    * too — the reference instant is LOCAL to that offset, so its UTC
    * micros are time-of-day MINUS offset, exactly cftime's conversion
    * of the tz-aware reference to UTC — which can push `refMicros`
    * outside [0, day): consumers use floor division, so any magnitude
    * carries correctly across civil days.
    */
  final case class Units(step: String, refY: Int, refM: Int, refD: Int,
      refMicros: Long = 0L) {
    def stepsPerDay: Long = step match {
      case "days" => 1L
      case "hours" => 24L
      case "minutes" => 1440L
      case "seconds" => 86400L
      // CF-standard sub-second steps (udunits names) — the encoding
      // ZarrGridStore.write emits for microsecond-resolution time axes
      case "milliseconds" => 86400000L
      case "microseconds" => 86400000000L
      // sub-µs: offsets truncate to the engine's µs resolution at
      // decode (same documented loss as the raw <M8[ns] dtype path)
      case "nanoseconds" => 86400000000000L
      case other => throw new IllegalArgumentException(s"unknown unit $other")
    }
  }

  // udunits/cftime grammar, as found in real archives: optional
  // time-of-day down to hour-only ("days since 2000-01-01 0"),
  // fractional seconds ("hours since 1900-01-01 00:00:0.0"), and an
  // optional UTC-offset suffix with or without a sign ("... 0:00",
  // CMIP/CORDEX style) or a case-insensitive UTC-equivalent zone word
  // ("utc" appears lowercased in the wild; other zone words like
  // "PST" stay a loud reject — the old permissive grammar silently
  // decoded them AS UTC, which was wrong whenever the zone wasn't)
  private val UnitsRe =
    ("""(\w+) since (\d{1,4})-(\d{1,2})-(\d{1,2})""" +
      """(?:[T ](\d{1,2})(?::(\d{1,2})(?::(\d{1,2}(?:\.\d+)?))?)?)?""" +
      """(?:\s*((?i:Z|UTC|GMT)|[+-]?\d{1,2}(?::?\d{2})?))?\s*""").r

  def parseUnits(units: String): Units = units match {
    case UnitsRe(step, y, m, d, hh, mi, ss, tz) =>
      val h = Option(hh).map(_.toInt).getOrElse(0)
      val mn = Option(mi).map(_.toInt).getOrElse(0)
      val (sec, fracMicros) = Option(ss) match {
        case None => (0, 0L)
        case Some(s) => s.split('.') match {
          case Array(w) => (w.toInt, 0L)
          case Array(w, f) => (w.toInt, (f + "000000").take(6).toLong)
        }
      }
      require(h < 24 && mn < 60 && sec <= 60,
        s"bad reference time-of-day in CF units: $units")
      // zone suffix: UTC-equivalent words (any case) are a no-op; a
      // NUMERIC offset marks the reference instant as local to that
      // offset, so its UTC intra-day micros are time-of-day minus
      // offset — the same conversion cftime applies to a tz-aware
      // reference ("hours since 1980-01-01 00:00:00 +01:00" references
      // 1979-12-31T23:00Z). Unsigned offsets are positive (udunits).
      val offMicros: Long = Option(tz) match {
        case None => 0L
        case Some(z) if z.equalsIgnoreCase("Z") ||
            z.equalsIgnoreCase("UTC") || z.equalsIgnoreCase("GMT") => 0L
        case Some(off) =>
          val neg = off.startsWith("-")
          val digits = off.dropWhile(c => c == '+' || c == '-')
            .filter(_ != ':')
          val (oh, om) =
            if (digits.length > 2)
              (digits.dropRight(2).toInt, digits.takeRight(2).toInt)
            else (digits.toInt, 0)
          require(oh < 24 && om < 60,
            s"bad UTC offset in CF units: $units")
          val mag = (oh * 60L + om) * 60000000L
          if (neg) -mag else mag
      }
      val refMicros =
        ((h * 3600L + mn * 60L + sec) * 1000000L) + fracMicros - offMicros
      Units(step, y.toInt, m.toInt, d.toInt, refMicros)
    case other => throw new IllegalArgumentException(s"bad CF units: $other")
  }

  private val DateRe = """(\d{1,4})-(\d{1,2})-(\d{1,2})([T ].*)?""".r

  /** `cftime('2000-07-01')` semantics: date string -> int64 offset in the
    * dataset's CF units and calendar (reference cftime.py:217-248).
    */
  def dateToOffset(dateStr: String, units: String, calendar: String): Long = {
    val u = parseUnits(units)
    val (y, m, d) = dateStr match {
      case DateRe(ys, ms, ds, _) => (ys.toInt, ms.toInt, ds.toInt)
      case other => throw new IllegalArgumentException(s"bad date: $other")
    }
    val days = daysFromYearZero(calendar, y, m, d) -
      daysFromYearZero(calendar, u.refY, u.refM, u.refD)
    val spd = u.stepsPerDay
    val microsPerDay = 86400000000L
    // a reference time-of-day shifts the integer offset grid: offset =
    // (date - refDate) in steps MINUS the ref's intra-day steps. Exact
    // when the time-of-day is a whole number of steps ("12:00:00"
    // under hours); otherwise — "days since ... 12:00:00", where NO
    // integer offset denotes midnight — round to the NEAREST step
    // (ties toward the requested date), which reproduces the legacy
    // behavior of ignoring the reference time and is off by at most
    // half a step on boundary instants. Warn so the half-step
    // semantics are visible; cftime.date2num returns fractions here,
    // which an int64 offset column cannot carry.
    val refSteps =
      if (u.refMicros == 0L) 0L
      else if (spd >= microsPerDay) u.refMicros * (spd / microsPerDay)
      else {
        // floor semantics: refMicros can be negative once a UTC offset
        // folds in, and floorDiv/floorMod keep r in [0, step) so the
        // whole-step exactness and half-up rounding laws below hold
        // for any sign
        val microsPerStep = microsPerDay / spd
        val q = Math.floorDiv(u.refMicros, microsPerStep)
        val r = Math.floorMod(u.refMicros, microsPerStep)
        if (r != 0L)
          org.slf4j.LoggerFactory.getLogger(CfCalendar.getClass).warn(
            s"cftime('$dateStr') on '$units': the reference " +
              "time-of-day is not a whole number of steps; rounding to " +
              "the nearest offset (boundary rows within half a step of " +
              "the date may shift)")
        // round(base - q - r/mps): half-up keeps ties on the date
        q + (if (r * 2 > microsPerStep) 1L else 0L)
      }
    Math.subtractExact(Math.multiplyExact(days, spd), refSteps)
  }

  /** Gregorian-like CF offset -> microseconds since the Unix epoch:
    * decode the offset in the calendar's OWN reckoning to a civil
    * (year, month, day [, intra-day steps]) and place that date on the
    * real timeline — the reference's two-tier rule maps
    * noleap/365_day/all_leap/366_day onto datetime64 timestamps
    * (cftime.py:33-47). The discriminating case: "days since
    * 2000-01-01" offset 59 in noleap is 2000-03-01 (no Feb 29 in the
    * calendar), where a naive epoch + offset*86400 bridge lands on the
    * real timeline's 2000-02-29 and shifts every later row.
    *
    * all_leap's Feb 29 of a real non-leap year does not exist on the
    * timeline; that date throws (java.time.DateTimeException), the
    * same unrepresentability the reference's datetime64 bridge hits.
    */
  def offsetToMicros(offset: Long, units: String, calendar: String): Long = {
    require(classify(calendar) == GregorianLike,
      s"calendar $calendar keeps int64 offsets; no timestamp bridge")
    val u = parseUnits(units)
    val spd = u.stepsPerDay
    // equivalent to floorDiv/floorMod of (refDays*spd + offset) but
    // WITHOUT forming that product: for sub-second steps it overflows
    // Long (738k days since year 0 × 86400e9 ns/day ≈ 6e19 > 2^63)
    val remSteps = Math.floorMod(offset, spd)
    // intra-day component: multiply up for coarse steps, divide down
    // (floor — remSteps is non-negative from floorMod) for sub-µs
    // steps; the old `remSteps * (µsPerDay / spd)` zeroed out whole
    // days' worth of nanosecond offsets via integer division. The
    // reference datetime's own time-of-day folds in here, rolling the
    // civil day over IN THE DATASET'S CALENDAR when the sum crosses
    // midnight (floor-carried below, any magnitude or sign).
    val microsPerDay = 86400000000L
    val intra0 = (if (spd >= microsPerDay) remSteps / (spd / microsPerDay)
                  else remSteps * (microsPerDay / spd)) + u.refMicros
    // floorDiv/floorMod, not truncation: a UTC-offset-bearing
    // reference can make refMicros negative (or push intra0 past two
    // days for extreme offsets), and the civil-day carry must still
    // land intra in [0, day) with the day borrow going DOWN
    val days = daysFromYearZero(calendar, u.refY, u.refM, u.refD) +
      Math.floorDiv(offset, spd) + Math.floorDiv(intra0, microsPerDay)
    val intra = Math.floorMod(intra0, microsPerDay)
    val (y, m, d) = calendar.toLowerCase match {
      case "noleap" | "365_day" =>
        val yy = Math.floorDiv(days, 365L).toInt
        var doy = Math.floorMod(days, 365L).toInt
        var mm = 0
        while (doy >= monthDays(mm)) { doy -= monthDays(mm); mm += 1 }
        (yy, mm + 1, doy + 1)
      case "all_leap" | "366_day" =>
        val yy = Math.floorDiv(days, 366L).toInt
        var doy = Math.floorMod(days, 366L).toInt
        var mm = 0
        while (doy >= monthDaysLeap(mm)) { doy -= monthDaysLeap(mm); mm += 1 }
        (yy, mm + 1, doy + 1)
      case _ => // standard/gregorian/proleptic_gregorian: real timeline
        val ld = java.time.LocalDate.ofEpochDay(days - 719528L)
        (ld.getYear, ld.getMonthValue, ld.getDayOfMonth)
    }
    gregorianMicros(y, m, d) + intra
  }

  /** Gregorian-like coordinate -> microseconds since the Unix epoch.
    * noleap/all_leap datasets are mapped via their own year lengths onto
    * the real timeline's matching civil date (the reference's "two-tier"
    * rule maps them to timestamps; cftime.py:33-47).
    */
  def gregorianMicros(y: Int, m: Int, d: Int, hour: Int = 0, minute: Int = 0,
      second: Int = 0): Long = {
    val epochDay = java.time.LocalDate.of(y, m, d).toEpochDay
    (epochDay * 86400L + hour * 3600L + minute * 60L + second) * 1000000L
  }
}
