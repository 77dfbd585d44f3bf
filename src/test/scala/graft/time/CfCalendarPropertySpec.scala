package graft.time

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property laws of the CF calendar bridge across random calendars,
  * step units, reference dates (WITH time-of-day) and offsets — the
  * example-based CfTimeSpec crosses only a handful of points; these
  * invariants are what the coordinate/data-var decode and the
  * `cftime()` filter function rest on.
  */
class CfCalendarPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // calendars with a total timestamp bridge (all_leap has genuinely
  // unrepresentable dates — covered example-based in CfTimeSpec)
  private val calGen = Gen.oneOf("standard", "proleptic_gregorian",
    "noleap", "365_day")
  private val stepGen = Gen.oneOf("days", "hours", "minutes", "seconds")
  private val dateGen = for {
    y <- Gen.choose(1800, 2200)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
  } yield (y, m, d)

  test("offsetToMicros is strictly monotone in the offset") {
    check("monotone", Prop.forAll(calGen, stepGen, dateGen,
      Gen.choose(-200000L, 200000L)) { (cal, step, ref, o) =>
      val (y, m, d) = ref
      val units = f"$step since $y%04d-$m%02d-$d%02d"
      CfCalendar.offsetToMicros(o, units, cal) <
        CfCalendar.offsetToMicros(o + 1, units, cal)
    })
  }

  test("a reference time-of-day equals shifting the offset (exact units)") {
    // "hours since D HH:00:00" at offset o == "hours since D" at o+HH,
    // in EVERY calendar — the rollover must happen in the calendar's
    // own reckoning for this to hold across month/leap boundaries
    check("ref-tod-shift", Prop.forAll(calGen, dateGen,
      Gen.choose(0, 23), Gen.choose(-100000L, 100000L)) {
      (cal, ref, hh, o) =>
        val (y, m, d) = ref
        val base = f"hours since $y%04d-$m%02d-$d%02d"
        CfCalendar.offsetToMicros(o, f"$base $hh%02d:00:00", cal) ==
          CfCalendar.offsetToMicros(o + hh, base, cal)
    })
  }

  test("dateToOffset inverts the day decode (midnight refs)") {
    check("date-roundtrip", Prop.forAll(calGen, dateGen,
      Gen.choose(-50000L, 50000L)) { (cal, ref, k) =>
      val (y, m, d) = ref
      val units = f"days since $y%04d-$m%02d-$d%02d"
      val micros = CfCalendar.offsetToMicros(k, units, cal)
      // decode the civil date of offset k, re-encode: must be k again
      val ld = java.time.LocalDate.ofEpochDay(
        Math.floorDiv(micros, 86400000000L))
      val dateStr = f"${ld.getYear}%04d-${ld.getMonthValue}%02d-" +
        f"${ld.getDayOfMonth}%02d"
      CfCalendar.dateToOffset(dateStr, units, cal) == k
    })
  }

  test("non-Gregorian linearity: offsets differ by calendar day count") {
    // 360_day/julian keep int offsets; differences of dateToOffset must
    // equal the calendar's own day arithmetic
    check("nongreg-linear", Prop.forAll(Gen.oneOf("360_day", "julian"),
      dateGen, dateGen) { (cal, a, b) =>
      val (ya, ma, da) = a
      val (yb, mb, db) = b
      val units = "days since 2000-01-01"
      def s(t: (Int, Int, Int)) = f"${t._1}%04d-${t._2}%02d-${t._3}%02d"
      CfCalendar.dateToOffset(s(a), units, cal) -
        CfCalendar.dateToOffset(s(b), units, cal) ==
        CfCalendar.daysFromYearZero(cal, ya, ma, da) -
          CfCalendar.daysFromYearZero(cal, yb, mb, db)
    })
  }

  test("parseUnits: refMicros = time-of-day minus UTC offset") {
    val tzGen = Gen.option(for {
      sign <- Gen.oneOf("+", "-")
      oh <- Gen.choose(0, 14)
      om <- Gen.oneOf(0, 15, 30, 45)
    } yield (sign, oh, om))
    check("refmicros-fold", Prop.forAll(stepGen, dateGen,
      Gen.choose(0, 23), Gen.choose(0, 59), Gen.choose(0, 59), tzGen) {
      (step, ref, hh, mm, ss, tz) =>
        val (y, m, d) = ref
        val suffix = tz.fold("") { case (s, oh, om) =>
          f" $s$oh%02d:$om%02d" }
        val u = CfCalendar.parseUnits(
          f"$step since $y%04d-$m%02d-$d%02d $hh%02d:$mm%02d:$ss%02d" +
            suffix)
        val tod = (hh * 3600L + mm * 60L + ss) * 1000000L
        val off = tz.fold(0L) { case (s, oh, om) =>
          val mag = (oh * 60L + om) * 60000000L
          if (s == "-") -mag else mag
        }
        u.refMicros == tod - off
    })
  }

  test("UTC offset == real-timeline shift (Gregorian calendars)") {
    // on calendars that ARE the real timeline, folding the reference
    // offset is exactly subtracting it from every decoded instant
    check("offset-shift-greg", Prop.forAll(
      Gen.oneOf("standard", "proleptic_gregorian"), stepGen, dateGen,
      Gen.choose(-100000L, 100000L), Gen.choose(-14, 14),
      Gen.oneOf(0, 30)) { (cal, step, ref, o, oh, om) =>
      val (y, m, d) = ref
      val base = f"$step since $y%04d-$m%02d-$d%02d 06:00:00"
      val sign = if (oh < 0) "-" else "+"
      val units = f"$base $sign${math.abs(oh)}%02d:$om%02d"
      val offMicros =
        (math.abs(oh) * 60L + om) * 60000000L * (if (oh < 0) -1 else 1)
      CfCalendar.offsetToMicros(o, units, cal) ==
        CfCalendar.offsetToMicros(o, base, cal) - offMicros
    })
  }

  test("UTC offset == in-calendar shift of the offset grid (all calendars)") {
    // in noleap/all_leap the subtraction must happen in the CALENDAR'S
    // OWN reckoning (the real-timeline shift law above breaks across
    // its missing/extra Feb 29), which for whole-step offsets equals
    // shifting the integer offset: "hours since D HH +OH:00" at o ==
    // "hours since D" at o + HH - OH
    check("offset-shift-cal", Prop.forAll(calGen, dateGen,
      Gen.choose(0, 23), Gen.choose(-14, 14),
      Gen.choose(-100000L, 100000L)) { (cal, ref, hh, oh, o) =>
      val (y, m, d) = ref
      val base = f"hours since $y%04d-$m%02d-$d%02d"
      val sign = if (oh < 0) "-" else "+"
      val units = f"$base $hh%02d:00:00 $sign${math.abs(oh)}%02d:00"
      CfCalendar.offsetToMicros(o, units, cal) ==
        CfCalendar.offsetToMicros(o + hh - oh, base, cal)
    })
  }
}
