package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, lit, when, concat_ws}

/** pandas `.str` accessor (reference `_str_accessor.py:10-124`, method list
  * `:22-76`) as a Column extension. Every method maps to a codegen'd
  * `org.apache.spark.sql.functions` call — no UDFs, so the whole family
  * stays inside WholeStageCodegen and the parquet scan keeps its pushdown.
  */
object StrOps {
  implicit class RichStrColumn(private val c: Column) extends AnyVal {
    def strLower: Column = F.lower(c)
    def strUpper: Column = F.upper(c)
    def strTitle: Column = F.initcap(c)
    def strStrip: Column = F.trim(c)
    def strLstrip: Column = F.ltrim(c)
    def strRstrip: Column = F.rtrim(c)
    def strLen: Column = F.length(c)
    def strContains(pat: String, regex: Boolean = false): Column =
      if (regex) c.rlike(pat) else c.contains(pat)
    def strStartswith(p: String): Column = c.startsWith(p)
    def strEndswith(p: String): Column = c.endsWith(p)
    /** literal replace (pandas regex=False). */
    def strReplaceLit(pat: String, repl: String): Column =
      F.replace(c, lit(pat), lit(repl))
    def strReplace(pat: String, repl: String): Column =
      F.regexp_replace(c, pat, repl)
    def strPadLeft(width: Int, fill: String = " "): Column = F.lpad(c, width, fill)
    def strPadRight(width: Int, fill: String = " "): Column = F.rpad(c, width, fill)
    def strZfill(width: Int): Column = F.lpad(c, width, "0")
    /** pandas slice(start, stop) — 0-based, stop-exclusive. */
    def strSlice(start: Int, stop: Int): Column =
      F.substring(c, start + 1, stop - start)
    def strCount(pat: String): Column = F.regexp_count(c, lit(pat))
    /** 0-based position of first occurrence, -1 if absent (pandas find). */
    def strFind(sub: String): Column = F.instr(c, sub) - 1
    def strExtract(pat: String, group: Int): Column = F.regexp_extract(c, pat, group)
    /** match at string start (pandas match). */
    def strMatch(pat: String): Column = c.rlike("^(?:" + pat + ")")
    def strFullmatch(pat: String): Column = c.rlike("^(?:" + pat + ")$")
    def strSplit(pat: String): Column = F.split(c, pat)
    /** null beyond bounds (pandas .str[i] semantics) — `get`, not
      * `getItem`, which throws under ANSI. */
    def strSplitGet(pat: String, i: Int): Column = F.get(F.split(c, pat), F.lit(i))
    /** pandas `str.get(i)`: character at position i (negative = from the
      * end); null when out of range — substring's "" would conflate with
      * a real empty only possible out-of-range here. */
    def strGet(i: Int): Column =
      if (i >= 0)
        F.when(F.length(c) > i, F.substring(c, i + 1, 1))
      else
        F.when(F.length(c) >= -i, F.substring(c, i, 1))
    /** pandas `str.join(sep)` over whitespace-split tokens (Spark has no
      * list-of-strings dtype on a string column; the split is explicit). */
    def strJoinTokens(splitPat: String, sep: String): Column =
      F.array_join(F.split(c, splitPat), sep)
    /** pandas `str.slice_replace(start, stop, repl)` = s[:start] + repl +
      * s[stop:]; 1-based substring bounds clamp exactly like Python
      * slicing for non-negative start/stop. */
    def strSliceReplace(start: Int, stop: Int, repl: String): Column =
      F.concat(F.substring(c, 1, start), F.lit(repl),
        F.substring(c, stop + 1, Int.MaxValue))
    def strRepeat(n: Int): Column = F.repeat(c, n)
    def strReverse: Column = F.reverse(c)
    def strIsdigit: Column = c.rlike("^[0-9]+$")
    def strIsalpha: Column = c.rlike("^[A-Za-z]+$")
    def strIsalnum: Column = c.rlike("^[A-Za-z0-9]+$")
    def strIsspace: Column = c.rlike("^\\s+$")
    def strIslower: Column = c === F.lower(c) && c.rlike("[A-Za-z]")
    def strIsupper: Column = c === F.upper(c) && c.rlike("[A-Za-z]")

    // ---- breadth additions (reference `_str_accessor.py:22-76`) ----

    /** simple case fold (full Unicode folding ≈ lower for ASCII). */
    def strCasefold: Column = F.lower(c)
    def strCapitalize: Column =
      F.concat(F.upper(c.substr(F.lit(1), F.lit(1))),
        F.lower(c.substr(F.lit(2), F.length(c))))
    /** per-char case swap — lambda over chars (elementwise, no shuffle). */
    def strSwapcase: Column =
      F.concat_ws("", F.transform(F.split(c, ""), ch =>
        when(ch === F.lower(ch), F.upper(ch)).otherwise(F.lower(ch))))
    /** python str.center: CPython puts the extra pad char LEFT only when
      * both the margin and the width are odd (left = marg//2 +
      * (marg & width & 1)); otherwise it goes right. */
    def strCenter(width: Int, fill: String = " "): Column = {
      val len = F.length(c)
      val marg = F.lit(width) - len
      val extra = F.pmod(marg, F.lit(2)) * F.lit(width % 2)
      val leftTarget =
        (len + F.floor(marg / 2).cast("int") + extra).cast("int")
      when(len >= width, c).otherwise(
        F.call_function("rpad",
          F.call_function("lpad", c, leftTarget, lit(fill)), lit(width), lit(fill)))
    }
    /** (before, sep, after) of the FIRST occurrence; (whole, "", "") when
      * absent — pandas str.partition as a 3-element array. */
    def strPartition(sep: String): Column = {
      val pos = F.instr(c, sep)
      when(pos === 0, F.array(c, lit(""), lit("")))
        .otherwise(F.array(c.substr(F.lit(1), pos - 1), lit(sep),
          c.substr(pos + sep.length, F.length(c))))
    }
    /** (before, sep, after) of the LAST occurrence; ("", "", whole) when
      * absent — pandas str.rpartition. */
    def strRpartition(sep: String): Column = {
      val rpos = F.instr(F.reverse(c), sep.reverse)
      val start = F.length(c) - sep.length - rpos + 2 // 1-based last-match start
      when(rpos === 0, F.array(lit(""), lit(""), c))
        .otherwise(F.array(c.substr(F.lit(1), start - 1), lit(sep),
          c.substr(start + sep.length, F.length(c))))
    }
    /** rsplit on a LITERAL separator with maxsplit n (reverse/split/
      * un-reverse; n<0 = plain split). */
    def strRsplit(sep: String, n: Int = -1): Column =
      if (n < 0) F.split(c, java.util.regex.Pattern.quote(sep))
      else F.reverse(F.transform(
        F.split(F.reverse(c), java.util.regex.Pattern.quote(sep.reverse), n + 1),
        x => F.reverse(x)))
    def strRemoveprefix(p: String): Column =
      when(c.startsWith(p), c.substr(F.lit(p.length + 1), F.length(c))).otherwise(c)
    def strRemovesuffix(s: String): Column =
      when(c.endsWith(s) && F.length(c) >= s.length,
        c.substr(F.lit(1), F.length(c) - s.length)).otherwise(c)
    def strTranslate(from: String, to: String): Column = F.translate(c, from, to)
    /** all non-overlapping matches of `pat` (pandas findall). */
    def strFindall(pat: String): Column =
      F.regexp_extract_all(c, lit(pat), F.lit(0))
    /** 0-based position of LAST occurrence, -1 if absent (pandas rfind). */
    def strRfind(sub: String): Column = {
      val rpos = F.instr(F.reverse(c), sub.reverse)
      when(rpos === 0, F.lit(-1)).otherwise(F.length(c) - sub.length - rpos + 1)
    }
    /** pandas index/rindex raise on a miss; null is the SQL analog. */
    def strIndexOf(sub: String): Column = {
      val pos = F.instr(c, sub)
      when(pos === 0, F.lit(null).cast("int")).otherwise(pos - 1)
    }
    def strRindex(sub: String): Column = {
      val r = strRfind(sub)
      when(r === -1, F.lit(null).cast("int")).otherwise(r)
    }
    /** python str.istitle via RE2-safe regex (no lookahead): optional
      * leading non-alpha, then Word(non-alpha+) groups, optional final
      * Word, trailing non-alpha; plus >=1 cased char. ASCII approx. */
    def strIstitle: Column =
      c.rlike("^[^A-Za-z]*(?:[A-Z][a-z]*[^A-Za-z]+)*(?:[A-Z][a-z]*)?[^A-Za-z]*$") &&
        c.rlike("[A-Za-z]")
    /** ASCII approximations (pandas uses Unicode categories). */
    def strIsdecimal: Column = c.rlike("^[0-9]+$")
    def strIsnumeric: Column = c.rlike("^[0-9]+$")
    /** Unicode NFC normalize — inherently a JVM text op, the one UDF in
      * the family (elementwise; not on any aggregation hot path). */
    def strNormalize: Column = StrOps.nfcNormalize(c)
    /** greedy wrap at `width` breaking on spaces (textwrap approx),
      * no trailing newline. */
    def strWrap(width: Int): Column =
      F.rtrim(F.regexp_replace(c, s"(.{1,$width})( +|$$)", "$1\n"), "\n")
    /** element-aligned cat: null if EITHER side is null (pandas na
      * propagation; concat_ws would skip the null side). */
    def strCatAligned(other: Column, sep: String): Column =
      when(c.isNull || other.isNull, F.lit(null).cast("string"))
        .otherwise(F.concat(c, lit(sep), other))
    def strEncode(charset: String): Column = F.encode(c, charset)
    def strDecode(charset: String): Column = F.decode(c, charset)
  }

  /** Native codegen'd expression (graft.functions.NfcNormalize) — was
    * the last hot-path text UDF; same java.text.Normalizer NFC call,
    * now inside WholeStageCodegen. */
  private def nfcNormalize(c: Column): Column =
    graft.functions.TextHashExprs.nfcNormalize(c)

  /** elementwise concat-with-sep (reference CatBlockwise
    * `_str_accessor.py:125-135`). */
  def cat(sep: String, cols: Column*): Column = concat_ws(sep, cols: _*)
  /** global concat reduction (reference Cat `_str_accessor.py:138-155`);
    * deterministic via sorted order. */
  def catReduce(c: Column, sep: String): Column =
    F.array_join(F.sort_array(F.collect_list(c)), sep)
}

/** pandas `.dt` accessor (reference `_datetime.py:16-76`: 15 methods + 40
  * properties) as a Column extension; same codegen-only rule as StrOps.
  */
object DtOps {
  implicit class RichDtColumn(private val c: Column) extends AnyVal {
    def dtYear: Column = F.year(c)
    def dtMonth: Column = F.month(c)
    def dtDay: Column = F.dayofmonth(c)
    def dtHour: Column = F.hour(c)
    def dtMinute: Column = F.minute(c)
    def dtSecond: Column = F.second(c)
    def dtQuarter: Column = F.quarter(c)
    def dtDayofyear: Column = F.dayofyear(c)
    /** ISO week number (pandas isocalendar().week). */
    def dtWeek: Column = F.weekofyear(c)
    /** pandas convention: Monday=0 .. Sunday=6 (Spark's dayofweek has
      * Sunday=1 .. Saturday=7). */
    def dtDayofweek: Column = (F.dayofweek(c) + 5) % 7
    /** pandas alias: weekday == dayofweek (Monday = 0). */
    def dtWeekday: Column = dtDayofweek
    def dtIsLeapYear: Column = {
      val y = F.year(c)
      y % 4 === 0 && (y % 100 =!= 0 || y % 400 === 0)
    }
    /** time-of-day as HH:mm:ss (no time dtype in Spark; string form). */
    def dtTime: Column = F.date_format(c, "HH:mm:ss")
    /** period end instant (reference `end_time`): start of the NEXT
      * month minus 1 microsecond — monthly freq, matching dtToPeriod.
      * Output is ALWAYS timestamp_ntz: date_trunc coerces NTZ input to
      * LTZ, and the cast back restores the wall-clock form. An LTZ input
      * therefore CHANGES KIND here — its wall clock is read in the
      * session timezone and the zone is dropped (a bare Column cannot
      * inspect its own dataType to branch; the fixture's event
      * timestamps are NTZ, where this is exact). */
    def dtEndTimeMonth: Column =
      (F.date_trunc("month", c) + F.expr("INTERVAL 1 MONTH")
        - F.expr("INTERVAL 1 MICROSECOND")).cast("timestamp_ntz")
    def dtDaysInMonth: Column = F.dayofmonth(F.last_day(c))
    def dtIsMonthStart: Column = F.dayofmonth(c) === 1
    def dtIsMonthEnd: Column = F.dayofmonth(c) === F.dayofmonth(F.last_day(c))
    def dtIsQuarterStart: Column =
      F.dayofmonth(c) === 1 && (F.month(c) - 1) % 3 === 0
    def dtIsQuarterEnd: Column =
      F.to_date(c) === F.to_date(F.last_day(c)) && F.month(c) % 3 === 0
    def dtIsYearStart: Column = F.dayofyear(c) === 1
    def dtIsYearEnd: Column = F.month(c) === 12 && F.dayofmonth(c) === 31
    def dtDate: Column = F.to_date(c)
    /** floor to unit: 'day'/'hour'/'minute'/'second'/'week'/'month'... */
    def dtFloor(unit: String): Column = F.date_trunc(unit, c)
    /** ceil to unit: floor, +1 unit if not already on the boundary. */
    def dtCeil(unit: String): Column = {
      val floored = F.date_trunc(unit, c)
      when(floored === c, c).otherwise(
        floored + F.expr(s"INTERVAL 1 $unit"))
    }
    /** half-up round to unit (pandas dt.round is half-to-even; half-up
      * documented divergence). Micros-exact distances — the previous
      * cast-to-long compared truncated seconds. */
    def dtRound(unit: String): Column = {
      val floored = F.date_trunc(unit, c)
      val ceiled = floored + F.expr(s"INTERVAL 1 $unit")
      val toFloor = DtOps.secondsBetween(floored, c)
      val toCeil = DtOps.secondsBetween(c, ceiled)
      when(toFloor < toCeil, floored).otherwise(ceiled)
    }
    /** strftime via Spark datetime patterns (pandas strftime uses C
      * patterns — callers translate, e.g. %Y-%m-%d → yyyy-MM-dd). */
    def dtStrftime(fmt: String): Column = F.date_format(c, fmt)
    def dtMonthName: Column = F.date_format(c, "MMMM")
    def dtDayName: Column = F.date_format(c, "EEEE")
    def dtNormalize: Column = F.date_trunc("day", c)
    def dtEpochSeconds: Column = F.unix_timestamp(c)
    def dtTzConvert(tz: String): Column = F.from_utc_timestamp(c, tz)
    def dtTzToUtc(tz: String): Column = F.to_utc_timestamp(c, tz)

    // ---- breadth additions (reference `_datetime.py:16-76`) ----

    /** microseconds within the current second (pandas .dt.microsecond). */
    def dtMicrosecond: Column = F.date_format(c, "SSSSSS").cast("int")
    /** nanos within the current microsecond — identically 0 at the µs
      * resolution Spark timestamps carry (honest, not a stub). */
    def dtNanosecond: Column = F.lit(0)
    /** ISO weekday Monday=1..Sunday=7 (isocalendar().day). */
    def dtIsoDow: Column = (F.dayofweek(c) + 5) % 7 + 1
    /** ISO week-numbering year = calendar year of that week's Thursday
      * ('YYYY' week-year patterns are rejected by Spark's formatter). */
    def dtIsoYear: Column =
      F.year(F.date_add(F.to_date(c), F.lit(4) - ((F.dayofweek(c) + 5) % 7 + 1)))
    /** pandas isocalendar(): (year, week, day) struct. */
    def dtIsoCalendar: Column =
      F.struct(dtIsoYear.as("year"), F.weekofyear(c).as("week"), dtIsoDow.as("day"))
    /** pandas to_period(freq).strftime analog: the period label string. */
    def dtToPeriod(freq: String): Column = freq.toUpperCase match {
      case "M" => F.date_format(c, "yyyy-MM")
      case "Q" => F.concat(F.year(c).cast("string"), F.lit("Q"),
        F.quarter(c).cast("string"))
      case "Y" | "A" => F.year(c).cast("string")
      case "W" => F.concat(dtIsoYear.cast("string"), F.lit("-W"),
        F.lpad(F.weekofyear(c).cast("string"), 2, "0"))
      case "D" => F.date_format(c, "yyyy-MM-dd")
      case u => throw new IllegalArgumentException(s"to_period: unsupported freq '$u'")
    }
    /** pandas tz_localize(tz): interpret this NAIVE wall time as being in
      * `tz`; the result is the corresponding absolute instant (Spark's
      * UTC-internal TimestampType) — unlike r2's dtTzConvert, which goes
      * the other direction (instant → wall time in tz). */
    def dtTzLocalize(tz: String): Column = F.to_utc_timestamp(c, tz)
  }

  /** timedelta(b - a).total_seconds(), micros-exact (pandas timedelta
    * accessor; Spark's day-time interval has no direct seconds cast that
    * keeps the fraction portable across engines). */
  def secondsBetween(a: Column, b: Column): Column =
    (F.unix_micros(b.cast("timestamp")) - F.unix_micros(a.cast("timestamp")))
      .cast("double") / 1e6
}
