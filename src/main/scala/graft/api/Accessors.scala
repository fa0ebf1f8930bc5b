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
    def strRepeat(n: Int): Column = F.repeat(c, n)
    def strReverse: Column = F.reverse(c)
    def strIsdigit: Column = c.rlike("^[0-9]+$")
    def strIsalpha: Column = c.rlike("^[A-Za-z]+$")
    def strIsalnum: Column = c.rlike("^[A-Za-z0-9]+$")
    def strIsspace: Column = c.rlike("^\\s+$")
    def strIslower: Column = c === F.lower(c) && c.rlike("[A-Za-z]")
    def strIsupper: Column = c === F.upper(c) && c.rlike("[A-Za-z]")
  }

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
    /** half-up round to unit (pandas dt.round). */
    def dtRound(unit: String): Column = {
      val floored = F.date_trunc(unit, c)
      val ceiled = floored + F.expr(s"INTERVAL 1 $unit")
      val toFloor = c.cast("long") - floored.cast("long")
      val toCeil = ceiled.cast("long") - c.cast("long")
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
  }
}
