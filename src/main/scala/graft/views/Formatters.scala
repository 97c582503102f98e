package graft.views

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Output-formatting layer (SURVEY.md §2.7 F10): the dashboard's
  * presentation helpers (`apps/streamlit-dashboard/app.py:63-75,
  * 151-156`) as Column functions. Deliberately OUTSIDE the engine
  * core — these are edge formatters applied at display time, never in
  * analytical plans (string-typed money can't aggregate). All
  * built-ins → codegen'd.
  */
object Formatters {

  /** `format_currency` (`app.py:63-65`): `$93,421.17`, em-dash for
    * null. */
  def formatCurrency(c: Column): Column =
    when(c.isNull, lit("—"))
      .otherwise(concat(lit("$"), format_number(c.cast("double"), 2)))

  /** `pct_str` (`app.py:72-75`): signed two-decimal percent,
    * `+5.26%` / `-3.10%`, em-dash for null. */
  def pctStr(c: Column): Column =
    when(c.isNull, lit("—"))
      .otherwise(format_string("%+.2f%%", c.cast("double")))

  /** `format_compact` is a dead no-op in the reference (`app.py:67-70`
    * returns its input); implemented for real here: 1.85T / 3.12B /
    * 45.00M / 12.30K with two decimals, em-dash for null. */
  def formatCompact(c: Column): Column = {
    val d = c.cast("double")
    when(c.isNull, lit("—"))
      .when(abs(d) >= 1e12, format_string("%.2fT", d / 1e12))
      .when(abs(d) >= 1e9, format_string("%.2fB", d / 1e9))
      .when(abs(d) >= 1e6, format_string("%.2fM", d / 1e6))
      .when(abs(d) >= 1e3, format_string("%.2fK", d / 1e3))
      .otherwise(format_string("%.2f", d))
  }

  /** Timestamp display format (`app.py:156`: `strftime("%Y-%m-%d %H:%M")`). */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm")
}
