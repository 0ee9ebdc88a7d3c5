package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric stabilization.
  *
  * Rounding a DOUBLE at 4 decimals diverges between engines when the true
  * value sits exactly on a 4th-decimal half (common for averages of
  * low-decimal data: mean of 3-decimal values over n=24 rows = x.xxx75):
  * Spark rounds the exact binary value (BigDecimal), DuckDB multiplies by
  * 10⁴ first and the multiply's own rounding can cross the boundary.
  * Routing through DECIMAL(20,8) first makes both engines round the same
  * 8-decimal representation — double→decimal conversion is correctly
  * rounded and identical on both sides, and half-up vs half-away agree for
  * positive values. The rounded value (4 decimal digits) is cast back to
  * DOUBLE — exact in binary for these magnitudes — so downstream readers
  * see a plain float64 column rather than a parquet DECIMAL, which pandas
  * surfaces as Python Decimal objects and hash-compares unequal to the
  * float64 a SQL engine returns for the same value.
  *
  * SQL equivalent: `CAST(round(CAST(x AS DECIMAL(20,8)), 4) AS DOUBLE)`.
  */
object NumericFunctions {
  def stableRound4(c: Column): Column =
    round(c.cast("decimal(20,8)"), 4).cast("double")
}
