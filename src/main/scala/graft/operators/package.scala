package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.types._

/** Shared helpers for oracle-parity arithmetic (SURVEY.md §4).
  *
  * Testdata money/rate columns are exactly-2-decimal doubles. Summing
  * doubles directly is order-dependent (not bit-reproducible across
  * engines), so both our Spark plans and the DuckDB oracle SQL cast to
  * tight DECIMAL types first, aggregate exactly, and cast the final
  * result back to DOUBLE. Tight precisions keep every intermediate
  * product within DECIMAL(38,_) in BOTH engines — no precision-loss
  * rounding on either side.
  */
package object operators {
  /** money-like column (≤ 9,999,999,999.99). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** rate-like column in [0, 99.99]: discount, tax. */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  /** quantity-like column. */
  def qty(c: Column): Column = c.cast(DecimalType(8, 2))
}
