package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the query library.
  *
  * Determinism discipline (SURVEY.md §5): every oracle-checked query has a
  * total row ordering, and every floating-point aggregate goes through an
  * exact decimal cast *before* the sum so that Spark and the DuckDB oracle
  * produce bit-identical results regardless of partial-aggregation order.
  * The source doubles carry at most 2 decimal digits (prices, discounts) so
  * `cast(decimal(18,s))` recovers the intended exact value; sums of decimals
  * are exact integers scaled by 10^-s in both engines.
  */
package object queries {
  /** A named query: (session, scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Exact 2-dec decimal view of a source double column (price, qty...). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal of a derived product with s decimal digits. */
  def decN(c: Column, s: Int): Column = c.cast(DecimalType(18, s))

  /** Order-insensitive exact sum of a 2-dec money column, fixed out type. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast(DecimalType(18, 2))

  /** Deterministic mean: exact decimal sum, cast to double, divided by n.
    * Both engines compute the identical double. */
  def avgMoney(c: Column): Column =
    sum(dec2(c)).cast("double") / count(lit(1))
}
