package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named query: the Spark implementation plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB (SURVEY.md §5.1). Queries
  * without an oracle get the driver's weaker rows-only check.
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Cross-engine determinism helpers (used by both the Spark side here and,
  * by construction, the DuckDB oracle texts):
  *
  *  - double aggregation: floating-point `sum()` is order-dependent, and
  *    Spark and DuckDB sum in different orders. Casting each addend to a
  *    wide decimal first makes the sum EXACT (order-independent), and the
  *    final cast back to double is then bit-identical in both engines.
  *  - hashing: `md5` produces identical hex in Spark, DuckDB, and Python —
  *    every hash-derived operator (fingerprints, stand-in classifier,
  *    minhash) is built on it.
  *  - every query ORDER BYs a total key so row order can never differ.
  */
object OracleCompat {
  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 8))).cast("double")

  /** Exact average: exact decimal sum / count, both sides compute the same
    * double division.
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** The md5-derived 0..15 label used by the deterministic classifier.
    * Spark side: `conv(hex_digit, 16, 10)`; DuckDB oracle side:
    * `instr('0123456789abcdef', hex_digit) - 1` — same value, bigint.
    */
  def md5Label(c: Column, numLabels: Int = 16): Column =
    conv(substring(md5(c), 1, 1), 16, 10).cast("long") % numLabels

  def md5Score(c: Column): Column =
    conv(substring(md5(c), 2, 1), 16, 10).cast("long") / lit(15.0)
}
