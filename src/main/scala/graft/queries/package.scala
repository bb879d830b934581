package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the query library.
  *
  * Determinism discipline (SURVEY.md §5): every oracle-checked query has a
  * total row ordering, and every final output column is one of
  * double / long / string / timestamp(micros) — never DecimalType. The
  * source doubles are arbitrary 64-bit values (NOT 2-decimal-representable
  * in general), so any double→decimal cast is a genuine rounding whose tie
  * behavior is engine-specific. Instead, measures are snapped onto an exact
  * integer grid with pure IEEE-754 arithmetic — `floor(x*scale + 0.5)` —
  * which multiply/add/floor identically in Spark and DuckDB, summed exactly
  * as integers (order-insensitive), and surfaced as DOUBLE with the
  * *identical* expression shape in the oracle SQL.
  */
package object queries {
  /** A named query: (session, scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** ASCII-only lowercasing — the engine's case-folding contract for every
    * tokenizer and fingerprint (SURVEY.md §1): A–Z map to a–z, every other
    * character passes through unchanged. `translate` is a 1:1 codepoint
    * map, codegen'd in Spark and bit-identical in DuckDB, so the contract
    * holds with NO dependence on Unicode case tables. Full-casing `lower()`
    * is NOT cross-engine-safe: Spark/Java applies Unicode full case mapping
    * ('İ' U+0130 → "i̇", the one expanding lowercase mapping, plus the
    * context-sensitive Greek final sigma), DuckDB/utf8proc applies simple
    * mapping ('İ' → "i") — the unicode probe corpus caught 13 queries
    * diverging on exactly this. (The sibling regex-class gap — Java's
    * `\s` includes VT \x0B, RE2's does not — is closed by spelling out
    * Java's class `[ \t\n\x0B\f\r]` in every whitespace oracle.) */
  def asciiLower(c: Column): Column =
    translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")

  /** The same ASCII case fold as [[asciiLower]], as DuckDB oracle SQL over
    * the `text` column — interpolate wherever an oracle tokenizes. */
  val asciiLowerTextSql: String =
    "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"

  /** Snap a measure double onto the exact 1/scale grid as an integral value.
    * floor(x*scale + 0.5) uses only IEEE-754 double multiply/add/floor —
    * bit-identical across engines — and yields an integral double, so the
    * integer conversion that follows is exact everywhere (no engine-specific
    * double→int rounding, no double→decimal tie behavior). */
  def grid(c: Column, scale: Double): Column = floor(c * lit(scale) + lit(0.5))

  /** Money (2-dec) grid in integer cents. */
  def cents(c: Column): Column = grid(c, 100.0)

  /** Order-insensitive, hash-stable sum of a gridded measure: exact integer
    * sum carried in decimal(38,0) (no silent long overflow at 100 TB row
    * counts — the oracle side sums BIGINT into a 128-bit HUGEINT), surfaced
    * as DOUBLE.  Oracle shape:
    * `CAST(sum(CAST(floor(x * <scale> + 0.5) AS BIGINT)) AS DOUBLE) / <scale>`. */
  def gridSum(c: Column, scale: Double): Column =
    sum(grid(c, scale).cast(DecimalType(38, 0))).cast("double") / lit(scale)

  /** 2-dec money sum as DOUBLE. */
  def sumMoney(c: Column): Column = gridSum(c, 100.0)

  /** Deterministic mean over the cent grid; identical double in both
    * engines. Oracle shape:
    * `CAST(sum(CAST(floor(x * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / count(*)`. */
  def avgMoney(c: Column): Column =
    sum(cents(c).cast(DecimalType(38, 0))).cast("double") / lit(100.0) /
      count(lit(1))
}
