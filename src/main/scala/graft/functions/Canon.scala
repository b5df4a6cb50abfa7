package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-engine deterministic canonicalization for money-like doubles.
  *
  * `round(x, 2)` is engine-divergent on exact `.xx5` boundaries: Spark
  * rounds the shortest decimal representation HALF_UP, DuckDB rounds the
  * binary double. TPC-H-style data (2-decimal prices × 2-decimal
  * discounts) lands on those boundaries constantly. The fix is to leave
  * the "round a double" operation out of the contract entirely:
  *
  *   - row-level money → integer cents: `floor(x*100 + 0.5)` — the IEEE
  *     product is bitwise-identical in every engine, and floor of it is
  *     exact;
  *   - money sums → sum of integer cents (exact, order-independent,
  *     overflow-safe in BIGINT up to ~9e16 cents);
  *   - money averages → `floor(avg(cents) + 0.5)`: the cent sum is an
  *     exact integer, so the division is the same double everywhere.
  *
  * SQL equivalents (DuckDB): `CAST(floor(x*100 + 0.5) AS BIGINT)`, etc.
  */
object Canon {

  /** Deterministic integer cents of a money-valued double column. */
  def cents(c: Column): Column =
    floor(c * 100 + 0.5).cast(LongType)

  /** Exact sum of money as integer cents. */
  def sumCents(c: Column): Column = sum(cents(c))

  /** Average of money as integer cents (deterministic across engines). */
  def avgCents(c: Column): Column =
    floor(avg(cents(c)) + 0.5).cast(LongType)

  /** Average of an exactly-representable (integer-valued) double column,
    * scaled to 2 decimals: floor(avg*100+0.5). The sum of integer-valued
    * doubles is exact, so avg is the same double in every engine. */
  def avgExactC2(c: Column): Column =
    floor(avg(c) * 100 + 0.5).cast(LongType)
}
