package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables.
  *
  * Contract notes (driver correctness gate):
  *   - column names must match between the Spark result and the oracle SQL
  *     (driver sorts columns by name before hashing) — alias everything;
  *   - double-valued aggregates are rounded on BOTH sides to absorb
  *     FP summation-order differences between engines;
  *   - temporal group keys are emitted as formatted strings (events.ts is
  *     nanosecond-precision parquet; Spark truncates to micros while DuckDB
  *     keeps nanos — strings sidestep the representation mismatch);
  *   - nondeterministic orderings are always tie-broken by a key column.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryPack {
  def queries: Seq[GraftQuery]
}
