package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles (100 TB toolkit).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one join/group key dominates so hard
  * that even split partitions hotspot (the classic null-key / power-law
  * fan-in). Mechanics:
  *
  *   - aggregation: append a deterministic salt to the group key, run the
  *     partial aggregate on (key, salt), then re-aggregate on key — two
  *     shuffles, both balanced;
  *   - join: salt the skewed (large) side deterministically, explode the
  *     small side once per salt value, join on (key, salt).
  *
  * Salts are hash-derived (xxhash64 of stable columns, or pmod of a
  * uniform column) — never rand(): deterministic replay and oracle
  * stability are part of the engine contract.
  */
object Salting {

  /** Deterministic salt in [0, n) from stable row content. */
  def salt(n: Int, cols: Column*): Column = pmod(xxhash64(cols: _*), lit(n))

  /** Skew-safe groupBy-aggregate: partial agg on (keys, salt), final agg
    * on keys. `partials` maps a column to its salted partial + final
    * combiner, e.g. sum→sum, count→sum. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                nSalts: Int, saltFrom: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt",
      salt(nSalts, saltFrom.map(col): _*))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Skew-safe equi-join: salt the large side PER ROW (salting by the
    * join key alone would keep a hot key in one partition — the salt must
    * come from row-distinguishing columns), replicate the small side
    * across all salt values, join on (key, salt).
    *
    * The join is deliberately a SHUFFLED hash join, never broadcast: if
    * the small side fit in a broadcast there would be no shuffle to skew
    * and salting would be pointless overhead. Salting earns its keep
    * exactly when the small side is too big to broadcast but small
    * enough to replicate ×nSalts — the hot key's rows then land on
    * nSalts different reducers instead of one. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 nSalts: Int, saltFrom: Seq[String]): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      salt(nSalts, saltFrom.map(col): _*))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(nSalts - 1L))))
    saltedLarge.join(replicatedSmall.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
