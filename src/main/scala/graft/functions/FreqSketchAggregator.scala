package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequent-items (heavy-hitters) summary — Misra–Gries with
  * the Agarwal-et-al merge rule (Mergeable Summaries, PODS'12), as a
  * typed `Aggregator` (SURVEY U5 family; the sketch sibling of q17's
  * HLL/quantile tier).
  *
  * State is AT MOST `2k` (key, count) entries per partition — never the
  * key universe. Compaction (on overflow and on merge) takes the
  * (k+1)-th largest counter value `t`, subtracts it from every counter,
  * and drops non-positives. Each compaction removes ≥ (k+1)·t of total
  * weight, so the sum of all `t`s — and therefore any single key's
  * underestimate — is ≤ n/(k+1). That yields the two guarantees the
  * q78 audit asserts:
  *
  *   - every key with true count > n/(k+1) is present in the summary
  *     (its counter stays positive through every compaction);
  *   - every estimate satisfies est ≤ true ≤ est + n/(k+1).
  *
  * Both hold for ANY partitioning and merge order, which is what makes
  * the boolean audits deterministic even though the summary's exact
  * contents are merge-order dependent — the reason q78 exposes audits,
  * not raw sketch entries, to the oracle. At 100 TB: the shuffle
  * carries one ≤2k-entry map per partition instead of the full key
  * cardinality — heavy-hitter detection over a firehose whose distinct
  * keys would never fit a hash aggregate.
  */
final class FreqSketchAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  /** Subtract the (k+1)-th largest counter from all; keep positives.
    * No-op when ≤ k entries. */
  private def compact(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val t = m.values.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
      m.collect { case (key, c) if c > t => key -> (c - t) }
    }

  /** O(1) insert; compaction amortized over ≥ k inserts (triggered at
    * 2k, compacts to ≤ k — the bound argument is per-compaction, so the
    * lazy trigger costs nothing in accuracy). */
  override def reduce(b: Map[String, Long], key: String): Map[String, Long] = {
    val grown = b.updated(key, b.getOrElse(key, 0L) + 1L)
    if (grown.size >= 2 * k) compact(grown) else grown
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    val combined = small.foldLeft(large) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    compact(combined)
  }

  /** Final compaction to the k-entry contract; (est desc, key) order so
    * the output is deterministic GIVEN the final summary. */
  override def finish(b: Map[String, Long]): Seq[(String, Long)] =
    compact(b).toSeq.sortBy { case (key, c) => (-c, key) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
