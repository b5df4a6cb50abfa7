package graft.analysis

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis pack for LLM training-data pipelines (north star):
  * language ID, quality scoring, token counting, fingerprinting,
  * token-set similarity. All pure column expressions (codegen'd, no
  * UDFs) — each scales as a single narrow projection + hash agg.
  *
  * Ratio outputs are emitted as scaled integers (`*_e4` = value×10⁴,
  * floored): int/int division is bitwise-identical across engines, so
  * flooring it is deterministic (see graft.functions.Canon).
  */
object TextQueries extends QueryPack {

  /** Non-overlapping occurrence count of `w` in `c` via the replace-length
    * trick — identical leftmost-non-overlapping semantics in Spark and
    * DuckDB, and cheaper than regexp at 100 TB. */
  private def occurrences(c: Column, w: String): Column =
    ((length(c) - length(replace(c, lit(w), lit("")))) / w.length).cast(LongType)

  private def e4(c: Column): Column = floor(c * 10000 + 0.5).cast(LongType)

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "t01_langid",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Marker-token heuristic language ID: score = occurrences of
        // language-marker words; argmax with fixed priority order. (The
        // synthetic corpus is English-vocab throughout — the operator
        // contract is the deterministic scoring pipeline, not accuracy.)
        val txt = concat(lit(" "), col("text"), lit(" "))
        val sEn = occurrences(txt, " the ") + occurrences(txt, " a ")
        val sData = occurrences(txt, " data ") + occurrences(txt, " row ")
        val sQuery = occurrences(txt, " query ") + occurrences(txt, " join ")
        t.documents.select(
          col("doc_id"), col("lang"),
          sEn.as("score_en"), sData.as("score_data"), sQuery.as("score_query"),
          when(sEn >= sData && sEn >= sQuery, "en")
            .when(sData >= sQuery, "dataish")
            .otherwise("queryish").as("pred_lang"))
      },
      Some("""SELECT doc_id, lang,
             |  s_en AS score_en, s_data AS score_data, s_query AS score_query,
             |  CASE WHEN s_en >= s_data AND s_en >= s_query THEN 'en'
             |       WHEN s_data >= s_query THEN 'dataish'
             |       ELSE 'queryish' END AS pred_lang
             |FROM (
             |  SELECT doc_id, lang,
             |    CAST((length(t) - length(replace(t, ' the ', ''))) / 5
             |       + (length(t) - length(replace(t, ' a ', ''))) / 3 AS BIGINT) AS s_en,
             |    CAST((length(t) - length(replace(t, ' data ', ''))) / 6
             |       + (length(t) - length(replace(t, ' row ', ''))) / 5 AS BIGINT) AS s_data,
             |    CAST((length(t) - length(replace(t, ' query ', ''))) / 7
             |       + (length(t) - length(replace(t, ' join ', ''))) / 6 AS BIGINT) AS s_query
             |  FROM (SELECT doc_id, lang, ' ' || text || ' ' AS t FROM documents))""".stripMargin),
      "North star: n-gram/marker heuristic language ID over documents"),

    GraftQuery(
      "t02_quality",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val txt = concat(lit(" "), col("text"), lit(" "))
        val nTokens = size(split(col("text"), " ")).cast(LongType)
        val nStop = occurrences(txt, " the ") + occurrences(txt, " a ") +
          occurrences(txt, " of ")
        val nChars = length(col("text")).cast(LongType)
        val alnum = length(regexp_replace(col("text"), "[^a-z0-9 ]", "")).cast(LongType)
        t.documents.select(
          col("doc_id"),
          nChars.as("n_chars_m"),
          nTokens.as("n_tokens"),
          e4(nStop.cast("double") / nTokens).as("stopword_ratio_e4"),
          e4((nChars - alnum).cast("double") / nChars).as("punct_ratio_e4"),
          e4(nChars.cast("double") / nTokens).as("avg_token_len_e4"),
          // composite quality gate: long enough, not stopword-soup
          (nTokens >= 20 && (nStop.cast("double") / nTokens) < lit(0.5)).as("quality_ok"))
      },
      Some("""SELECT doc_id, n_chars_m, n_tokens,
             |  CAST(floor(n_stop * 1.0 / n_tokens * 10000 + 0.5) AS BIGINT) AS stopword_ratio_e4,
             |  CAST(floor((n_chars_m - alnum) * 1.0 / n_chars_m * 10000 + 0.5) AS BIGINT) AS punct_ratio_e4,
             |  CAST(floor(n_chars_m * 1.0 / n_tokens * 10000 + 0.5) AS BIGINT) AS avg_token_len_e4,
             |  (n_tokens >= 20 AND n_stop * 1.0 / n_tokens < 0.5) AS quality_ok
             |FROM (
             |  SELECT doc_id,
             |    CAST(length(text) AS BIGINT) AS n_chars_m,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    CAST((length(t) - length(replace(t, ' the ', ''))) / 5
             |       + (length(t) - length(replace(t, ' a ', ''))) / 3
             |       + (length(t) - length(replace(t, ' of ', ''))) / 4 AS BIGINT) AS n_stop,
             |    CAST(length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS alnum
             |  FROM (SELECT *, ' ' || text || ' ' AS t FROM documents))""".stripMargin),
      "North star: quality scoring — length/stopword/punct ratios + gate"),

    GraftQuery(
      "t03_tokens",
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.documents.select(
          col("doc_id"),
          size(split(col("text"), " ")).as("n_ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("n_re_tokens"),
          size(array_distinct(split(col("text"), " "))).as("n_distinct_tokens"))
      },
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_ws_tokens,
             |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re_tokens,
             |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
             |FROM documents""".stripMargin),
      "North star: token counting — whitespace + regex + distinct"),

    GraftQuery(
      "t04_fingerprint",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Content-defined fingerprint: md5 of the normalized token stream.
        // (The rolling-hash variant lives in functions.RollingHash and is
        // covered by its own ScalaTest; md5 keeps this oracle-checkable.)
        t.documents.select(
          col("doc_id"),
          md5(concat_ws(" ", split(lower(trim(col("text"))), "\\s+"))).as("fingerprint"),
          substring(md5(col("text")), 1, 8).as("fp_head"))
      },
      Some("""SELECT doc_id,
             |  md5(array_to_string(regexp_split_to_array(lower(trim(text)), '\s+'), ' ')) AS fingerprint,
             |  substring(md5(text), 1, 8) AS fp_head
             |FROM documents""".stripMargin),
      "North star: document fingerprinting (normalized-content hash)"),

    GraftQuery(
      "t05_jaccard_adjacent",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Token-set Jaccard between doc i and doc i+1 — the verifiable core
        // of n-gram-Jaccard near-dup detection (full pair mining is the
        // MinHash-LSH path in DedupQueries). Pairs with empty intersection
        // are dropped on both sides.
        val toks = t.documents.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("toks"))
        val a = toks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
        val b = toks.select((col("doc_id") - 1).as("doc_a"), col("toks").as("toks_b"))
        a.join(b, "doc_a")
          .select(col("doc_a"),
                  size(array_intersect(col("toks_a"), col("toks_b"))).as("n_inter"),
                  size(array_union(col("toks_a"), col("toks_b"))).as("n_union"))
          .filter(col("n_inter") > 0)
          .select(col("doc_a"), col("n_inter"), col("n_union"),
                  e4(col("n_inter").cast("double") / col("n_union")).as("jaccard_e4"))
      },
      Some("""WITH tok AS (
             |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
             |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS doc_a, count(*) AS n_inter
             |  FROM tok a JOIN tok b ON b.doc_id = a.doc_id + 1 AND b.w = a.w
             |  GROUP BY a.doc_id)
             |SELECT i.doc_a, i.n_inter,
             |  (ca.n + cb.n - i.n_inter) AS n_union,
             |  CAST(floor(i.n_inter * 1.0 / (ca.n + cb.n - i.n_inter) * 10000 + 0.5) AS BIGINT) AS jaccard_e4
             |FROM inter i
             |JOIN cnt ca ON ca.doc_id = i.doc_a
             |JOIN cnt cb ON cb.doc_id = i.doc_a + 1""".stripMargin),
      "North star: token-set Jaccard similarity (adjacent-pair differential)"),

    GraftQuery(
      "t06_rolling_fingerprint",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Winnowing-style fingerprint via the native RollingHashMin
        // codegen expression. The oracle re-derives the identical
        // Karp–Rabin min (Base 257, mod 1e9+7) in pure SQL: a recursive
        // CTE of power-of-base terms and an O(n·w) window self-join —
        // the engine's O(n) rolling recurrence and the oracle's direct
        // polynomial sum agree exactly in modular arithmetic. Document
        // text is ASCII, so DuckDB code points == the UTF-8 bytes the
        // expression hashes. Also pinned algorithmically by RollingHashSpec.
        t.documents
          .select(col("doc_id"),
            graft.functions.RollingHashMin.rollingHashMin(col("text"), 32).as("rh_min"),
            graft.functions.RollingHashMin.rollingHashMin(lower(trim(col("text"))), 16)
              .as("rh_min16"))
      },
      Some("""WITH RECURSIVE pw(k, p) AS (
             |  SELECT 0, CAST(1 AS BIGINT)
             |  UNION ALL
             |  SELECT k + 1, (p * 257) % 1000000007 FROM pw WHERE k < 31
             |),
             |d32 AS (SELECT doc_id, text AS s FROM documents),
             |b32 AS (
             |  SELECT doc_id, s, length(s) AS n, least(32, length(s)) AS w,
             |         unnest(range(1, length(s) + 1)) AS i
             |  FROM d32
             |),
             |v32 AS (SELECT doc_id, n, w, i, ord(s[i]) AS byte FROM b32),
             |h32 AS (
             |  SELECT a.doc_id, a.i AS start, (sum(b.byte * pw.p) % 1000000007) AS h
             |  FROM v32 a
             |  JOIN v32 b ON b.doc_id = a.doc_id AND b.i >= a.i AND b.i < a.i + a.w
             |  JOIN pw ON pw.k = a.w - 1 - (b.i - a.i)
             |  WHERE a.i <= a.n - a.w + 1
             |  GROUP BY a.doc_id, a.i
             |),
             |m32 AS (SELECT doc_id, min(h) AS rh_min FROM h32 GROUP BY doc_id),
             |d16 AS (SELECT doc_id, lower(trim(text)) AS s FROM documents),
             |b16 AS (
             |  SELECT doc_id, s, length(s) AS n, least(16, length(s)) AS w,
             |         unnest(range(1, length(s) + 1)) AS i
             |  FROM d16
             |),
             |v16 AS (SELECT doc_id, n, w, i, ord(s[i]) AS byte FROM b16),
             |h16 AS (
             |  SELECT a.doc_id, a.i AS start, (sum(b.byte * pw.p) % 1000000007) AS h
             |  FROM v16 a
             |  JOIN v16 b ON b.doc_id = a.doc_id AND b.i >= a.i AND b.i < a.i + a.w
             |  JOIN pw ON pw.k = a.w - 1 - (b.i - a.i)
             |  WHERE a.i <= a.n - a.w + 1
             |  GROUP BY a.doc_id, a.i
             |),
             |m16 AS (SELECT doc_id, min(h) AS rh_min16 FROM h16 GROUP BY doc_id)
             |SELECT d.doc_id,
             |       CAST(coalesce(m32.rh_min, 0) AS BIGINT) AS rh_min,
             |       CAST(coalesce(m16.rh_min16, 0) AS BIGINT) AS rh_min16
             |FROM documents d
             |LEFT JOIN m32 ON m32.doc_id = d.doc_id
             |LEFT JOIN m16 ON m16.doc_id = d.doc_id""".stripMargin),
      "North star: rolling-hash (Karp–Rabin winnowing) fingerprint, codegen expression"),

    GraftQuery(
      "t07_top_terms",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Per-doc top-3 distinctive terms by (tf DESC, df ASC, token ASC)
        // — the TF-IDF ordering without the transcendental: ln() differs
        // across engines in the last ulp, which a fixed-point hash gate
        // can't tolerate, and for a TOP-K the rank order (high tf, rare
        // term) is the information. Token uniqueness per doc makes the
        // sort total, so row_number is deterministic. Scale shape: two
        // linear shuffles (by (doc, token) then token) + a per-doc window
        // whose partitions are token-count-bounded.
        val tok = t.documents
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .filter(length(col("token")) > 0)
        val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df = tok.select("doc_id", "token").distinct()
          .groupBy("token").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("token").asc)
        tf.join(df, "token")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("token"), col("tf"), col("df"), col("rnk"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |tok2 AS (SELECT doc_id, token FROM tok WHERE length(token) > 0),
             |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok2 GROUP BY 1, 2),
             |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY 1)
             |SELECT doc_id, token, tf, df, rnk FROM (
             |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
             |    row_number() OVER (PARTITION BY tf.doc_id
             |      ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS rnk
             |  FROM tf JOIN df USING (token))
             |WHERE rnk <= 3""".stripMargin),
      "North star: per-doc top-k distinctive terms (tf/df rank, float-free TF-IDF)"),

    GraftQuery(
      "t08_sequence_pack",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Training-sequence packing: greedily bin documents into
        // fixed-token-budget sequences. Packing is SHARD-LOCAL (shard =
        // doc_id % 8): a global greedy pack would need a single-partition
        // running sum — the scale-correct distributed form packs within
        // shards (each shard's window is independent), which is how a
        // 100 TB corpus packs on 1000 executors. Emits per-bin stats.
        val budget = 512L
        val toks = t.documents.select(col("doc_id"),
          (col("doc_id") % 8).as("shard"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val binned = toks.withColumn("bin",
          floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget)
            .cast(LongType))
        binned.groupBy("shard", "bin")
          .agg(count(lit(1)).as("n_docs"),
               sum(col("n_tokens")).as("n_tokens"),
               min(col("doc_id")).as("first_doc"),
               max(col("doc_id")).as("last_doc"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, doc_id % 8 AS shard,
             |    len(string_split(text, ' ')) AS n_tokens
             |  FROM documents),
             |binned AS (
             |  SELECT doc_id, shard, n_tokens,
             |    CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY shard
             |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      / 512) AS BIGINT) AS bin
             |  FROM toks)
             |SELECT shard, bin, count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
             |FROM binned GROUP BY 1, 2""".stripMargin),
      "North star: shard-local training-sequence packing into fixed token budgets"))
}
