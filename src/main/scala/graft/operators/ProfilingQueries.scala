package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import graft.functions.Canon
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data observability pack (north star; beyond the reference): the two
  * gates every 100 TB training-data platform runs before a corpus is
  * allowed into a mixture — a one-pass per-column TABLE PROFILE and a
  * declarative CONSTRAINT VALIDATION report (the Deequ/expectations
  * shape, engine-native).
  *
  * The reference has no profiling surface at all; its closest analog is
  * the ad-hoc dashboard COUNT(*) queries (vehicle_counting_app.py:38-47).
  * Here both gates are Spark-first: the profile builds its aggregate
  * list PROGRAMMATICALLY from `df.schema` (any table profiles without
  * code changes), and every metric is emitted with the Canon
  * cross-engine representation so the whole report diffs against the
  * DuckDB oracle exactly.
  */
object ProfilingQueries extends QueryPack {

  /** Canonical cross-engine string representation of a column's
    * min/max by dtype: integers cast, money as integer cents
    * ([[Canon.cents]]), timestamps at second precision, strings as-is.
    * Mirrors the SQL forms documented in Canon's scaladoc. */
  private def repr(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType               => Canon.cents(c).cast(StringType)
    case TimestampType | TimestampNTZType     => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case DateType                             => date_format(c, "yyyy-MM-dd")
    case _                                    => c.cast(StringType)
  }

  /** Per-column (n_rows, n_null, n_distinct, min_repr, max_repr) of ANY
    * DataFrame in ONE job — the library entry behind q84. The aggregate
    * list is generated from `df.schema`, so no code changes per table.
    *
    * Scale shape: a single scan; the k exact count(DISTINCT col)
    * aggregates compile to one Expand (k× multiplication of PRUNED
    * (gid, value) pairs in the shuffle — never the full row). At 100 TB
    * the exact distincts swap for the q17 HLL tier (a profile needs
    * cardinality ESTIMATES; q17 pins the error bounds) while
    * null/min/max stay exact in the same pass.
    *
    * Genericity (spec-pinned on an adversarial schema): source columns
    * are addressed through backtick quoting (a name containing '.' must
    * not parse as a nested-field path) and every generated alias
    * carries a reserved `__p_` prefix plus a positional index, so a
    * profiled table may itself contain columns named n_rows/col_name. */
  def profile(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val fields = df.schema.fields.toSeq
    def a(i: Int, kind: String) = s"__p_${i}_$kind"
    def q(name: String) = col(s"`$name`")
    val aggs: Seq[Column] = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = q(f.name)
      // repr AFTER min/max: the extremum must be found in the column's
      // native ordering (a lexicographic min of "999" vs "1499" is
      // wrong), then rendered canonically.
      Seq(count(c).as(a(i, "nn")),
          countDistinct(c).as(a(i, "nd")),
          repr(min(c), f.dataType).as(a(i, "min")),
          repr(max(c), f.dataType).as(a(i, "max")))
    }
    df.agg(count(lit(1)).as("__p_rows"), aggs: _*)
      .select(col("__p_rows"), explode(array(fields.zipWithIndex.map { case (f, i) =>
        struct(
          lit(f.name).as("col_name"),
          (col("__p_rows") - col(a(i, "nn"))).as("n_null"),
          col(a(i, "nd")).as("n_distinct"),
          col(a(i, "min")).as("min_repr"),
          col(a(i, "max")).as("max_repr"))
      }: _*)).as("m"))
      .select(col("m.col_name").as("col_name"), col("__p_rows").as("n_rows"),
        col("m.n_null").as("n_null"), col("m.n_distinct").as("n_distinct"),
        col("m.min_repr").as("min_repr"), col("m.max_repr").as("max_repr"))
      .orderBy("col_name")
  }

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q84_table_profile",
      (spark, dir) => profile(Tables(spark, dir).orders),
      Some("""WITH p AS (
             |  SELECT count(*) AS n_rows,
             |    count(o_orderkey) AS k_nn, count(DISTINCT o_orderkey) AS k_nd,
             |      CAST(min(o_orderkey) AS VARCHAR) AS k_min, CAST(max(o_orderkey) AS VARCHAR) AS k_max,
             |    count(o_custkey) AS c_nn, count(DISTINCT o_custkey) AS c_nd,
             |      CAST(min(o_custkey) AS VARCHAR) AS c_min, CAST(max(o_custkey) AS VARCHAR) AS c_max,
             |    count(o_orderstatus) AS s_nn, count(DISTINCT o_orderstatus) AS s_nd,
             |      min(o_orderstatus) AS s_min, max(o_orderstatus) AS s_max,
             |    count(o_totalprice) AS t_nn, count(DISTINCT o_totalprice) AS t_nd,
             |      CAST(CAST(floor(min(o_totalprice)*100 + 0.5) AS BIGINT) AS VARCHAR) AS t_min,
             |      CAST(CAST(floor(max(o_totalprice)*100 + 0.5) AS BIGINT) AS VARCHAR) AS t_max,
             |    count(o_orderdate) AS d_nn, count(DISTINCT o_orderdate) AS d_nd,
             |      strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS d_min,
             |      strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS d_max,
             |    count(o_orderpriority) AS pr_nn, count(DISTINCT o_orderpriority) AS pr_nd,
             |      min(o_orderpriority) AS pr_min, max(o_orderpriority) AS pr_max
             |  FROM orders)
             |SELECT col_name, n_rows, n_null, n_distinct, min_repr, max_repr FROM (
             |  SELECT 'o_orderkey' AS col_name, n_rows, n_rows - k_nn AS n_null,
             |         k_nd AS n_distinct, k_min AS min_repr, k_max AS max_repr FROM p
             |  UNION ALL
             |  SELECT 'o_custkey', n_rows, n_rows - c_nn, c_nd, c_min, c_max FROM p
             |  UNION ALL
             |  SELECT 'o_orderstatus', n_rows, n_rows - s_nn, s_nd, s_min, s_max FROM p
             |  UNION ALL
             |  SELECT 'o_totalprice', n_rows, n_rows - t_nn, t_nd, t_min, t_max FROM p
             |  UNION ALL
             |  SELECT 'o_orderdate', n_rows, n_rows - d_nn, d_nd, d_min, d_max FROM p
             |  UNION ALL
             |  SELECT 'o_orderpriority', n_rows, n_rows - pr_nn, pr_nd, pr_min, pr_max FROM p)
             |ORDER BY col_name""".stripMargin),
      "North star: one-pass schema-driven table profile — per-column nulls/cardinality/bounds, Canon reprs"),

    GraftQuery(
      "q85_quality_constraints",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Declarative constraint report — the pre-training data GATE:
        // every row-local constraint (uniqueness arithmetic, null,
        // range, domain) folds into ONE conditional aggregate over ONE
        // scan; the referential check is the only second relation and
        // runs as an anti-join against the dim (broadcast wherever the
        // dim fits — customer keys at 100 TB are still dim-sized; else
        // it degrades to a shuffled semi-diff, never a cartesian).
        // The report EMITS violation counts rather than throwing: a
        // platform gate decides per-constraint severity downstream.
        val o = t.orders
        val base = o.agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("nd_key"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpos_price"),
          sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
            .as("bad_status"))
        val custKeys = t.customer.select(col("c_custkey").as("o_custkey"))
        val orphans = o.join(custKeys, Seq("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        def row(name: String, checked: Column, viol: Column) =
          struct(lit(name).as("constraint"), checked.as("n_checked"),
                 viol.as("n_violations"), (viol === 0L).as("passed"))
        base.crossJoin(broadcast(orphans))
          .select(explode(array(
            row("domain:o_orderstatus in {F,O,P}", col("n"), col("bad_status")),
            row("fk:o_custkey->customer.c_custkey", col("n"), col("n_orphans")),
            row("not_null:o_custkey", col("n"), col("null_cust")),
            row("pk_unique:o_orderkey", col("n"), col("n") - col("nd_key")),
            row("range:o_totalprice>0", col("n"), col("nonpos_price")))).as("r"))
          .select(col("r.constraint").as("constraint"),
            col("r.n_checked").as("n_checked"),
            col("r.n_violations").as("n_violations"), col("r.passed").as("passed"))
          .orderBy("constraint")
      },
      Some("""WITH b AS (
             |  SELECT count(*) AS n,
             |    count(DISTINCT o_orderkey) AS nd_key,
             |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cust,
             |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_price,
             |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
             |  FROM orders),
             |orph AS (
             |  SELECT count(*) AS n_orphans FROM orders o
             |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
             |SELECT "constraint", n_checked, n_violations, n_violations = 0 AS passed FROM (
             |  SELECT 'domain:o_orderstatus in {F,O,P}' AS "constraint",
             |         n AS n_checked, bad_status AS n_violations FROM b
             |  UNION ALL
             |  SELECT 'fk:o_custkey->customer.c_custkey', b.n, orph.n_orphans FROM b, orph
             |  UNION ALL
             |  SELECT 'not_null:o_custkey', n, null_cust FROM b
             |  UNION ALL
             |  SELECT 'pk_unique:o_orderkey', n, n - nd_key FROM b
             |  UNION ALL
             |  SELECT 'range:o_totalprice>0', n, nonpos_price FROM b)
             |ORDER BY "constraint"""".stripMargin),
      "North star: declarative constraint report — one conditional agg + dim anti-join, counts not throws"))
}
