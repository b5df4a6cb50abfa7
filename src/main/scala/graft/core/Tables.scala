package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

import scala.util.control.NonFatal

/** Parquet table catalog over a scale-factor directory
  * (`/root/testdata/sf*` layout — one parquet file per table).
  *
  * All engine queries resolve tables through this catalog so that source
  * concerns (paths, formats, future partitioning/bucketing) stay in one
  * place. Scans are plain `spark.read.parquet` → Catalyst owns column
  * pruning + predicate pushdown (verify via `PushedFilters`/`ReadSchema`
  * in `.explain("formatted")`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def path(name: String): String = s"$dir/$name.parquet"
  def table(name: String): DataFrame = spark.read.parquet(path(name))

  def region: DataFrame   = table("region")
  def nation: DataFrame   = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame     = table("part")
  def orders: DataFrame   = table("orders")
  def lineitem: DataFrame = table("lineitem")

  /** `events` with `ts` canonicalized to TimestampType regardless of how
    * the parquet file spells it. The testdata generator has shipped the
    * column as TIMESTAMP(NANOS) (which Spark 4 refuses outright —
    * [ILLEGAL_PARQUET_TYPE]) and later as timestamp[us] (arriving as
    * TIMESTAMP_NTZ under schema inference); a hardcoded single-spelling
    * workaround took down every events query when the generator switched,
    * so the catalog now adapts per-file instead of assuming.
    */
  def events: DataFrame = Tables.normalizeTs(eventsRaw)

  /** Load `events` with whatever read mode its parquet footer needs.
    * Plain read first; only a NANOS-annotated file (which Spark 4 rejects
    * during schema inference) falls back to the legacy nanos-as-long read
    * — and only then is the legacy conf touched, so sessions over current
    * micros data never carry the global side effect.
    */
  private def eventsRaw: DataFrame =
    try table("events")
    catch {
      case NonFatal(e) if Tables.isNanosTypeError(e) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        table("events")
    }

  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register every table as a temp view so `spark.sql` text queries work.
    * `events` goes through the accessor (ts canonicalization). Per-table
    * fault isolation: one unreadable table must not take down SQL-text
    * queries over the other nine (in round 7 a stale events schema
    * propagated through here to every registered-view query).
    *
    * Returns the names that could NOT be registered, with their root
    * errors, so callers (Bench, Verify) can surface the original read
    * failure next to the first TABLE_OR_VIEW_NOT_FOUND it causes —
    * a later query error over a skipped view otherwise hides the cause.
    */
  def registerAll(): Seq[(String, Throwable)] = {
    val skipped = Tables.names.flatMap { n =>
      try {
        val df = if (n == "events") events else table(n)
        df.createOrReplaceTempView(n)
        None
      } catch { case NonFatal(e) => Some(n -> e) }
    }
    if (skipped.nonEmpty) {
      System.err.println(
        s"[graft.Tables] registerAll: skipped unreadable tables " +
          skipped.map(_._1).mkString("[", ", ", "]") +
          " — run graft.tools.SchemaAudit for named diffs")
      skipped.foreach { case (n, e) =>
        System.err.println(s"[graft.Tables]   $n: ${e.getMessage}")
      }
    }
    skipped
  }

  /** Startup schema audit: compare each table's post-normalization schema
    * against [[Tables.expectedSchemas]] and return one NAMED diff line per
    * mismatch (empty = clean). The round-7 stale-schema failure surfaced
    * as 46 cryptic per-query analysis errors; this turns the same drift
    * into one readable report at catalog load. Extra columns are reported
    * but tolerated by queries (they select by name); missing columns and
    * dtype changes are the real breakage.
    */
  def audit(): Seq[String] =
    Tables.names.flatMap { n =>
      val expected = Tables.expectedSchemas(n)
      val loaded: Either[String, StructType] =
        try Right((if (n == "events") events else table(n)).schema)
        catch { case NonFatal(e) => Left(s"$n: unreadable (${e.getMessage})") }
      loaded match {
        case Left(err) => Seq(err)
        case Right(actual) =>
          val actualByName = actual.fields.map(f => f.name -> f.dataType).toMap
          val missing = expected.collect {
            case (c, dt) if !actualByName.contains(c) =>
              s"$n.$c: missing (expected ${dt.sql})"
          }
          val drifted = expected.collect {
            case (c, dt) if actualByName.get(c).exists(_ != dt) =>
              s"$n.$c: expected ${dt.sql}, got ${actualByName(c).sql}"
          }
          val extra = actual.fields.collect {
            case f if !expected.exists(_._1 == f.name) => s"$n.${f.name}: unexpected extra column (${f.dataType.sql})"
          }
          missing ++ drifted ++ extra
      }
    }
}

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The 80%-of-max-id batch split every incremental-index query shares
    * (d12/d15/s15/s19/st21/st26): rows with id < split are "the existing
    * corpus", rows with id >= split are "the new batch". ONE definition —
    * each query's incremental-vs-full-rerun equivalence argument (and its
    * oracle's matching split CTE) depends on all consumers agreeing on
    * what "the batch" is, so no query derives its own. */
  def incrementalSplitId(df: DataFrame, idCol: String): Long =
    incrementalSplitId(df, idCol, 0.8)

  /** Fraction-parameterized split for the queries that need MORE than
    * one ingest boundary (d16's gate → admit → update → gate lifecycle
    * slices the corpus at 0.6 AND 0.8). Same floor(max*frac) rule — the
    * oracle CTEs replay the identical double arithmetic. */
  def incrementalSplitId(df: DataFrame, idCol: String, frac: Double): Long =
    df.agg(org.apache.spark.sql.functions.floor(
        org.apache.spark.sql.functions.max(col(idCol)) * frac).cast(LongType))
      .head().getLong(0)

  /** Canonicalize an events-style timestamp column to TimestampType,
    * dispatching on the dtype the parquet read produced:
    *   - `LongType` → epoch NANOS from a legacy `nanosAsLong` read;
    *     rebuild micros with integer `div` (NOT `/`) — epoch-nanos
    *     ≈ 1.7e18 overflows double's 53-bit mantissa.
    *   - `TimestampNTZType` → a timestamp[us] file whose footer lacks
    *     isAdjustedToUTC; the generator writes UTC instants and the
    *     engine session runs UTC, so the cast is a pure type relabel.
    *   - `TimestampType` → already canonical.
    * Anything else fails fast with a named diff instead of letting 46
    * downstream queries each produce their own analysis error.
    */
  def normalizeTs(df: DataFrame, column: String = "ts"): DataFrame =
    df.schema(column).dataType match {
      case LongType =>
        df.withColumn(column, timestamp_micros(expr(s"$column div 1000")))
      case TimestampNTZType =>
        df.withColumn(column, col(column).cast(TimestampType))
      case TimestampType => df
      case other: DataType =>
        throw new IllegalStateException(
          s"events.$column: expected epoch-nanos BIGINT / TIMESTAMP_NTZ / TIMESTAMP, got ${other.sql}")
    }

  /** Spark 4 rejects parquet TIMESTAMP(NANOS) during schema inference
    * with [ILLEGAL_PARQUET_TYPE]. Match that error AND the NANOS
    * spelling — both, not either: an unrelated failure that merely
    * mentions "NANOS" must not flip the global legacy nanosAsLong conf
    * and mask itself behind a retry. Checked on the error class where
    * Spark provides one, with the message pair as the fallback for
    * wrapped/stringified rethrows. */
  def isNanosTypeError(e: Throwable): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    val illegalType = (e match {
      case st: org.apache.spark.SparkThrowable =>
        st.getCondition == "ILLEGAL_PARQUET_TYPE"
      case _ => false
    }) || m.contains("ILLEGAL_PARQUET_TYPE") || m.contains("Illegal Parquet type")
    illegalType && m.contains("NANOS")
  }

  /** Post-normalization logical schema contract per table — what every
    * engine query is written against. `DataType.fromDDL` keeps the table
    * readable; order inside a table doesn't matter to the audit. */
  val expectedSchemas: Map[String, Seq[(String, DataType)]] = {
    def ddl(pairs: (String, String)*): Seq[(String, DataType)] =
      pairs.map { case (c, t) => c -> DataType.fromDDL(t) }
    Map(
      "region" -> ddl("r_regionkey" -> "INT", "r_name" -> "STRING"),
      "nation" -> ddl("n_nationkey" -> "INT", "n_name" -> "STRING",
        "n_regionkey" -> "INT"),
      "customer" -> ddl("c_custkey" -> "BIGINT", "c_name" -> "STRING",
        "c_nationkey" -> "INT", "c_acctbal" -> "DOUBLE",
        "c_mktsegment" -> "STRING"),
      "supplier" -> ddl("s_suppkey" -> "BIGINT", "s_name" -> "STRING",
        "s_nationkey" -> "INT", "s_acctbal" -> "DOUBLE"),
      "part" -> ddl("p_partkey" -> "BIGINT", "p_name" -> "STRING",
        "p_brand" -> "STRING", "p_type" -> "STRING", "p_size" -> "INT",
        "p_retailprice" -> "DOUBLE"),
      "orders" -> ddl("o_orderkey" -> "BIGINT", "o_custkey" -> "BIGINT",
        "o_orderstatus" -> "STRING", "o_totalprice" -> "DOUBLE",
        "o_orderdate" -> "TIMESTAMP_NTZ", "o_orderpriority" -> "STRING"),
      "lineitem" -> ddl("l_orderkey" -> "BIGINT", "l_partkey" -> "BIGINT",
        "l_suppkey" -> "BIGINT", "l_linenumber" -> "INT",
        "l_quantity" -> "DOUBLE", "l_extendedprice" -> "DOUBLE",
        "l_discount" -> "DOUBLE", "l_tax" -> "DOUBLE",
        "l_returnflag" -> "STRING", "l_linestatus" -> "STRING",
        "l_shipdate" -> "TIMESTAMP_NTZ"),
      "events" -> ddl("event_id" -> "BIGINT", "ts" -> "TIMESTAMP",
        "user_id" -> "BIGINT", "event_type" -> "STRING",
        "value" -> "DOUBLE", "props" -> "STRING"),
      "documents" -> ddl("doc_id" -> "BIGINT", "text" -> "STRING",
        "lang" -> "STRING", "source" -> "STRING", "n_chars" -> "BIGINT"),
      "embeddings" -> ddl("vec_id" -> "BIGINT",
        "embedding" -> "ARRAY<FLOAT>", "label" -> "INT"),
    )
  }
}
