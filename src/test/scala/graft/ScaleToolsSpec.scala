package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Skew + co-location toolkit tests: salted aggregation/join equal their
  * unsalted counterparts; bucketed joins eliminate the shuffle. */
class ScaleToolsSpec extends SparkTestBase {

  test("salted sum equals plain groupBy sum") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val salted = Salting.saltedSum(li, Seq("l_returnflag"), "l_quantity",
      nSalts = 8, saltFrom = Seq("l_orderkey", "l_linenumber"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = li.groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6) }
  }

  test("salted join equals plain join (row multiset)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val dim = orders.select("o_orderkey", "o_orderstatus")
    val saltedRows = Salting.saltedJoin(li, dim, "o_orderkey",
      nSalts = 4, saltFrom = Seq("o_orderkey", "l_quantity"))
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plainRows = li.join(dim, "o_orderkey")
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedRows == plainRows)
  }

  test("AQE splits a skewed join partition at runtime") {
    // 95% of fact rows share one join key; with the skew thresholds
    // lowered to test scale, AQE must mark the sort-merge join skew-split
    // — the runtime half of the salting story (SCALE.md: "salting for
    // planned skew, AQE for discovered skew").
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // AQE splits a skewed reduce partition along MAP-output boundaries
      // — a single-file scan yields one mapper and nothing to split, so
      // spread the input over several map tasks first (at real scale the
      // thousands of input splits give this for free)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(8)
      val skewed = li.select(
        when(col("l_orderkey") % 20 === 0, col("l_orderkey") % 5 + 1)
          .otherwise(lit(0)).as("k"),
        col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))
      // dim must reach the join as a bare shuffle stage: AQE splits a
      // skewed partition by replicating the OTHER side's matching
      // partition, which it can only do when that side is a plain
      // ShuffleQueryStage (not e.g. an aggregation output).
      val dim = spark.range(0, 6).select(col("id").as("k"), lit(1L).as("w"))
      // drive THIS df's own queryExecution (a write would build a fresh
      // one) so AQE finalizes and the skew decision shows in the plan;
      // no operator above the join may demand its hash distribution, or
      // the split (which breaks that distribution) gets skipped
      val joined = skewed.join(dim, "k")
      assert(joined.collect().length == li.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkewJoin"),
        s"AQE did not skew-split the dominant key:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("partitioned layout prunes untouched partitions at the scan") {
    val out = Files.createTempDirectory("graft_part").toString
    graft.core.Tables(spark, sfDir).events
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val one = spark.read.parquet(out).filter(col("event_type") === "purchase")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
           plan.contains("event_type"),
      s"partition filter did not reach the scan:\n$plan")
    // pruned scan must read strictly fewer files than the full table
    // (inputFiles ignores filters — read the scan node's runtime metric)
    val scanned = one.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    val allFiles = spark.read.parquet(out).inputFiles.length
    assert(scanned > 0 && scanned < allFiles,
      s"pruning scanned $scanned of $allFiles files")
  }

  test("dynamic partition overwrite replaces only touched partitions; static truncates (src10)") {
    val out = Files.createTempDirectory("graft_dynpart").toString
    val events = graft.core.Tables(spark, sfDir).events
      .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
    events.write.mode("overwrite").partitionBy("day").parquet(out)
    // partition-column inference reads `day` back as DATE — normalize
    val days = spark.read.parquet(out)
      .select(col("day").cast("string")).distinct().collect()
      .map(_.getString(0)).sorted
    assert(days.length > 1, "fixture must span multiple days")
    val (corrected, untouched) = (days.head, days.last)
    def files(day: String): Set[(String, Long)] =
      new java.io.File(s"$out/day=$day").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    val before = files(untouched)
    val correction = events.filter(col("day") === corrected).limit(3)
    graft.core.GraftSession.withConf(spark,
      "spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      correction.write.mode("overwrite").partitionBy("day").parquet(out)
    }
    // untouched partition: exact same files, not rewritten copies
    assert(files(untouched) === before,
      "dynamic overwrite rewrote files in an untouched partition")
    assert(spark.read.parquet(out).filter(col("day") === corrected).count() === 3L)
    assert(spark.read.parquet(out).select("day").distinct().count() === days.length.toLong,
      "dynamic overwrite dropped partitions it did not touch")
    // the negative control — STATIC mode truncates the whole table to
    // the correction batch (the silent-data-loss trap src10 avoids)
    graft.core.GraftSession.withConf(spark,
      "spark.sql.sources.partitionOverwriteMode" -> "static") {
      correction.write.mode("overwrite").partitionBy("day").parquet(out)
    }
    assert(spark.read.parquet(out).select("day").distinct().count() === 1L,
      "static overwrite was expected to truncate to the written partitions")
  }

  test("sorted layout skips row groups on the sort-key predicate") {
    // The src04 claim: a fact written sortWithinPartitions(l_shipdate)
    // with small row groups answers a date-range scan from footer
    // min/max stats — the scan's numOutputRows (rows surviving
    // row-group pruning, BEFORE Spark's residual filter) must be well
    // under the table size. An unsorted write of the same data leaves
    // the date spread across every row group, so the same predicate
    // prunes (almost) nothing — pinning that the SORT is what skips,
    // not the predicate alone.
    def scanRows(path: String): (Long, Long) = {
      val filtered = spark.read.parquet(path)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
      // drive THIS df's own queryExecution (count() builds a separate
      // one whose metrics this plan would never see)
      val n = filtered.collect().length.toLong
      val scanned = filtered.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
      (scanned, n)
    }
    // single file + tiny block size: at sf0.001 the table is ~0.5 MB,
    // so 4 files × 128 KB blocks would leave ONE row group per file —
    // whose min/max spans the whole range and prunes nothing. The row
    // check interval must also come down or the writer only notices the
    // block boundary every 100 rows.
    // the sort key must be an LTZ timestamp: INT96 (Spark's default
    // outputTimestampType, overridden in SparkTestBase) has no stats at
    // all, and TIMESTAMP_NTZ (what the testdata reads back as) pushes
    // filters Spark never converts to parquet FilterPredicates
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val total = li.count()
    val blockOpts = Map(
      "parquet.block.size" -> (32 * 1024).toString,
      "parquet.block.size.row.check.min" -> "50",
      "parquet.block.size.row.check.max" -> "50")
    val sorted = Files.createTempDirectory("graft_sorted").toString
    li.repartition(1).sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").options(blockOpts).parquet(sorted)
    val unsorted = Files.createTempDirectory("graft_unsorted").toString
    li.repartition(1)
      .write.mode("overwrite").options(blockOpts).parquet(unsorted)
    val (sortedScan, nSorted) = scanRows(sorted)
    val (unsortedScan, nUnsorted) = scanRows(unsorted)
    assert(nSorted == nUnsorted) // same answer either way
    assert(sortedScan >= nSorted, "scan emits at least the matching rows")
    assert(sortedScan < total / 2,
      s"sorted layout scanned $sortedScan of $total rows — row groups not pruned")
    assert(sortedScan < unsortedScan,
      s"sorted scan ($sortedScan) not tighter than unsorted ($unsortedScan)")
  }

  test("z-order layout prunes row groups on the non-leading dimension") {
    // The src06 claim: single-key sort gives stats-pruning only on the
    // leading column — a predicate on the OTHER key scans everything.
    // Bit-interleaving both keys into one sort value gives every row
    // group a bounded box in (partkey, suppkey) space, so either
    // dimension's range predicate prunes. Pin the differential: the
    // suppkey-only filter prunes the z-layout but not the
    // partkey-sorted layout.
    import org.apache.spark.sql.DataFrame
    def scanRows(path: String, filt: DataFrame => DataFrame): Long = {
      val f = filt(spark.read.parquet(path))
      f.collect()
      f.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    val blockOpts = Map(
      "parquet.block.size" -> (32 * 1024).toString,
      "parquet.block.size.row.check.min" -> "50",
      "parquet.block.size.row.check.max" -> "50")
    val z = graft.functions.ZOrder.zorder(col("l_partkey"), col("l_orderkey"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val total = li.count()
    val byPart = Files.createTempDirectory("graft_sortpart").toString
    li.repartition(1).sortWithinPartitions("l_partkey")
      .write.mode("overwrite").options(blockOpts).parquet(byPart)
    val byZ = Files.createTempDirectory("graft_sortz").toString
    li.withColumn("zval", z).repartition(1).sortWithinPartitions("zval")
      .write.mode("overwrite").options(blockOpts).parquet(byZ)
    val orderBox = (df: DataFrame) =>
      df.filter(col("l_orderkey") >= 100 && col("l_orderkey") < 300)
    val zScan = scanRows(byZ, orderBox)
    val partScan = scanRows(byPart, orderBox)
    assert(zScan < total / 2,
      s"z-layout scanned $zScan of $total rows on the second dimension")
    assert(zScan < partScan,
      s"z-layout ($zScan) not tighter than leading-key sort ($partScan)")
  }

  test("dynamic partition pruning fires on a dim-filtered fact join") {
    // DPP: the partitioned fact's scan is pruned at RUNTIME by the
    // filtered dim's broadcast values — at 100 TB this is the difference
    // between scanning one event_type's partitions and all of them when
    // the filter arrives via a join instead of a literal
    val out = Files.createTempDirectory("graft_dpp").toString
    graft.core.Tables(spark, sfDir).events
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val spark2 = spark
    import spark2.implicits._
    val fact = spark.read.parquet(out)
    // Three heuristics must line up for the rule to fire: the dim filter
    // must be LIKELY-SELECTIVE (literal comparison — a bare boolean attr
    // is rejected), on a column OTHER than the join key (else constant
    // propagation turns it into static pruning and DPP is moot), and not
    // boolean (BooleanSimplification strips `= true` before the rule)
    val dimPath = Files.createTempDirectory("graft_dpp_dim").toString
    fact.select(col("event_type").as("t")).distinct()
      .withColumn("grp", when(col("t") === "purchase", "keep").otherwise("drop"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("grp") === "keep")
    val joined = fact.join(dim, fact("event_type") === dim("t"))
    assert(joined.collect().nonEmpty)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan; optimized:\n" +
        joined.queryExecution.optimizedPlan.toString + s"\nphysical:\n$plan")
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf — SparkTestBase points it at a temp
    // dir when the shared session is built
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    // disable broadcast so the join itself must pick sort-merge, then
    // prove bucketing removed the pre-join exchanges
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge:\n$plan")
      // the only exchange allowed is the post-join aggregation shuffle on
      // o_orderstatus — neither join key may be re-shuffled
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles the lineitem side:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles the orders side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("observe() collects data-quality metrics without a second scan") {
    // At 100 TB a separate "count the nulls" pass is a full extra read;
    // Dataset.observe piggybacks named aggregates on the main job — the
    // metrics materialize as a side effect of the query's own single
    // scan. Verify against independently computed values.
    val ev = graft.core.Tables(spark, sfDir).events
    val observed = ev.observe("dq",
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
      max(col("value")).as("max_value"))
    val agg = observed.groupBy("event_type").agg(count(lit(1)).as("n"))
    agg.collect() // one job: the agg AND the metrics
    // metrics attach to the EXECUTED query (agg's plan contains the
    // CollectMetrics node), not the intermediate Dataset handle
    val metrics = agg.queryExecution.observedMetrics("dq")
    assert(metrics.getAs[Long]("n_rows") == ev.count())
    assert(metrics.getAs[Long]("n_null_value") ==
      ev.filter(col("value").isNull).count())
    assert(metrics.getAs[Double]("max_value") ==
      ev.agg(max(col("value"))).head().getDouble(0))
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The third join-pruning lever after broadcast and DPP: when a
    // selective dim side must shuffle-join (too big to broadcast), the
    // optimizer injects a bloom filter built from the dim keys and
    // applies it on the fact scan — at 100 TB this drops most fact rows
    // BEFORE the shuffle. Thresholds lowered so sf-scale inputs qualify.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the shuffle join
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val dim = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT") // selective build side
        .select("o_orderkey")
      val joined = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilterMightContain")
        || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("streaming state is O(keys), not O(input): st04/st13 rows = key count, st21 = candidate pairs (ScaleStress listener)") {
    // The metric claim SCALESTRESS.md's streaming section rests on,
    // pinned at fixture scale with exact equalities: a stateful drain's
    // state-store row count must equal its KEY cardinality (st04:
    // distinct users; st13: distinct (user, event_type) pairs) no
    // matter how many input rows streamed through, and the dedup gate
    // (st21 — probe itself stateless, only the once-per-doc emission
    // dedup holds state) must hold exactly the distinct banded
    // CANDIDATE PAIRS — a set sized by near-dup density, not corpus.
    val listener = new graft.tools.ScaleStress.StateMetricsListener
    spark.streams.addListener(listener)
    try {
      val ev = graft.core.Tables(spark, sfDir).events
      val nUsers = ev.select("user_id").distinct().count()
      val nPairs = ev.select("user_id", "event_type").distinct().count()
      val nInput = ev.count()
      assert(nInput > nPairs && nPairs > nUsers, "fixture must have >1 event per key")

      def maxRowsOf(q: String): Long = {
        listener.reset()
        SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
        assert(listener.awaitQuiesced(), s"$q: no terminated event observed")
        listener.maxStateRows
      }
      assert(maxRowsOf("st04_stateful_counter") === nUsers,
        "st04 state rows must equal distinct users")
      assert(maxRowsOf("st13_stream_dedup") === nPairs,
        "st13 state rows must equal distinct dedup keys")

      // st21's expected state: batch replica of its banding — distinct
      // (batch doc, existing doc) pairs sharing >= 1 LSH band
      import graft.dedup.DedupQueries
      val docs = graft.core.Tables(spark, sfDir).documents
      val split = graft.core.Tables.incrementalSplitId(docs, "doc_id")
      def bandsOf(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), DedupQueries.shingles(col("text")).as("shs"))
        .select(col("doc_id"), posexplode(array((0 until 4).map { b =>
          concat_ws("|", (0 until 2).map { j =>
            array_min(transform(col("shs"), s => DedupQueries.hashFn(b * 2 + j, s)))
          }: _*)
        }: _*)))
        .toDF("doc_id", "band_id", "band_hash")
      val candPairs = bandsOf(docs.filter(col("doc_id") >= split))
        .join(bandsOf(docs.filter(col("doc_id") < split))
          .withColumnRenamed("doc_id", "ex_id"), Seq("band_id", "band_hash"))
        .select("doc_id", "ex_id").distinct().count()
      val st21Rows = maxRowsOf("st21_stream_dedup_gate")
      assert(st21Rows === candPairs,
        "st21 state rows must equal distinct banded candidate pairs")
      assert(st21Rows < docs.count(),
        "st21 state must stay below the corpus size on this fixture")
    } finally spark.streams.removeListener(listener)
  }
}
