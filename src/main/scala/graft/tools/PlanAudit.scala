package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit dump: writes PLANS.md with the AQE-final formatted plan of
  * each headline query — the reviewable evidence behind PlanShapeSpec's
  * assertions (pushdown reaching the scan, broadcasts, TakeOrdered,
  * single-shuffle windows, no cartesians).
  *
  * Usage: `PlanAudit [sfDir] [outFile]` (defaults sf0.01, PLANS.md).
  */
object PlanAudit {

  /** Headline batch queries: one per plan property worth reading. */
  val headline: Seq[(String, String)] = Seq(
    "q20_filter_project" -> "pushdown + pruning reach the parquet scan",
    "q11_join_broadcast" -> "dims broadcast; fact side never shuffles",
    "q44_topk" -> "top-K via TakeOrderedAndProject, no global sort",
    "q01_agg_sum" -> "two-phase hash agg inside whole-stage codegen",
    "q60_sessionize" -> "two windows + two aggs over ONE user_id shuffle",
    "q67_funnel" -> "three stacked windows + agg, one shuffle, no join-backs",
    "q66_salted_agg" -> "explicit two-phase salted aggregation",
    "d03_minhash_lsh_pairs" -> "LSH banding: linear shuffle, no doc×doc",
    "d08_decontaminate" -> "eval-shingle set broadcasts over the train stream",
    "d08b_decontaminate_bloom" -> "bloom bit-array ships in the udf; audit join broadcasts",
    "d09_simhash_neardup" -> "sorted-neighborhood scan: O(n·W) candidates",
    "t12_rare_token_frac" -> "vocabulary-sized df table broadcasts back",
    "t21_mixture_pack" -> "token-budget mixture: budgets broadcast, one source shuffle",
    "t13_corpus_pipeline" -> "gate fused into scan; two-shuffle pipeline + broadcast",
    "s06_ivf_search" -> "broadcast probe + pruned rerank + TakeOrdered",
    "s13_ivfpq_search" -> "IVF-PQ serve: partition-pruned codes-only scan + broadcast-LUT ADC",
    "s16_ivfpq_residual" -> "residual IVF-PQ: per-cell residual LUT, pruned codes-only scan",
    "t20_ngram_lm_score" -> "trigram/bigram count tables broadcast into the scoring join",
    "d10b_multiwidth_ngrams" -> "three widths in one text pass; width-partitioned rank window",
    "src03_partitioned_write" -> "partition-pruned single-day read",
    "src04_sorted_layout" -> "row-group stats-pruned range read over a sorted layout",
    // src05's zero-exchange bucketed join is pinned in ScaleToolsSpec —
    // its registry entry localCheckpoints behind the conf guard, so the
    // final plan here would only show the materialized scan
    "src06_zorder_layout" -> "Z-order (native codegen zorder) box-predicate pruning",
    "gr01_pagerank" -> "iterative join+agg PageRank reusing one shuffle layout",
    "q73_lateral_topn" -> "LATERAL subquery decorrelated to a ranked window join",
    "mm10_fire_struct" -> "fire-struct kernel: one deliberate spread, then a map-only codec stage",
    "q81_salted_skew_join" -> "salted shuffle join: hot key spread over (key, salt) reducers, no broadcast",
    "q82_runtime_filter_join" -> "runtime bloom filter: dim keys gate the fact scan pre-shuffle",
    "q83_dpp_partitioned_join" -> "dynamic partition pruning: filtered dim → runtime partition filter",
    "d14_chunk_dedup" -> "exact-substring dedup: map-side chunking, first-keep window over hashes + ids only",
    "d15_incremental_chunk_dedup" -> "incremental chunk dedup: stored-index hash anti-join, O(batch) text movement",
    "s19_ivf_rebalance" -> "IVF rebalance: broadcast centroids, linear (cid, pos) update — no vector×vector join",
    "q84_table_profile" -> "one-pass profile: single scan, one Expand of pruned (gid, value) pairs",
    "q87_approx_profile" -> "approx profile tier: Expand-free, map-side partial HLL sketches (plus the exact audit pass)",
    "q86_incremental_profile" -> "incremental profile: stored-partial scan + batch partial, fold is O(partials)",
    "q85_quality_constraints" -> "constraint report: one conditional agg + broadcast-key FK anti-join",
    "t22_shuffle_shard" -> "training-order shuffle-shard: ONE hash exchange + per-shard sort",
    "t23_corpus_drift" -> "drift monitor: one conditional agg per source, totals broadcast back",
    "q88_constraint_suggestion" -> "constraint suggestion: profile-derived rules, ONE conditional agg evaluates the batch, domain lists broadcast",
    "s20_pq_codebook_refresh" -> "PQ codebook refresh: one Lloyd step from grouped code means, then a single re-encode scan",
    "d16_index_maintenance" -> "LSH index maintenance: stage-2 gate probes the updated stored index at O(batch)",
    "t24_importance_resample" -> "DSIR resampling: one tokenize pass, 256-row weight table broadcasts into map-side-partial scoring agg",
    "st32_state_reader" -> "offline state read-back: parallel statestore snapshot scan, no input-stream replay",
    "d18_leakage_report" -> "eval-side leakage: train corpus streams one semi-join, eval/hit sets broadcast both ways",
    "src10_dynamic_partition_overwrite" -> "partition correction readback: full-table scan groups per day after a dynamic overwrite",
    "q77_incremental_agg" -> "IVM merge: O(changelog) delta agg + ONE full-outer join on the stored aggregate, base never rescanned",
    "t26_chunk_overlap" -> "overlapping passage chunking: row-local explode/slice, ZERO exchanges in the plan",
    "d19_cluster_safe_split" -> "cluster-safe split: O(near-dup) label table broadcasts onto a narrow corpus pass",
    "s22_jl_projection" -> "JL projection: literal plane matrix in-plan, TakeOrdered candidate cuts before ranking",
    "s23_hybrid_rrf" -> "hybrid RRF: broadcast query-term/vector sides, both rank lists TakeOrdered-cut before fusion",
    "d05_ngram_jaccard_pairs" -> "LSH verify stage: explicitly shuffled candidate/count joins (no estimate-gated broadcast)",
    "q89_iqr_outliers" -> "robust fences: one keyed rank window, O(groups) fence table broadcast back over the stream",
    "t25_token_pack" -> "token packing: ONE per-shard prefix window, then row-local sequence explode — no second exchange",
    "s24_mmr_diversify" -> "MMR diversification: TakeOrdered candidate cut, bounded O(k^2) greedy rerank — no corpus-wide join",
    "mm11_keyframes" -> "keyframe selection: mapPartitions decode + per-container lag scan, ZERO shuffles",
    "src11_manifest_snapshot" -> "snapshot read: exactly the manifest-listed files scanned, both versions served",
    "src12_snapshot_merge" -> "COW merge: one partitioned base write; v2 swaps one day's files, every other file reused",
    "src13_snapshot_expire" -> "snapshot expiry: live-version read after GC — only surviving manifest files scanned",
    "t27_corpus_chain" -> "six-stage corpus chain: per-stage ledger over monotonically shrinking doc sets, stage plans = carriers'",
    "st34_stream_ivm" -> "IVM serve: stored aggregate full-outer-joined with the folded delta store, base never rescanned",
    "st35_stream_cdc_compact" -> "LWW serve: one latestByKey window over the compacted O(keys) snapshot store",
    "st36_stream_snapshot_publish" -> "snapshot-published stream readback: latest catalog version scan + manifest audits")
    // src14/src15/st38 compute their audits eagerly and return literal
    // projections, so their registry plans are vacuous (Project+Range);
    // the plans worth auditing are their INNER serve frames — captured
    // in dedicated blocks in main() below (pruned stats scan; per-poll
    // delta read).

  /** Per-query session confs applied (and restored) around plan capture.
    * q82: InjectRuntimeFilter's size gates are tuned for clusters — at
    * test volume, force the shuffle-join path and drop the application-
    * side threshold so the 100 TB-default plan shape is the one audited. */
  val confs: Map[String, Seq[(String, String)]] = Map(
    "q82_runtime_filter_join" -> Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0"))

  /** Execute the frame and return its AQE-FINAL physical plan: collect
    * first (finalizes AQE so the executed plan is the real one), then
    * keep only the final section — `toString` prepends the pre-AQE
    * "== Initial Plan ==" section, which must not leak into the audit. */
  def capturePlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
      .linesIterator.takeWhile(_.nonEmpty).mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.core.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS") // INT96 writes NO stats (GraftSession)
      .config("spark.sql.warehouse.dir", // bucketed saveAsTable scratch
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — AQE-final physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.tools.PlanAudit` at `$sfDir`; regenerate with\n")
    sb.append("`runMain graft.tools.PlanAudit`. Each section states the scale\n")
    sb.append("property the plan demonstrates (spec-pinned in PlanShapeSpec).\n")
    headline.foreach { case (name, why) =>
      val plan = graft.core.GraftSession.withConf(
          spark, confs.getOrElse(name, Seq.empty): _*) {
        capturePlan(graft.SparkEntry.queries(name)(spark, sfDir))
      }
      sb.append(s"\n## $name — $why\n\n```\n$plan\n```\n")
      spark.catalog.clearCache()
    }
    // st25's registry entry returns the JDBC READBACK (a Derby table
    // scan); the dataflow worth auditing is the batch twin of the
    // in-stream pipeline — identical parse/detect/window functions,
    // minus the StateStore wrapping. One shuffle, and it moves counts,
    // never frames (spec-pinned in PlanShapeSpec "st25").
    locally {
      import graft.streaming.VehiclePipeline
      val staged = VehiclePipeline.stageFrames(spark, sfDir)
      val plan = capturePlan(VehiclePipeline.windowedCounts(
        VehiclePipeline.detectFrames(spark.read.parquet(staged))))
      sb.append("\n## st25_vehicle_pipeline (batch twin) — decode/detect/explode map-side; ONE shuffle of counts\n\n")
      sb.append(s"```\n$plan\n```\n")
    }
    // st30/st31's registry entries return FOLDS over a live store the
    // streaming drain wrote — the plan worth auditing is each drain's
    // per-batch kernel plus the fold, built here as batch twins over
    // the same slices (identical functions, minus foreachBatch).
    locally {
      import graft.analysis.QualityQueries
      import org.apache.spark.sql.functions._
      val docs = graft.core.Tables(spark, sfDir).documents
      val sv = graft.core.Tables.incrementalSplitId(docs, "doc_id")
      val newSlice = docs.filter(col("doc_id") >= sv)
      sb.append("\n## st30_stream_drift_monitor (batch twin) — per-batch drift partial: ONE conditional agg, O(sources) rows out\n\n")
      sb.append(s"```\n${capturePlan(QualityQueries.driftCounts(newSlice, "new"))}\n```\n")
    }
    // s21's registry entry serves from the COMPACTED layout; the plan
    // worth auditing is the PRE-compaction tombstone serve — the shape
    // a query runs between a delete batch and the next maintenance
    // window: partition-pruned probe scan, broadcast tombstone
    // anti-join, TakeOrdered. No full-layout scan, no shuffle of the
    // posting lists.
    locally {
      val plan = capturePlan(
        graft.similarity.SimilarityQueries.s21Serves(spark, sfDir)._1)
      sb.append("\n## s21_ivf_delete (tombstone serve) — pruned probe scan + broadcast tombstone anti-join, before compaction\n\n")
      sb.append(s"```\n$plan\n```\n")
      spark.catalog.clearCache()
    }
    // st33's registry entry returns a memory-sink readback; the kernel
    // worth auditing is the per-row scoring expression — built here as
    // its batch twin: the baked weight-map literal applied via
    // aggregate() over each doc's own token array. The plan must show a
    // single map-only projection over the scan (zero exchanges, zero
    // state) — the property that lets the gate run at scan speed.
    locally {
      import graft.analysis.QualityQueries
      import org.apache.spark.sql.functions._
      val docs = graft.core.Tables(spark, sfDir).documents
      val sv = graft.core.Tables.incrementalSplitId(docs, "doc_id")
      val wmap = typedLit(
        QualityQueries.dsirWeights(
          QualityQueries.dsirTokens(docs.filter(col("doc_id") < sv)))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      val toks = filter(split(col("text"), " "), w => length(w) > 0)
      val plan = capturePlan(docs.filter(col("doc_id") >= sv)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tok"),
          aggregate(toks, lit(0L), (acc, w) =>
            acc + coalesce(element_at(wmap, substring(md5(w), 1, 2)), lit(0L)))
            .as("sum_bits"))
        .filter(col("n_tok") > 0)
        .withColumn("admitted", col("sum_bits") >= 0))
      sb.append("\n## st33_stream_importance_gate (batch twin) — baked weight-map scoring: one map-only projection, zero exchanges\n\n")
      sb.append(s"```\n$plan\n```\n")
    }
    // src14/src15's registry entries return audit literals; the plan
    // worth auditing is the PRUNED SERVE — the scan must list only the
    // stats-intersecting files (skipped files never enter the plan's
    // file listing), with the row predicate still pushed into it.
    locally {
      import graft.sources.SnapshotCatalog
      import org.apache.spark.sql.functions._
      val root = graft.streaming.Streams.dataDir("graft_plan_skip_")
      val ev = graft.core.Tables(spark, sfDir).events
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
      val w = (maxId + 6L) / 6L
      (0L until 6L).foreach { b =>
        SnapshotCatalog.append(ev.filter(col("event_id") >= b * w &&
          col("event_id") < (b + 1) * w).repartition(2), root, s"b$b")
      }
      val (pruned, nRead, nTotal) = SnapshotCatalog.readSnapshotPruned(
        spark, root, "event_id", 2L * w, 4L * w - 1L)
      val plan = capturePlan(pruned
        .filter(col("event_id").between(2L * w, 4L * w - 1L))
        .agg(count(lit(1)).as("n_rows"), sum(col("value")).as("sum_value")))
      sb.append(s"\n## src14/src15_stats_skipping (pruned serve frame) — scan opens $nRead of $nTotal snapshot files; skipped files never enter the plan\n\n")
      sb.append(s"```\n$plan\n```\n")
    }
    // src17's registry entry returns audit literals; the plan worth
    // auditing is the DV-SERVED READ — the full data scan anti-joined
    // against the broadcast (file, position) deletion vectors: the DV
    // side must broadcast (O(deleted rows), sparse) and the data side
    // must never shuffle.
    locally {
      import graft.sources.SnapshotCatalog
      import org.apache.spark.sql.functions._
      val root = graft.streaming.Streams.dataDir("graft_plan_dv_")
      val ev = graft.core.Tables(spark, sfDir).events
        .select(col("event_id"), col("event_type"), col("value"))
      SnapshotCatalog.append(ev.filter(col("event_id") % 2 === 0), root, "b0")
      SnapshotCatalog.append(ev.filter(col("event_id") % 2 === 1), root, "b1")
      val (_, nDel) =
        SnapshotCatalog.deleteWhere(spark, root, col("event_type") === "view")
      val plan = capturePlan(SnapshotCatalog.readSnapshotWithDeletes(spark, root)
        .agg(count(lit(1)).as("n_rows"),
          graft.functions.Canon.sumCents(col("value")).as("sum_value_cents")))
      sb.append(s"\n## src17_deletion_vectors (DV-served read) — broadcast anti-join subtracts $nDel positions; data files unrewritten, fact side unshuffled\n\n")
      sb.append(s"```\n$plan\n```\n")
    }
    // src22's registry entry returns audit literals; the plan worth
    // auditing is the FileIndex-backed SQL scan itself — the Location
    // line names SnapshotFileIndex and the pushed filters prune its
    // file listing at planning time.
    locally {
      import graft.sources.{SnapshotCatalog, SnapshotFileIndex}
      import org.apache.spark.sql.functions._
      val root = graft.streaming.Streams.dataDir("graft_plan_fidx_")
      val ev = graft.core.Tables(spark, sfDir).events
        .select(col("event_id"), col("event_type"), col("value"))
      val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
      val w = (maxId + 6L) / 6L
      (0L until 6L).foreach { b =>
        SnapshotCatalog.append(ev.filter(col("event_id") >= b * w &&
          col("event_id") < (b + 1) * w).repartition(2), root, s"b$b")
      }
      SnapshotFileIndex.snapshotDF(spark, root)
        .createOrReplaceTempView("graft_plan_snap")
      val q = spark.sql(
        s"""SELECT count(*) AS n_rows, sum(value) AS sum_value
           |FROM graft_plan_snap
           |WHERE event_id BETWEEN ${2 * w} AND ${4 * w - 1}""".stripMargin)
      q.collect()
      val scanned = SnapshotFileIndex.scannedFiles(q)
      val plan = capturePlan(q)
      sb.append(s"\n## src22_planned_skipping (FileIndex-backed SQL scan) — planner pruned to $scanned of 12 files from the pushed predicate\n\n")
      sb.append(s"```\n$plan\n```\n")
    }
    // src23's registry entry returns audit literals; the plan worth
    // auditing is the partition-filtered scan over the catalog's
    // FileIndex — the listing keeps only the predicate's hive
    // partitions, and the partition column serves from the log-recorded
    // directory values (it is not in the data files).
    locally {
      import graft.sources.{SnapshotCatalog, SnapshotFileIndex}
      import org.apache.spark.sql.functions._
      val root = graft.streaming.Streams.dataDir("graft_plan_part_")
      val ev = graft.core.Tables(spark, sfDir).events
        .select(col("event_id"), col("event_type"), col("value"))
      SnapshotCatalog.append(ev.filter(col("event_id") % 2 === 0).coalesce(1),
        root, "b0", partitionBy = Seq("event_type"))
      SnapshotCatalog.append(ev.filter(col("event_id") % 2 === 1).coalesce(1),
        root, "b1", partitionBy = Seq("event_type"))
      val q = SnapshotFileIndex.snapshotDF(spark, root)
        .filter(col("event_type") === "signup")
        .agg(count(lit(1)).as("n"),
          graft.functions.Canon.sumCents(col("value")).as("cents"))
      q.collect()
      val scanned = SnapshotFileIndex.scannedFiles(q)
      val total = SnapshotCatalog
        .manifestFiles(root, SnapshotCatalog.latestVersion(root)).size
      val plan = capturePlan(q)
      sb.append(s"\n## src23_partitioned_catalog (hive-partitioned catalog scan) — partition filter cut the listing to $scanned of $total files; partition values served from the log\n\n")
      sb.append(s"```\n$plan\n```\n")
    }
    // src25's registry entry returns audit literals; the plan worth
    // auditing is the NAMED-TABLE SQL read — the analysis rewrite must
    // plan the very same pruned FileIndex scan as the programmatic
    // API (a v1 FileScan, partition listing cut by the predicate),
    // proving the TableCatalog surface adds zero plan overhead.
    locally {
      import graft.sources.{GraftCatalog, SnapshotCatalog, SnapshotFileIndex}
      import org.apache.spark.sql.functions._
      val wh = graft.streaming.Streams.dataDir("graft_plan_sqlcat_")
      spark.conf.set("spark.sql.catalog.graft_plan",
        classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_plan.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_plan.db")
      val root = s"$wh/db/events"
      val ev = graft.core.Tables(spark, sfDir).events
        .select(col("event_id"), col("event_type"), col("value"))
      SnapshotCatalog.append(ev.filter(col("event_id") % 2 === 0).coalesce(1),
        root, "b0", partitionBy = Seq("event_type"))
      SnapshotCatalog.append(ev.filter(col("event_id") % 2 === 1).coalesce(1),
        root, "b1", partitionBy = Seq("event_type"))
      val q = spark.sql(
        """SELECT count(*) AS n,
          |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
          |FROM graft_plan.db.events WHERE event_type = 'signup'""".stripMargin)
      q.collect()
      val scanned = SnapshotFileIndex.scannedFiles(q)
      val total = SnapshotCatalog
        .manifestFiles(root, SnapshotCatalog.latestVersion(root)).size
      val plan = capturePlan(q)
      sb.append(s"\n## src25_sql_catalog (named-table SQL through the TableCatalog) — analysis rewrite planned the v1 FileIndex scan; partition filter cut $scanned of $total files\n\n")
      sb.append(s"```\n$plan\n```\n")
    }
    // st41's registry entry returns audit literals; the plan worth
    // auditing is ONE ROW-LEVEL CDC POLL across a DV-delete commit —
    // the retraction side scans only the files the deleted positions
    // reference and semi-joins the O(deleted) position set.
    locally {
      import graft.sources.SnapshotCatalog
      import org.apache.spark.sql.functions._
      val root = graft.streaming.Streams.dataDir("graft_plan_cdc_")
      val ev = graft.core.Tables(spark, sfDir).events
        .select(col("event_id"), col("user_id"), col("value"))
      SnapshotCatalog.append(ev.filter(col("event_id") % 2 === 0), root, "b0")
      SnapshotCatalog.append(ev.filter(col("event_id") % 2 === 1), root, "b1")
      val (dv, nDel) =
        SnapshotCatalog.deleteWhere(spark, root, col("event_id") % 13 === 5)
      val plan = capturePlan(
        SnapshotCatalog.changeFeedRows(spark, root, dv - 1, dv)
          .groupBy("_change_type")
          .agg(count(lit(1)).as("n"),
            graft.functions.Canon.sumCents(col("value")).as("cents")))
      sb.append(s"\n## st41_catalog_cdc_ivm (one row-level CDC poll) — $nDel retractions materialized from DV positions semi-joined back; table never rescanned\n\n")
      sb.append(s"```\n$plan\n```\n")
    }
    // st38's registry entry returns audit literals; the plan worth
    // auditing is ONE POLL of the change feed — a scan of exactly the
    // version's added files, never the table.
    locally {
      import graft.sources.SnapshotCatalog
      import org.apache.spark.sql.functions._
      val root = graft.streaming.Streams.dataDir("graft_plan_feed_")
      val ev = graft.core.Tables(spark, sfDir).events
        .select(col("event_id"), col("value"))
      (0 until 3).foreach { b =>
        SnapshotCatalog.append(ev.filter(col("event_id") % 3 === b),
          root, s"b$b")
      }
      val delta = SnapshotCatalog.addedFiles(root, Some(2), 3)
      val total = SnapshotCatalog.manifestFiles(root, 3).size
      val plan = capturePlan(spark.read.parquet(delta: _*)
        .agg(count(lit(1)).as("n_rows"),
          graft.functions.Canon.sumCents(col("value")).as("sum_value_cents")))
      sb.append(s"\n## st38_catalog_change_feed (per-poll delta read) — scans the ${delta.size} files version 3 added, not the snapshot's $total\n\n")
      sb.append(s"```\n$plan\n```\n")
    }
    locally {
      import graft.operators.ProfilingQueries
      import org.apache.spark.sql.functions._
      val o = graft.core.Tables(spark, sfDir).orders
      val split = graft.core.Tables.incrementalSplitId(o, "o_orderkey")
      val sc = ProfilingQueries.suggestConstraints(
        o.filter(col("o_orderkey") < split),
        kinds = ProfilingQueries.rowLocalRuleKinds)
      val plan = capturePlan(ProfilingQueries.evaluateConstraints(
        o.filter(col("o_orderkey") >= split), sc))
      sb.append("\n## st31_stream_constraint_gate (batch twin) — per-batch evaluation: ONE conditional agg over pre-materialized rules, no train rescan\n\n")
      sb.append(s"```\n$plan\n```\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[planaudit] wrote $outFile (${headline.length + 9} plans)")
    spark.stop()
  }
}
