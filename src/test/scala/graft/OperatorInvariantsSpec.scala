package graft

import org.apache.spark.sql.functions._

/** Cross-operator algebraic invariants (SURVEY §5.2-3 property tests) —
  * checks that don't need the DuckDB oracle. */
class OperatorInvariantsSpec extends SparkTestBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("upsert conserves the key space — no inserts, no losses (q59)") {
    val nOrders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    val merged = run("q59_upsert_merge").agg(sum("n_orders")).head().getLong(0)
    assert(merged == nOrders, s"merge changed cardinality: $merged != $nOrders")
  }

  test("sessionization conserves events and bounds sessions (q60)") {
    val events = graft.core.Tables(spark, sfDir).events
    val s = run("q60_sessionize")
    val totEvents = s.agg(sum("n_events")).head().getLong(0)
    assert(totEvents == events.count(), "sessions lost or duplicated events")
    assert(s.filter(col("n_sessions") < 1 ||
      col("n_sessions") > col("n_events")).count() == 0)
    assert(s.filter(col("max_session_events") > col("n_events")).count() == 0)
  }

  test("IVF probe search returns sorted sims from probed lists only (s06)") {
    val r = run("s06_ivf_search").collect()
    assert(r.nonEmpty && r.length <= 5)
    val sims = r.map(_.getAs[Long]("sim_e6"))
    assert(sims.sameElements(sims.sorted.reverse), "not sorted desc")
    assert(sims.forall(s => s >= -1000000L && s <= 1000000L))
    // nprobe=2: results come from at most 2 inverted lists
    assert(r.map(_.getAs[Int]("cid")).distinct.length <= 2)
  }

  test("cluster labels are transitive-closed over verified pairs (d07)") {
    import graft.dedup.DedupQueries
    val docs = graft.core.Tables(spark, sfDir).documents
    val pairs = DedupQueries.verifiedPairs(docs).select("doc_a", "doc_b")
    val labels = DedupQueries.clusterLabels(pairs)
    // every pair's endpoints carry the SAME label (the defining CC property)
    val la = labels.toDF("doc_a", "la")
    val lb = labels.toDF("doc_b", "lb")
    val split = pairs.join(la, "doc_a").join(lb, "doc_b")
      .filter(col("la") =!= col("lb")).count()
    assert(split == 0, s"$split pairs straddle clusters")
    // labels are canonical minima: label <= doc_id, and every label is a member
    assert(labels.filter(col("label") > col("doc_id")).count() == 0)
    val roots = labels.select(col("label")).distinct().toDF("doc_id")
    assert(roots.join(labels, "doc_id").count() == roots.count(),
      "some cluster label is not itself a member")
  }

  test("explode ↔ groupBy conservation (A8 ≡ U3+P6+A1)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exploded = run("q27_explode")
    val total = exploded.agg(sum("n_elems")).head().getLong(0)
    assert(total == emb.count() * 64)
  }

  test("window-sum ≡ filter-sum (A4/T6 equivalence)") {
    val events = graft.core.Tables(spark, sfDir).events
    val bucketed = run("q03_time_bucket")
      .agg(sum("n_events")).head().getLong(0)
    assert(bucketed == events.count())
  }

  test("intersect/except partition the key space (q51)") {
    val r = run("q51_intersect_except").head()
    val nCustomers = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").distinct().count()
    assert(r.getAs[Long]("n_both") + r.getAs[Long]("n_no_orders") == nCustomers)
  }

  test("jaccard values stay within [0, 10000] e4-bounds (t05)") {
    val j = run("t05_jaccard_adjacent")
    assert(j.filter(col("jaccard_e4") < 0 || col("jaccard_e4") > 10000).count() == 0)
    assert(j.count() > 0)
  }

  test("q17 sketches stay within error bounds of exact answers") {
    // The query now emits the error-bound audit itself (so the DuckDB
    // oracle can check the contract); pin that every audit flag is true
    // and the exact counts match an independent recomputation.
    val r = run("q17_approx_sketches").head()
    val li = graft.core.Tables(spark, sfDir).lineitem
    assert(r.getAs[Long]("exact_parts") == li.select("l_partkey").distinct().count())
    assert(r.getAs[Long]("exact_orders") == li.select("l_orderkey").distinct().count())
    Seq("parts_within_5pct", "orders_within_5pct",
        "p50_rank_within_5pct", "p95_rank_within_5pct").foreach { c =>
      assert(r.getAs[Boolean](c), s"sketch audit flag $c is false")
    }
  }

  test("BPE merge fold is greedy left-to-right (t19 kernel)") {
    // "aaaa_" under merge (a,a): greedy L2R pairs 1-2 and 3-4 → [aa, aa, _];
    // a naive replace that consumes separators would yield [aa, a, a, _].
    import spark.implicits._
    val df = Seq("aaaa").toDF("word")
      .withColumn("syms", org.apache.spark.sql.functions.expr(
        "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('_'))"))
      .withColumn("syms", graft.analysis.BpeQueries.applyMerge("a", "a"))
    assert(df.head().getSeq[String](1) == Seq("aa", "aa", "_"))
    // multi-char symbols merge without crossing boundaries: [ab, a, b, _]
    // under (ab,a) → [aba, b, _], not a match inside "ab"+"a"
    val df2 = Seq(Seq("ab", "a", "b", "_")).toDF("syms")
      .withColumn("syms", graft.analysis.BpeQueries.applyMerge("ab", "a"))
    assert(df2.head().getSeq[String](0) == Seq("aba", "b", "_"))
  }

  test("BPE training survives a word collapsing to one symbol (pairCounts guard)") {
    // 'a' merges to a single symbol after round 1's (a, _) merge; round
    // 2's pairCounts would then hit Spark's DESCENDING sequence(1, 0)
    // and element_at index 0 without the size-≥2 filter. Training must
    // instead stop cleanly when no adjacent pairs remain.
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, "a")).toDF("doc_id", "text")
    val (merges, vocab) = graft.analysis.BpeQueries.train(docs)
    assert(merges.length == 1, s"expected 1 merge then exhaustion, got $merges")
    assert(vocab.filter(size(col("syms")) === 1).count() > 0)
  }

  test("BPE training merges have monotone non-increasing counts and grow the vocab (t19)") {
    val rows = run("t19_bpe_train").collect()
    assert(rows.length == graft.analysis.BpeQueries.K)
    val cnts = rows.sortBy(_.getAs[Int]("merge_rank")).map(_.getAs[Long]("pair_cnt"))
    assert(cnts.zip(cnts.tail).forall { case (x, y) => x >= y },
      s"pair counts must be non-increasing: ${cnts.mkString(",")}")
    val merged = rows.map(_.getAs[String]("merged"))
    assert(merged.distinct.length == merged.length, "duplicate merge outputs")
  }

  test("BPE sample path: deterministic subset, bounded size, same train loop") {
    import graft.analysis.BpeQueries
    val docs = graft.core.Tables(spark, sfDir).documents
    val s1 = BpeQueries.sampleDocs(docs, 4L)
    val n = s1.count()
    // doc_id-mod keeps ~1/4; exact set is fixed, so two evaluations agree
    // row-for-row (the reproducibility `sample()` can't give), and the
    // DuckDB oracle can replay the identical subset
    assert(n > 0 && n < docs.count())
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = BpeQueries.sampleDocs(docs, 4L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
    // the sampled corpus trains through the SAME loop: merges come out
    // rank-ordered with non-increasing counts, nothing downstream changes
    val (merges, vocab) = BpeQueries.train(s1)
    vocab.unpersist()
    assert(merges.nonEmpty && merges.length <= BpeQueries.K)
    val cnts = merges.map(_._3)
    assert(cnts.zip(cnts.tail).forall { case (x, y) => x >= y })
  }

  test("BPE sample-default: sample-trained merge table equals full-corpus training (t19)") {
    import graft.analysis.BpeQueries
    // the round-8 verdict's convergence claim, pinned: on the fixture
    // corpus the default 1/4 sample learns the SAME K merges as
    // full-corpus training, and the resulting tokenizer encodes the
    // vocabulary IDENTICALLY. Rank order of near-tie merges is
    // legitimately sample-sensitive (measured: ranks 3-5 are counts
    // 784/771/770 on the sample — a permutation of disjoint merges,
    // which cannot change any encoding), so the pin is set + encoded
    // output, not rank order. (If a future corpus breaks THESE, the
    // sample genuinely diverged and the denom needs retuning.)
    val docs = graft.core.Tables(spark, sfDir).documents
    val (sampled, v1) = BpeQueries.train(BpeQueries.trainingCorpus(docs))
    val sampledVocab = v1.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    v1.unpersist()
    val (full, v2) = BpeQueries.train(docs)
    val fullVocab = v2.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    v2.unpersist()
    assert(sampled.map(m => (m._1, m._2)).toSet === full.map(m => (m._1, m._2)).toSet,
      s"merge SETS diverged:\nsample=$sampled\nfull=$full")
    // both trainings ranked over the same top-V vocab? not necessarily —
    // compare encodings on the words both saw
    val common = sampledVocab.keySet intersect fullVocab.keySet
    assert(common.nonEmpty)
    val diverged = common.filter(w => sampledVocab(w) != fullVocab(w))
    assert(diverged.isEmpty,
      s"encodings diverged for ${diverged.take(5)}: " +
        diverged.take(2).map(w => s"$w: ${sampledVocab(w)} vs ${fullVocab(w)}").mkString("; "))
  }

  test("BPE packing conserves tokens and never exceeds whitespace count (t08b vs t08)") {
    // BPE merges only ever REDUCE a word's symbol count from chars+1,
    // and every doc appears in exactly one bin.
    val bpe = run("t08b_bpe_pack").collect()
    val docs = graft.core.Tables(spark, sfDir).documents.count()
    assert(bpe.map(_.getAs[Long]("n_docs")).sum == docs)
  }

  test("exact dedup conserves the corpus (d01)") {
    val r = run("d01_dedup_exact").head()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(r.getAs[Long]("n_total_docs") == nDocs)
    assert(r.getAs[Long]("n_distinct_docs") <= nDocs)
  }

  test("every exact duplicate is a near-dup drop (d01 ⊆ d06)") {
    // identical text ⇒ identical signatures ⇒ all bands collide ⇒
    // jaccard_e4 = 10000 ≥ threshold ⇒ the higher doc_id must be dropped
    val docs = graft.core.Tables(spark, sfDir).documents
    val dupLosers = docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep"))
      .filter(col("n") > 1)
      .join(docs.select(col("doc_id"), md5(col("text")).as("h")), "h")
      .filter(col("doc_id") =!= col("keep"))
      .select("doc_id")
    val verdicts = run("d06_neardup_keepfirst")
    val missed = dupLosers.join(verdicts.filter(!col("dropped")), "doc_id").count()
    assert(missed == 0, s"$missed exact-duplicate docs not dropped by d06")
  }

  test("minhash signature overlap is symmetric-bounded (d03)") {
    val pairs = run("d03_minhash_lsh_pairs")
    assert(pairs.filter(col("n_equal_sigs") < 1 || col("n_equal_sigs") > 8).count() == 0)
    // every banded candidate shares at least one full band = 2 sigs
    assert(pairs.filter(col("n_equal_sigs") < 2).count() == 0)
  }

  test("simhash signatures are 16-bit strings (d04)") {
    val s = run("d04_simhash")
    assert(s.filter(length(col("simhash16")) =!= 16).count() == 0)
    assert(s.filter(!col("simhash16").rlike("^[01]{16}$")).count() == 0)
  }

  test("ANN brute force: top-10 sims are sorted and in [-1, 1] (s01)") {
    val top = run("s01_ann_bruteforce").collect()
    assert(top.length == 10)
    val sims = top.map(_.getAs[Long]("sim_e6"))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1000000 && s <= 1000000))
  }

  test("LSH near-dup pairs all meet the threshold (s03)") {
    val p = run("s03_embedding_neardup")
    assert(p.filter(col("sim_e6") < 300000).count() == 0)
    assert(p.count() > 0)
  }

  test("rollup total row equals table count (q06)") {
    val all = run("q06_rollup").filter(col("segment") === "ALL").head()
    val n = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(all.getAs[Long]("n_customers") == n)
  }

  test("streaming ABSA pipeline ≡ batch pipeline (st07 vs absa01)") {
    val streamed = run("st07_absa_streaming").collect()
      .map(_.toString).sorted
    val batch = run("absa01_pipeline").collect()
      .map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }

  test("exact-Jaccard near-dups are a subset of LSH candidates (d05 ⊆ d03)") {
    val candidates = run("d03_minhash_lsh_pairs")
      .select("doc_a", "doc_b").collect().map(_.toString).toSet
    val verified = run("d05_ngram_jaccard_pairs")
      .select("doc_a", "doc_b").collect().map(_.toString).toSet
    assert(verified.subsetOf(candidates),
      s"${verified.size} verified pairs not within ${candidates.size} candidates")
  }

  test("top-k ordering deterministic under re-run (q44)") {
    val a = run("q44_topk").collect().map(_.toString)
    val b = run("q44_topk").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("driver union-find and distributed label propagation produce identical clusters") {
    import graft.dedup.DedupQueries
    val docs = graft.core.Tables(spark, sfDir).documents
    val pairs = DedupQueries.verifiedPairs(docs).select("doc_a", "doc_b")
    val fast = DedupQueries.clusterLabels(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loop = DedupQueries.propagateLabels(pairs.toDF("s", "d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == loop, "hybrid CC paths disagree")
  }

  test("decontamination flags only train docs, never the eval slice (d08)") {
    val r = run("d08_decontaminate").collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("doc_id") % 50 != 0), "eval doc flagged as train")
    assert(r.forall { row =>
      row.getAs[Long]("n_contaminated") <= row.getAs[Long]("n_shingles")
    }, "contaminated shingles exceed the doc's shingle count")
  }

  test("SimHash near-dup pairs are ordered and within the Hamming bound (d09)") {
    val r = run("d09_simhash_neardup").collect()
    assert(r.nonEmpty)
    assert(r.forall(row => row.getAs[Long]("doc_a") < row.getAs[Long]("doc_b")))
    assert(r.forall { row =>
      val h = row.getAs[Int]("hamming"); h >= 0 && h <= 2
    })
  }

  test("corpus pipeline conserves gate-passing deduped docs across bins (t13)") {
    import graft.analysis.QualityQueries
    val docs = graft.core.Tables(spark, sfDir).documents
    val kept = docs.filter(QualityQueries.gopherKeep)
    val expected = kept
      .groupBy(md5(col("text"))).agg(min("doc_id").as("doc_id"))
      .count()
    val binned = run("t13_corpus_pipeline").agg(sum("n_docs")).head().getLong(0)
    assert(binned == expected, s"pipeline bins hold $binned docs, expected $expected")
  }

  test("vocabulary coverage is monotone in rank and bounded (t14)") {
    val r = run("t14_vocab_coverage").orderBy("rank").collect()
    assert(r.nonEmpty)
    val fracs = r.map(_.getAs[Long]("cum_frac_e4"))
    assert(fracs.zip(fracs.tail).forall { case (a, b) => a <= b }, "coverage not monotone")
    assert(fracs.forall(f => f > 0 && f <= 10000))
    val cnts = r.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "counts not ranked desc")
  }

  test("incremental batch dedup ≡ full-pipeline verdicts on the batch (d12 ⊆ d06-style)") {
    // d12's whole claim is differential: probing the stored index with
    // only the batch signed must equal re-running the FULL pipeline and
    // restricting to batch docs. The oracle checks it against DuckDB;
    // this pins it engine-internally too (same code both sides, but a
    // broken candidate probe — e.g. bands not unioned with the batch's
    // own — diverges here first).
    val docs = graft.core.Tables(spark, sfDir).documents
    val split = docs.agg(floor(max(col("doc_id")) * 0.8)).head().getLong(0)
    val full = graft.dedup.DedupQueries.verifiedPairs(docs)
      .filter(col("doc_b") >= split)
      .select(col("doc_b").as("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val inc = run("d12_incremental_dedup")
      .filter(col("dropped")).collect().map(_.getLong(0)).toSet
    assert(inc == full, s"incremental=${inc.size} full=${full.size}; " +
      s"diff=${(inc diff full) ++ (full diff inc)}")
  }

  test("streaming ingest gate flags exactly the cross-split pairs (st21 vs batch)") {
    // st21 dedups only against the EXISTING index (within-batch pairs
    // are the next ingest's d12 job) — its flag set must equal the
    // batch pipeline's cross-split restriction, no more, no less.
    val docs = graft.core.Tables(spark, sfDir).documents
    val split = docs.agg(floor(max(col("doc_id")) * 0.8)).head().getLong(0)
    val crossSplit = graft.dedup.DedupQueries.verifiedPairs(docs)
      .filter(col("doc_b") >= split && col("doc_a") < split)
      .select(col("doc_b").as("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val streamed = run("st21_stream_dedup_gate")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == crossSplit,
      s"streamed=${streamed.size} batch=${crossSplit.size}; " +
      s"diff=${(streamed diff crossSplit) ++ (crossSplit diff streamed)}")
  }

  test("keep-best drops exactly one side of every verified pair (d13)") {
    val verdicts = run("d13_neardup_keepbest").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val pairs = graft.dedup.DedupQueries
      .verifiedPairs(graft.core.Tables(spark, sfDir).documents)
      .select("doc_a", "doc_b").collect()
    pairs.foreach { p =>
      val (a, b) = (p.getLong(0), p.getLong(1))
      assert(verdicts(a) || verdicts(b),
        s"pair ($a, $b) survived keep-best with both docs kept")
    }
  }

  test("salted join ≡ plain join — salting changes the plan, never the result (q81)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t = graft.core.Tables(spark, sfDir)
    val weights = Seq(
      ("click", 1.5), ("view", 1.0), ("purchase", 5.0),
      ("signup", 2.0), ("error", 0.0)).toDF("event_type", "weight")
    val plain = t.events.join(weights, Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(graft.functions.Canon.cents(col("value") * col("weight"))).as("weighted_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = run("q81_salted_skew_join")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain, s"salted=$salted\nplain=$plain")
  }

  test("DPP layout join ≡ direct join — partition pruning is I/O-only (q83)") {
    import org.apache.spark.sql.functions._
    val t = graft.core.Tables(spark, sfDir)
    val direct = t.events
      .filter(col("event_type").isin("click", "view"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(graft.functions.Canon.cents(col("value"))).as("value_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val pruned = run("q83_dpp_partitioned_join")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned == direct, s"pruned=$pruned\ndirect=$direct")
  }

  test("chunk dedup conserves chunks and reconstructs untouched docs verbatim (d14)") {
    import org.apache.spark.sql.functions._
    val r = run("d14_chunk_dedup").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3))).toSeq
    // per-doc: never keep more than existed; global: kept chunks = the
    // number of distinct chunks in the corpus (each distinct chunk
    // survives exactly once, somewhere)
    assert(r.forall { case (_, n, k, _) => k <= n })
    val docs = graft.core.Tables(spark, sfDir).documents
    val distinctChunks = graft.dedup.DedupQueries.chunkRelation(docs)
      .select("chunk").distinct().count()
    assert(r.map(_._3).sum == distinctChunks,
      s"kept ${r.map(_._3).sum} != $distinctChunks distinct chunks")
    // a doc that lost nothing must reconstruct to its original text
    val originals = docs.select(col("doc_id"), md5(col("text")))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val untouched = r.filter { case (_, n, k, _) => n == k }
    assert(untouched.nonEmpty)
    untouched.foreach { case (id, _, _, h) =>
      assert(h == originals(id), s"doc $id reconstruction drifted")
    }
  }

  test("incremental chunk dedup ≡ full d14 rerun on the batch slice (d15)") {
    import org.apache.spark.sql.functions._
    val full = run("d14_chunk_dedup").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val inc = run("d15_incremental_chunk_dedup").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val splitId = graft.core.Tables(spark, sfDir).documents
      .agg(floor(max(col("doc_id")) * 0.8)).head().getLong(0)
    assert(inc.nonEmpty && inc.keySet.forall(_ >= splitId),
      "incremental verdicts leaked outside the batch")
    inc.foreach { case (id, v) =>
      assert(full(id) == v, s"doc $id: incremental $v != full-rerun ${full(id)}")
    }
    assert(inc.keySet == full.keySet.filter(_ >= splitId),
      "batch coverage mismatch vs full rerun")
  }

  test("stream chunk scrub keeps a superset of d15's verdicts; batch-dup gap explains the difference (st26)") {
    // st26 drops only KNOWN-corpus chunks (stateless gate); d15
    // additionally drops within-batch duplicates (the index-update
    // batch job). So per doc: same chunk totals, st26 keeps >= d15,
    // and the summed gap is exactly the batch-internal duplicate count.
    val gate = run("st26_stream_chunk_scrub").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val inc = run("d15_incremental_chunk_dedup").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(gate.keySet == inc.keySet, "batch doc coverage differs")
    gate.foreach { case (id, (n, k)) =>
      val (ni, ki) = inc(id)
      assert(n == ni, s"doc $id: chunk totals differ ($n vs $ni)")
      assert(k >= ki, s"doc $id: gate kept fewer than the full incremental dedup")
    }
    assert(gate.values.map(_._2).sum > inc.values.map(_._2).sum ||
           gate == inc, "gap must be zero only when the batch has no internal dups")
  }

  test("IVF rebalance conserves vectors and never decreases the cosine objective (s19)") {
    val r = run("s19_ivf_rebalance").collect()
    val nBefore = r.map(_.getLong(1)).sum
    val nAfter = r.map(_.getLong(2)).sum
    assert(nBefore == nAfter, s"rebalance lost vectors: $nBefore -> $nAfter")
    val objBefore = r.map(_.getLong(3)).sum
    val objAfter = r.map(_.getLong(4)).sum
    // spherical-Lloyd step + reassignment are both objective-non-decreasing;
    // allow nAfter slack for the per-row e6 floor (each floor error < 1)
    assert(objAfter >= objBefore - nAfter,
      s"objective decreased: $objBefore -> $objAfter over $nAfter vectors")
  }

  test("PQ codebook refresh: error mass non-increasing; persisted re-encoded index serves identically (s20)") {
    import graft.similarity.SimilarityQueries._
    import org.apache.spark.sql.DataFrame
    val r = run("s20_pq_codebook_refresh").collect()
    val na = r.map(_.getAs[Long]("n_after")).sum
    assert(r.map(_.getAs[Long]("n_before")).sum == na, "refresh lost vectors")
    val eb = r.map(_.getAs[Long]("err_before_e6")).sum
    val ea = r.map(_.getAs[Long]("err_after_e6")).sum
    // one Lloyd step (update to member means + reassignment) never
    // increases the total squared error in exact arithmetic; the e9
    // mean quantization and per-term e6 floors stay far inside the
    // fixture's decrease
    assert(ea <= eb, s"Lloyd step increased error mass: $eb -> $ea")
    assert(ea < eb, "refresh was a no-op on the fixture — no codeword moved")
    // artifact seam: the refreshed codebook and re-encoded codes
    // round-trip parquet, re-encoding against the PERSISTED codebook
    // reproduces the persisted codes, and an ADC serve from the
    // persisted artifacts ranks identically to the in-memory index
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val svs = subspaced(emb)
    val cb0 = pqSubCodebook(centroids(emb))
    val codes0 = pqCodesSub(svs, cb0)
    val cb1 = pqRefineCodebook(svs, codes0, cb0)
    val codes1 = pqCodesSub(svs, cb1)
    val cbDir = java.nio.file.Files.createTempDirectory("graft_s20_cb_").toString
    val cdDir = java.nio.file.Files.createTempDirectory("graft_s20_cd_").toString
    cb1.write.mode("overwrite").parquet(cbDir)
    codes1.write.mode("overwrite").parquet(cdDir)
    val cbBack = spark.read.parquet(cbDir)
    val cdBack = spark.read.parquet(cdDir)
    val reenc = pqCodesSub(svs, cbBack).select("vec_id", "m", "code")
    assert(reenc.except(cdBack.select("vec_id", "m", "code")).isEmpty &&
      cdBack.select("vec_id", "m", "code").except(reenc).isEmpty,
      "re-encode against the persisted codebook diverges from the persisted codes")
    def adcTop5(codes: DataFrame, cb: DataFrame): Seq[(Long, Long)] = {
      val q = svs.filter(col("vec_id") === 0).select(col("m"), col("sv").as("qv"))
      val lut = cb.join(q, Seq("m"))
        .select(col("m"), col("cid").as("code"),
          floor(aggregate(zip_with(col("w"), col("qv"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x) * 1000000 + 0.5).cast("long").as("ld_e6"))
      codes.filter(col("vec_id") =!= 0).join(broadcast(lut), Seq("m", "code"))
        .groupBy("vec_id").agg(sum(col("ld_e6")).as("adc_e6"))
        .orderBy(col("adc_e6").asc, col("vec_id").asc).limit(5)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    }
    assert(adcTop5(cdBack, cbBack) == adcTop5(codes1, cb1),
      "ADC serve from persisted artifacts diverges from the in-memory index")
  }

  test("ANN delete: tombstone-filtered serve ≡ compacted-layout serve; deleted ids gone (s21)") {
    val (tombServe, compServe) =
      graft.similarity.SimilarityQueries.s21Serves(spark, sfDir)
    val a = tombServe.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val b = compServe.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(a.nonEmpty, "serve returned no rows")
    assert(a == b,
      s"tombstone serve and compacted serve diverge:\n  tomb=$a\n  comp=$b")
    assert(a.forall { case (vid, _, _) => vid % 10 != 3 },
      "a deleted vec_id surfaced in the serve")
  }

  test("token packing: spans tile each shard's token axis exactly (t25)") {
    val r = run("t25_token_pack").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    // within a (shard, seq): spans are disjoint and ordered by doc id;
    // every sequence except the shard's last holds exactly 128 tokens
    r.groupBy(s => (s._1, s._2)).foreach { case ((shard, seq), spans) =>
      val sorted = spans.sortBy(_._3)
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a._5 == b._4,
          s"gap/overlap in shard $shard seq $seq: ${a._5} vs ${b._4}")
      }
      val lastSeq = r.filter(_._1 == shard).map(_._2).max
      val total = sorted.map(s => s._5 - s._4).sum
      if (seq < lastSeq)
        assert(total == 128L, s"shard $shard seq $seq holds $total tokens, not 128")
      else assert(total <= 128L)
      assert(sorted.head._4 == 0L,
        s"shard $shard seq $seq does not start at offset 0 (coverage gap)")
      assert(sorted.forall(s => s._4 >= 0 && s._5 <= 128 && s._4 < s._5))
    }
    // global conservation: span lengths sum to the corpus token count
    val corpusTokens = graft.core.Tables(spark, sfDir).documents
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("n") > 0).agg(sum("n")).head().getLong(0)
    assert(r.map(s => s._5 - s._4).sum == corpusTokens,
      "packed spans lost or duplicated tokens")
  }

  test("chunking: windows cover every token, overlap by stride, reconstruct the doc (t26)") {
    val r = run("t26_chunk_overlap").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
                 x.getLong(4), x.getString(5)))
    val docs = graft.core.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (docId, chunks) =>
      val sorted = chunks.sortBy(_._2)
      val toks = docs(docId).split(" ", -1)
      // contiguous ids; starts step by the stride; first covers 0, last reaches n
      assert(sorted.map(_._2) sameElements sorted.indices.map(_.toLong))
      assert(sorted.head._3 == 0L)
      assert(sorted.last._4 == toks.length.toLong,
        s"doc $docId: last chunk ends ${sorted.last._4}, doc has ${toks.length} tokens")
      sorted.foreach { case (_, k, st, en, nTok, textChunk) =>
        assert(st == k * 48 && en == math.min(k * 48 + 64, toks.length.toLong))
        assert(nTok == en - st && nTok >= 1 && nTok <= 64)
        // the chunk text IS the token slice — reconstruction-exact
        assert(textChunk == toks.slice(st.toInt, en.toInt).mkString(" "),
          s"doc $docId chunk $k text does not match its token span")
      }
      // consecutive windows overlap (W=64 > S=48) — no token falls in a seam
      sorted.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(1)._3 < p(0)._4, s"doc $docId: gap between chunks ${p(0)._2}/${p(1)._2}")
      }
    }
  }

  test("cluster-safe split: near-dup pairs never straddle the train/val boundary (d19)") {
    val r = run("d19_cluster_safe_split").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val docs = graft.core.Tables(spark, sfDir).documents
    assert(r.length == docs.count(), "split must assign every document exactly once")
    val splitOf = r.map(x => x._1 -> x._3).toMap
    // clusters are monochromatic, and the rule applied to the rep is ml04's
    r.groupBy(_._2).foreach { case (rep, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"cluster $rep spans both sides of the split")
      assert(rows.head._3 == (if (rep % 5 < 4) "train" else "val"))
    }
    // the leakage pin itself: every VERIFIED near-dup pair lands same-side
    val pairs = graft.dedup.DedupQueries.verifiedPairs(docs)
      .select("doc_a", "doc_b").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs — the spec is vacuous")
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b),
        s"near-dups $a/$b straddle the split: ${splitOf(a)} vs ${splitOf(b)}")
    }
    // and the per-doc rule WOULD have leaked on this fixture (non-vacuity)
    assert(pairs.exists { case (a, b) =>
      (if (a % 5 < 4) "train" else "val") != (if (b % 5 < 4) "train" else "val")
    }, "fixture never exercises the cluster-vs-doc rule difference")
  }

  test("SCD2 history conserves keys and versions correctly (q75)") {
    val r = run("q75_scd2_dim").collect()
    val nCustomers = spark.read.parquet(s"$sfDir/customer.parquet").count()
    // exactly one current row per key; changed keys have exactly one
    // closed historical row; every closed row has a valid_to
    val byKey = r.groupBy(_.getLong(0))
    assert(byKey.size == nCustomers)
    byKey.foreach { case (k, rows) =>
      val current = rows.filter(_.getBoolean(4))
      assert(current.length == 1, s"key $k has ${current.length} current rows")
      val closed = rows.filterNot(_.getBoolean(4))
      assert(closed.forall(!_.isNullAt(3)), s"key $k has an open historical row")
      assert(closed.length == (if (k % 7 == 3) 1 else 0))
    }
  }

  test("q85 constraint report: the generator's data contract holds (q85)") {
    // A testdata regeneration that breaks pk-uniqueness, the
    // orders→customer FK, or the status domain should fail HERE with a
    // named constraint, not as 40 mysterious query mismatches — the
    // relational twin of SchemaAudit's dtype canary.
    val r = run("q85_quality_constraints").collect()
    assert(r.length == 5)
    val failed = r.filterNot(_.getAs[Boolean]("passed"))
      .map(x => s"${x.getAs[String]("constraint")} " +
        s"(${x.getAs[Long]("n_violations")} violations)")
    assert(failed.isEmpty, s"data contract broken: ${failed.mkString("; ")}")
  }

  test("profiler is schema-generic: adversarial column names, dup names, maps, nulls (q84 kernel)") {
    // The profile() doc claims ANY table works — pin it on a schema
    // designed to collide: a column literally named n_rows, a dotted
    // name, DUPLICATE names, a non-orderable map, a non-money double,
    // and nulls.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("n_rows", LongType), StructField("a.b", StringType),
      StructField("dup", IntegerType), StructField("dup", StringType),
      StructField("m", MapType(StringType, LongType)),
      StructField("tiny", DoubleType)))
    val data = java.util.Arrays.asList(
      Row(5L, "x", 1, "p", Map("k" -> 1L), 0.004),
      Row(null, "y", 2, "q", null, 0.5),
      Row(7L, null, 3, null, Map("k" -> 2L), null),
      Row(5L, "y", 1, "p", Map.empty[String, Long], 0.004))
    val adv = spark.createDataFrame(data, schema)
    val rows = graft.operators.ProfilingQueries.profile(adv).collect()
    assert(rows.length == 6, "one profile row per column, duplicates included")
    val p = rows.map(r => r.getAs[String]("col_name") -> r).toMap
    assert(p.keySet == Set("n_rows", "a.b", "dup", "m", "tiny"))
    assert(p("n_rows").getAs[Long]("n_rows") == 4)
    assert(p("n_rows").getAs[Long]("n_null") == 1)
    assert(p("n_rows").getAs[Long]("n_distinct") == 2)
    assert(p("n_rows").getAs[String]("min_repr") == "5")
    assert(p("n_rows").getAs[String]("max_repr") == "7")
    assert(p("a.b").getAs[Long]("n_null") == 1)
    assert(p("a.b").getAs[Long]("n_distinct") == 2)
    assert(p("a.b").getAs[String]("max_repr") == "y")
    // duplicate names: BOTH columns profiled independently (positional
    // addressing) — distinguish them by their differing stats
    val dups = rows.filter(_.getAs[String]("col_name") == "dup")
    assert(dups.map(_.getAs[String]("max_repr")).toSet == Set("3", "q"))
    // map column: counts exact, stats the documented NULL skip
    assert(p("m").getAs[Long]("n_null") == 1)
    assert(p("m").isNullAt(p("m").fieldIndex("n_distinct")))
    assert(p("m").isNullAt(p("m").fieldIndex("min_repr")))
    // a generic double is NOT money: 0.004 must survive, not collapse
    // to cents "0" (doubles opt into cents via moneyCols only)
    assert(p("tiny").getAs[String]("min_repr") == "0.004")
    assert(p("tiny").getAs[Long]("n_null") == 1)
  }

  test("constraint suggestion is schema-generic: dotted names, empty rule sets, row-local subset (q88 kernel)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.operators.ProfilingQueries
    // dotted/special names: positional addressing must not parse them
    // as nested-field paths (the failure mode profile() already pins)
    val schema = StructType(Seq(
      StructField("a.b", LongType), StructField("st at us", StringType)))
    val train = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "ok"), Row(2L, "ok"), Row(3L, "bad")), schema)
    val eval = spark.createDataFrame(java.util.Arrays.asList(
      Row(2L, "ok"), Row(9L, "novel"), Row(null, "bad")), schema)
    val rep = ProfilingQueries.suggestedConstraintReport(train, eval)
      .collect().map(r => r.getAs[String]("constraint") -> r).toMap
    assert(rep.keySet == Set("not_null:a.b", "unique:a.b", "range:a.b",
      "not_null:st at us", "domain:st at us"))
    assert(rep("not_null:a.b").getAs[Long]("n_violations") == 1L)
    assert(rep("range:a.b").getAs[Long]("n_violations") == 1L, "9 lies above train max 3")
    assert(rep("domain:st at us").getAs[Long]("n_violations") == 1L, "'novel' not in train domain")
    assert(rep("unique:a.b").getAs[Long]("n_violations") == 0L)
    // empty train → no rules suggested → EMPTY report, not an
    // explode(array()) analysis error
    val emptyTrain = train.filter(col("`a.b`") < 0L)
    val emptyRep = ProfilingQueries.suggestedConstraintReport(emptyTrain, eval)
    assert(emptyRep.columns.toSeq ==
      Seq("constraint", "n_checked", "n_violations", "passed"))
    assert(emptyRep.count() == 0L)
    // row-local subset (the live gate's kinds): per-slice evaluations
    // SUM to exactly the whole-slice report — the mergeability st31
    // relies on; `unique` is excluded because it does not merge
    val sc = ProfilingQueries.suggestConstraints(train,
      kinds = ProfilingQueries.rowLocalRuleKinds)
    assert(sc.rules.forall(_.kind != "unique"))
    val whole = ProfilingQueries.evaluateConstraints(eval, sc)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val slices = Seq(eval.filter(col("`a.b`").isNull || col("`a.b`") <= 2L),
                     eval.filter(col("`a.b`") > 2L))
      .map(s => ProfilingQueries.evaluateConstraints(s, sc)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    val summed = slices.flatten.groupBy(_._1).map { case (k, vs) =>
      (k, vs.map(_._2).sum, vs.map(_._3).sum) }.toSeq.sortBy(_._1)
    assert(summed == whole.toSeq, "row-local rule evaluation must merge by summation")
  }

  test("incremental profile: persisted partials fold to the full-rescan report (q86 kernel)") {
    import graft.operators.ProfilingQueries._
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    // three disjoint slices, any grouping — merged must equal one-shot
    val parts = partialProfile(o.filter(col("o_orderkey") % 3 === 0))
      .unionByName(partialProfile(o.filter(col("o_orderkey") % 3 === 1)))
      .unionByName(partialProfile(o.filter(col("o_orderkey") % 3 === 2)))
    val merged = mergedProfile(parts, o.schema, Set("o_totalprice")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val full = profile(o, Set("o_totalprice")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(merged.keySet == full.keySet)
    merged.keySet.foreach { c =>
      assert(merged(c).getAs[Long]("n_rows") == full(c).getAs[Long]("n_rows"), c)
      assert(merged(c).getAs[Long]("n_null") == full(c).getAs[Long]("n_null"), c)
      assert(merged(c).getAs[String]("min_repr") == full(c).getAs[String]("min_repr"), c)
      assert(merged(c).getAs[String]("max_repr") == full(c).getAs[String]("max_repr"), c)
      val est = merged(c).getAs[Long]("n_distinct_est")
      val exact = full(c).getAs[Long]("n_distinct")
      assert(math.abs(est - exact) <= exact * 0.05, s"$c: est=$est exact=$exact")
    }
    // store compaction: folding the partials into ONE partial row must
    // leave the report unchanged — the O(1)-store rewrite st29 promises
    val compacted = compactPartials(parts, o.schema)
    assert(compacted.count() == 1, "compaction must yield one partial row")
    val viaCompact = mergedProfile(compacted, o.schema, Set("o_totalprice"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    merged.keySet.foreach { c =>
      assert(viaCompact(c).toSeq == merged(c).toSeq,
        s"$c: report over compacted store diverges from original partials")
    }
  }

  test("table profile agrees with directly-computed ground truth (q84)") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val r = run("q84_table_profile").collect()
      .map(x => x.getAs[String]("col_name") -> x).toMap
    assert(r.keySet == o.columns.toSet, "one profile row per column")
    val n = o.count()
    assert(r.values.forall(_.getAs[Long]("n_rows") == n))
    val ndKey = o.select("o_orderkey").distinct().count()
    assert(r("o_orderkey").getAs[Long]("n_distinct") == ndKey)
    assert(r("o_orderstatus").getAs[Long]("n_distinct") == 3)
  }

  test("shuffle-shard is a deterministic permutation with balanced shards (t22)") {
    val r = run("t22_shuffle_shard").collect()
    val docs = graft.core.Tables(spark, sfDir).documents
    val n = docs.count()
    // permutation: every doc appears exactly once
    assert(r.length == n && r.map(_.getAs[Long]("doc_id")).distinct.length == n)
    // each shard's positions are exactly 1..|shard|
    r.groupBy(_.getAs[Long]("shard")).foreach { case (s, rows) =>
      val pos = rows.map(_.getAs[Long]("pos")).sorted
      assert(pos.sameElements(1L to rows.length),
        s"shard $s positions are not 1..${rows.length}")
    }
    // hash-uniform balance: no shard more than 2x the ideal share
    val sizes = r.groupBy(_.getAs[Long]("shard")).map(_._2.length)
    assert(sizes.max <= 2 * (n / 4 + 1).toInt,
      s"shard skew: sizes=${sizes.mkString(",")}")
    // seeded determinism is parallelism-independent: recompute the
    // assignment from a GENUINELY differently-partitioned input (7-way
    // round-robin repartition, not a re-read of the same file layout)
    // and under a different shuffle parallelism — identical rows
    val again = graft.analysis.QualityQueries
      .shuffleShard(docs.repartition(7)).collect()
    assert(r.map(_.toString).sorted.sameElements(again.map(_.toString).sorted),
      "shard/pos assignment depends on input partitioning")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val under3 = try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      graft.analysis.QualityQueries.shuffleShard(docs.repartition(7)).collect()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(r.map(_.toString).sorted.sameElements(under3.map(_.toString).sorted),
      "shard/pos assignment depends on shuffle parallelism")
  }
}
