package graft.ml

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** ML batch-job surface (SURVEY §2.11 M1/M4/M5) + the ABSA scoring
  * pipeline (U1/U2/U7) with its deterministic stub scorer.
  */
object MlQueries extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "ml01_label_decode",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // M1: the reference decodes −1/0/1/2 aspect codes into presence +
        // sentiment class (train_absa_model.py:103-127). Emulated over
        // documents with a deterministic synthetic code.
        val code = (col("n_chars") % 4) - 1
        t.documents
          .select(col("doc_id"), code.as("code"),
            (code >= 0).as("aspect_present"),
            when(code === 0, "NEU").when(code === 1, "POS")
              .when(code === 2, "NEG").otherwise("NONE").as("sentiment"))
          .groupBy("sentiment")
          .agg(count(lit(1)).as("n"),
               sum(when(col("aspect_present"), 1).otherwise(0)).as("n_present"))
      },
      Some("""SELECT sentiment, count(*) AS n,
             |  CAST(sum(CASE WHEN code >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_present
             |FROM (SELECT (n_chars % 4) - 1 AS code,
             |        CASE (n_chars % 4) - 1 WHEN 0 THEN 'NEU' WHEN 1 THEN 'POS'
             |          WHEN 2 THEN 'NEG' ELSE 'NONE' END AS sentiment
             |      FROM documents)
             |GROUP BY sentiment""".stripMargin),
      "M1: label decode (−1/0/1/2 codes → presence + sentiment; train_absa_model.py:103-127)"),

    GraftQuery(
      "ml02_metrics",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // M4: per-class precision/recall/F1 (evaluate_absa_model.py:128-203)
        // over a deterministic pseudo-prediction (vec_id mod 10). Ratios as
        // scaled ints: tp/fp/fn are exact, so the divisions are identical
        // doubles in every engine.
        val pred = t.embeddings.select(col("vec_id"), col("label"),
          (col("vec_id") % 10).cast("int").as("pred"))
        val classes = pred.select(col("label").as("cls")).distinct()
        val tp = pred.filter(col("pred") === col("label"))
          .groupBy(col("label").as("cls")).agg(count(lit(1)).as("tp"))
        val byPred = pred.groupBy(col("pred").as("cls")).agg(count(lit(1)).as("n_pred"))
        val byLabel = pred.groupBy(col("label").as("cls")).agg(count(lit(1)).as("n_label"))
        classes.join(tp, Seq("cls"), "left").join(byPred, Seq("cls"), "left")
          .join(byLabel, Seq("cls"), "left")
          .na.fill(0, Seq("tp", "n_pred", "n_label"))
          .select(col("cls"), col("tp"), col("n_pred"), col("n_label"),
            floor(col("tp") * 10000.0 / col("n_pred") + 0.5).cast(LongType).as("precision_e4"),
            floor(col("tp") * 10000.0 / col("n_label") + 0.5).cast(LongType).as("recall_e4"),
            floor(col("tp") * 2.0 * 10000.0 / (col("n_pred") + col("n_label")) + 0.5)
              .cast(LongType).as("f1_e4"))
      },
      Some("""WITH pred AS (
             |  SELECT vec_id, label, CAST(vec_id % 10 AS INTEGER) AS pred FROM embeddings),
             |cls AS (SELECT DISTINCT label AS cls FROM pred),
             |tp AS (SELECT label AS cls, count(*) AS tp FROM pred WHERE pred = label GROUP BY label),
             |np AS (SELECT pred AS cls, count(*) AS n_pred FROM pred GROUP BY pred),
             |nl AS (SELECT label AS cls, count(*) AS n_label FROM pred GROUP BY label)
             |SELECT c.cls,
             |  coalesce(tp.tp, 0) AS tp, coalesce(np.n_pred, 0) AS n_pred,
             |  coalesce(nl.n_label, 0) AS n_label,
             |  CAST(floor(coalesce(tp.tp, 0) * 10000.0 / coalesce(np.n_pred, 0) + 0.5) AS BIGINT) AS precision_e4,
             |  CAST(floor(coalesce(tp.tp, 0) * 10000.0 / coalesce(nl.n_label, 0) + 0.5) AS BIGINT) AS recall_e4,
             |  CAST(floor(coalesce(tp.tp, 0) * 2.0 * 10000.0 / (coalesce(np.n_pred, 0) + coalesce(nl.n_label, 0)) + 0.5) AS BIGINT) AS f1_e4
             |FROM cls c LEFT JOIN tp ON tp.cls = c.cls
             |LEFT JOIN np ON np.cls = c.cls LEFT JOIN nl ON nl.cls = c.cls""".stripMargin),
      "M4: per-class precision/recall/F1 DataFrame agg (evaluate_absa_model.py:128-203)"),

    GraftQuery(
      "ml03_deploy_gate",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // M5: deploy iff candidate − current > 0.01 overall score
        // (evaluate_absa_model.py:332-346). Scores = accuracy of two
        // deterministic pseudo-models (mod-10 vs mod-10-shifted).
        val scored = t.embeddings.select(
          when(col("vec_id") % 10 === col("label"), 1).otherwise(0).as("hit_current"),
          when((col("vec_id") + 1) % 10 === col("label"), 1).otherwise(0).as("hit_candidate"))
        scored.agg(
          floor(avg(col("hit_current")) * 10000 + 0.5).cast(LongType).as("current_e4"),
          floor(avg(col("hit_candidate")) * 10000 + 0.5).cast(LongType).as("candidate_e4"))
          .select(col("current_e4"), col("candidate_e4"),
            (col("candidate_e4") - col("current_e4") > 100).as("deploy"))
      },
      Some("""SELECT current_e4, candidate_e4, (candidate_e4 - current_e4 > 100) AS deploy
             |FROM (SELECT
             |  CAST(floor(avg(CASE WHEN vec_id % 10 = label THEN 1 ELSE 0 END) * 10000 + 0.5) AS BIGINT) AS current_e4,
             |  CAST(floor(avg(CASE WHEN (vec_id + 1) % 10 = label THEN 1 ELSE 0 END) * 10000 + 0.5) AS BIGINT) AS candidate_e4
             |FROM embeddings)""".stripMargin),
      "M5: deploy gate — candidate beats current by >0.01 (evaluate_absa_model.py:332-346)"),

    GraftQuery(
      "ml04_train_split",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // M2: the reference's 80/20 split is POSITIONAL (train_absa_model
        // .py:145-152) — deterministic modulo split preserves that
        // property distributively (randomSplit would not be oracle-stable).
        t.documents
          .select(col("doc_id"),
            when(col("doc_id") % 5 < 4, "train").otherwise("val").as("split"))
          .groupBy("split").agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      },
      Some("""SELECT split, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM (SELECT doc_id,
             |        CASE WHEN doc_id % 5 < 4 THEN 'train' ELSE 'val' END AS split
             |      FROM documents)
             |GROUP BY split""".stripMargin),
      "M2: deterministic 80/20 train/val split (train_absa_model.py:145-152)"),

    GraftQuery(
      "ml05_retrain_cycle",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // The reference's retrain DAG (absa_model_retrain_dag.py:30-106)
        // chains: new data → label decode → split → train → eval →
        // deploy gate. ml01-ml04 prove each stage alone; this runs the
        // whole cycle as ONE dataflow over two scenarios sharing one
        // scan — 'stale' (rerun with no new data: candidate ≡ current)
        // and 'retrained' (candidate learned every 3rd val example, the
        // planted quality delta) — and the gate must flip between them.
        // Train stage itself stays the external seam (M3 per SURVEY §2);
        // what's composed here is everything the DAG runs around it.
        val split = t.embeddings.select(col("vec_id"), col("label"),
          when(col("vec_id") % 5 < 4, "train").otherwise("val").as("split"))
        val counts = split.agg(
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
        // M1: decode the integer label into the class vocabulary the
        // metrics report over
        val decoded = split.filter(col("split") === "val")
          .select(col("vec_id"), col("label"),
            when(col("label") % 3 === 0, "NEU")
              .when(col("label") % 3 === 1, "POS").otherwise("NEG").as("cls"))
        val scen = decoded
          .select(col("vec_id"), col("label"), col("cls"),
            explode(array(lit("retrained"), lit("stale"))).as("scenario"))
          .select(col("scenario"), col("label"), col("cls"),
            (col("vec_id") % 10).cast("int").as("pred_current"),
            when(col("scenario") === "retrained" && col("vec_id") % 3 === 0,
              col("label").cast("int"))
              .otherwise((col("vec_id") % 10).cast("int")).as("pred_candidate"))
        // M4: overall accuracy + per-class recall for both models; both
        // aggs share the scenario clustering
        val overall = scen.groupBy("scenario").agg(
          floor(avg(when(col("pred_current") === col("label"), 1).otherwise(0)) * 10000 + 0.5)
            .cast(LongType).as("current_e4"),
          floor(avg(when(col("pred_candidate") === col("label"), 1).otherwise(0)) * 10000 + 0.5)
            .cast(LongType).as("candidate_e4"))
        val perClass = scen.groupBy("scenario", "cls").agg(
          floor(sum(when(col("pred_current") === col("label"), 1).otherwise(0))
            * 10000.0 / count(lit(1)) + 0.5).cast(LongType).as("cur_recall_e4"),
          floor(sum(when(col("pred_candidate") === col("label"), 1).otherwise(0))
            * 10000.0 / count(lit(1)) + 0.5).cast(LongType).as("cand_recall_e4"))
        val minRec = perClass.groupBy("scenario").agg(
          min(col("cur_recall_e4")).as("cur_min_recall_e4"),
          min(col("cand_recall_e4")).as("cand_min_recall_e4"))
        // M5: deploy iff overall improves >1% AND no class regressed —
        // the per-class guard is what the metrics stage feeds the gate
        overall.join(minRec, "scenario").crossJoin(broadcast(counts))
          .select(col("scenario"), col("n_train"), col("n_val"),
            col("current_e4"), col("candidate_e4"), col("cand_min_recall_e4"),
            (col("candidate_e4") - col("current_e4") > 100 &&
             col("cand_min_recall_e4") >= col("cur_min_recall_e4")).as("deploy"))
      },
      Some("""WITH split AS (
             |  SELECT vec_id, label,
             |    CASE WHEN vec_id % 5 < 4 THEN 'train' ELSE 'val' END AS split
             |  FROM embeddings),
             |counts AS (
             |  SELECT CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             |         CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val
             |  FROM split),
             |decoded AS (
             |  SELECT vec_id, label,
             |    CASE label % 3 WHEN 0 THEN 'NEU' WHEN 1 THEN 'POS' ELSE 'NEG' END AS cls
             |  FROM split WHERE split = 'val'),
             |scen AS (
             |  SELECT s.scenario, d.label, d.cls,
             |    CAST(d.vec_id % 10 AS INTEGER) AS pred_current,
             |    CASE WHEN s.scenario = 'retrained' AND d.vec_id % 3 = 0
             |         THEN CAST(d.label AS INTEGER)
             |         ELSE CAST(d.vec_id % 10 AS INTEGER) END AS pred_candidate
             |  FROM (SELECT 'retrained' AS scenario UNION ALL SELECT 'stale') s
             |  CROSS JOIN decoded d),
             |overall AS (
             |  SELECT scenario,
             |    CAST(floor(avg(CASE WHEN pred_current = label THEN 1 ELSE 0 END) * 10000 + 0.5) AS BIGINT) AS current_e4,
             |    CAST(floor(avg(CASE WHEN pred_candidate = label THEN 1 ELSE 0 END) * 10000 + 0.5) AS BIGINT) AS candidate_e4
             |  FROM scen GROUP BY scenario),
             |per_class AS (
             |  SELECT scenario, cls,
             |    CAST(floor(sum(CASE WHEN pred_current = label THEN 1 ELSE 0 END) * 10000.0 / count(*) + 0.5) AS BIGINT) AS cur_recall_e4,
             |    CAST(floor(sum(CASE WHEN pred_candidate = label THEN 1 ELSE 0 END) * 10000.0 / count(*) + 0.5) AS BIGINT) AS cand_recall_e4
             |  FROM scen GROUP BY scenario, cls),
             |min_rec AS (
             |  SELECT scenario, min(cur_recall_e4) AS cur_min_recall_e4,
             |         min(cand_recall_e4) AS cand_min_recall_e4
             |  FROM per_class GROUP BY scenario)
             |SELECT o.scenario, c.n_train, c.n_val, o.current_e4, o.candidate_e4,
             |  m.cand_min_recall_e4,
             |  (o.candidate_e4 - o.current_e4 > 100
             |   AND m.cand_min_recall_e4 >= m.cur_min_recall_e4) AS deploy
             |FROM overall o JOIN min_rec m ON m.scenario = o.scenario
             |CROSS JOIN counts c""".stripMargin),
      "M1-M5 composed: retrain cycle — decode → split → val metrics → gate flips on a planted delta (absa_model_retrain_dag.py:30-106)"),

    GraftQuery(
      "absa01_pipeline",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // U1+U2+U7 end to end: stub-scorer inference (per-executor lazy
        // model, mapPartitions) → native argmax decode → per-aspect
        // regexp_extract columns → label distribution.
        val scored = AbsaPipeline.withProbs(t.documents)
        AbsaPipeline.decoded(scored)
          .groupBy("value_label", "table_label", "stream_label")
          .agg(count(lit(1)).as("n_docs"))
      },
      Some("""WITH scored AS (
             |  SELECT doc_id,
             |    CASE WHEN n_pos > n_neg THEN 'POS'
             |         WHEN n_neg > n_pos THEN 'NEG' ELSE 'NEU' END AS sent,
             |    has_value, has_table, has_stream
             |  FROM (
             |    SELECT doc_id,
             |      CAST((length(t) - length(replace(t, ' fast ', ''))) / 6
             |         + (length(t) - length(replace(t, ' big ', ''))) / 5 AS BIGINT) AS n_pos,
             |      CAST((length(t) - length(replace(t, ' slow ', ''))) / 6
             |         + (length(t) - length(replace(t, ' small ', ''))) / 7 AS BIGINT) AS n_neg,
             |      (text LIKE '%value%') AS has_value,
             |      (text LIKE '%table%') AS has_table,
             |      (text LIKE '%stream%') AS has_stream
             |    FROM (SELECT doc_id, text, ' ' || text || ' ' AS t FROM documents)))
             |SELECT
             |  CASE WHEN has_value THEN sent ELSE 'ABSENT' END AS value_label,
             |  CASE WHEN has_table THEN sent ELSE 'ABSENT' END AS table_label,
             |  CASE WHEN has_stream THEN sent ELSE 'ABSENT' END AS stream_label,
             |  count(*) AS n_docs
             |FROM scored
             |GROUP BY 1, 2, 3""".stripMargin),
      "U1/U2/U7: ABSA inference pipeline with per-executor lazy stub model"))
}
