package graft.similarity

import graft.{GraftQuery, QueryPack}
import graft.core.Tables
import graft.functions.CosineSim.cosineFast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Similarity-search pack (north star; SURVEY §2.4 J7):
  *
  *   - s01: brute-force cosine top-k against a query vector — the exact
  *     baseline. Distributed shape: broadcast the query, one narrow pass
  *     over the vectors, TakeOrderedAndProject for the top-k (no sort).
  *   - s02: random-hyperplane LSH (SimHash-for-vectors): 8 signed
  *     projections → 8-bit bucket; ANN = rerank within the query's bucket.
  *     At 100 TB the bucket join replaces the full scan; hyperplanes are
  *     seeded constants broadcast as literals.
  *   - s03: near-duplicate vector pairs — 2-bit hyperplane blocking, then
  *     exact cosine within blocks. Shuffle is O(n) by bucket, never the
  *     O(n²) cross join.
  *
  * Vector math uses higher-order functions on array<double> (codegen'd;
  * no UDF, no MLlib dependency).
  */
object SimilarityQueries extends QueryPack {

  /** Σ aᵢ·bᵢ via zip_with + left-fold — sequential order matches other
    * engines' list_sum for bitwise-reproducible doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Deterministic seeded hyperplanes: nPlanes × dim gaussians. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket string of `v` under the given hyperplanes. */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    concat(planes.map { p =>
      val lp = array(p.toIndexedSeq.map(lit(_)): _*)
      when(dot(v, lp) >= 0, "1").otherwise("0")
    }: _*)

  private def doubled(t: Tables): DataFrame =
    t.embeddings.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))

  /** Oracle-side twin of `lshBucket`: the seeded hyperplanes are embedded
    * as double literals (Double.toString round-trips exactly), so the SQL
    * engine computes the identical bucket strings. */
  private def bucketSql(planes: Seq[Array[Double]], v: String): String =
    planes.map { p =>
      val lit = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> $v[i] * $lit[i])) >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** Embedding near-dup pairs (the s03 pipeline): 2-bit hyperplane
    * blocking, exact cosine inside blocks, pairs with sim ≥ minSim.
    * Linear shuffle by bucket; AQE splits skewed buckets. */
  def embeddingNeardupPairs(t: Tables, minSim: Double = 0.3): DataFrame = {
    val planes = hyperplanes(2, 64)
    val emb = doubled(t).withColumn("bucket", lshBucket(col("v"), planes))
    val a = emb.select(col("bucket"), col("vec_id").as("vec_a"), col("v").as("va"))
    val b = emb.select(col("bucket"), col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosineFast(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Shared oracle CTEs for the near-dup pair mining (`p` = pairs). */
  private def neardupPairsCte: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v, ${bucketSql(hyperplanes(2, 64), "v")} AS bucket FROM v),
       |p AS (SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       |        list_sum(list_transform(range(1, 65), i -> a.v[i] * b2.v[i])) /
       |        sqrt(list_sum(list_transform(a.v, x -> x * x)) *
       |             list_sum(list_transform(b2.v, x -> x * x))) AS sim
       |      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
       |""".stripMargin

  private val exactAndLsh: Seq[GraftQuery] = Seq(

    GraftQuery(
      "s01_ann_bruteforce",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val emb = doubled(t)
        val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), col("label"), cosineFast(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
          .select(col("vec_id"), col("label"),
                  floor(col("sim") * 1000000 + 0.5).cast(LongType).as("sim_e6"))
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
             |s AS (
             |  SELECT vec_id, label,
             |    list_sum(list_transform(range(1, 65), i -> v[i] * qv[i])) /
             |      sqrt(list_sum(list_transform(v, x -> x * x)) *
             |           list_sum(list_transform(qv, x -> x * x))) AS sim
             |  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v
             |        FROM embeddings WHERE vec_id <> 0), q)
             |SELECT vec_id, label,
             |  CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS sim_e6
             |FROM s ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin),
      "J7/north star: exact cosine top-10 ANN baseline (broadcast query)"),

    GraftQuery(
      "s02_ann_lsh_bucketed",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // ANN scale path: prefilter to the query's 4-bit hyperplane bucket
        // (1/16 of the corpus in expectation), exact-rerank only within it.
        val planes = hyperplanes(4, 64)
        val emb = doubled(t).withColumn("bucket", lshBucket(col("v"), planes))
        val q = emb.filter(col("vec_id") === 0)
          .select(col("v").as("qv"), col("bucket").as("qbucket"))
        emb.filter(col("vec_id") =!= 0)
          .join(broadcast(q), col("bucket") === col("qbucket"))
          .select(col("vec_id"), col("label"), col("bucket"),
                  cosineFast(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(5)
          .select(col("vec_id"), col("label"), col("bucket"),
                  floor(col("sim") * 1000000 + 0.5).cast(LongType).as("sim_e6"))
      },
      Some(s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
              |b AS (SELECT vec_id, label, v, ${bucketSql(hyperplanes(4, 64), "v")} AS bucket FROM v),
              |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0),
              |s AS (SELECT b.vec_id, b.label, b.bucket,
              |        list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i])) /
              |        sqrt(list_sum(list_transform(b.v, x -> x * x)) *
              |             list_sum(list_transform(q.qv, x -> x * x))) AS sim
              |      FROM b, q WHERE b.bucket = q.qb AND b.vec_id <> 0)
              |SELECT vec_id, label, bucket,
              |  CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS sim_e6
              |FROM s ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin),
      "J7/north star: LSH-bucketed ANN — rerank only the query's bucket"),

    GraftQuery(
      "s03_embedding_neardup",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Embedding-cosine near-dup pairs: block on a 2-bit hyperplane
        // bucket (collision-probable for similar vectors), exact cosine
        // inside blocks, keep pairs ≥ 0.3 (embeddingNeardupPairs).
        embeddingNeardupPairs(t)
          .select(col("vec_a"), col("vec_b"),
                  floor(col("sim") * 1000000 + 0.5).cast(LongType).as("sim_e6"))
      },
      Some(neardupPairsCte +
        """SELECT vec_a, vec_b, CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS sim_e6
          |FROM p WHERE sim >= 0.3""".stripMargin),
      "North star: embedding near-dup pairs via hyperplane blocking + exact cosine"),

    GraftQuery(
      "s05_semantic_keepfirst",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // The semantic twin of d06: embedding near-dup pairs → keep-first
        // removal verdicts per vector. Same 100 TB shape — the drop list
        // is small relative to the corpus and joins broadcast.
        val dropped = embeddingNeardupPairs(t)
          .select(col("vec_b").as("vec_id")).distinct()
        t.embeddings.select(col("vec_id"))
          .join(dropped.withColumn("is_dup", lit(true)), Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("is_dup"), lit(false)).as("dropped"))
      },
      Some(neardupPairsCte +
        """, drop AS (SELECT DISTINCT vec_b AS vec_id FROM p WHERE sim >= 0.3)
          |SELECT e.vec_id, (dr.vec_id IS NOT NULL) AS dropped
          |FROM embeddings e
          |LEFT JOIN drop dr ON dr.vec_id = e.vec_id""".stripMargin),
      "North star: semantic dedup keep-first verdicts from embedding near-dup pairs"))

  /** IVF coarse quantizer: centroids = per-label mean vectors
    * (deterministic init) as (cid, cv). Tiny by construction →
    * broadcast at every use. */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label").as("cid"), posexplode(col("v")))
      .toDF("cid", "pos", "x")
      .groupBy("cid", "pos")
      .agg(avg(col("x")).as("c"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
                     s => s.getField("c")).as("cv"))

  /** Nearest-centroid assignment (vec_id, cid, sim): one narrow pass
    * over the vectors against broadcast centroids — the inverted-list
    * build step of IVF-ANN. */
  def nearestCentroid(emb: DataFrame, cent: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cid").asc)
    emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"), cosineFast(col("v"), col("cv")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Oracle of the IVF probe search — shared verbatim by s06 (join
    * layout) and s12 (partition-pruned layout): same probe, same
    * rerank, same contract. */
  private val ivfSearchOracle: String =
    """WITH dim AS (
      |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
      |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
      |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
      |probe AS (
      |  SELECT cid FROM (
      |    SELECT c.cid,
      |      list_sum(list_transform(range(1, 65), i -> cv[i] * qv[i])) /
      |      sqrt(list_sum(list_transform(cv, x -> x * x)) *
      |           list_sum(list_transform(qv, x -> x * x))) AS csim
      |    FROM cent c, q)
      |  ORDER BY csim DESC, cid LIMIT 2),
      |sims AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
      |    sqrt(list_sum(list_transform(v, x -> x * x)) *
      |         list_sum(list_transform(cv, x -> x * x))) AS sim
      |  FROM v e, cent c WHERE e.vec_id <> 0),
      |best AS (
      |  SELECT vec_id, cid,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
      |  FROM sims),
      |cand AS (
      |  SELECT b.vec_id, b.cid FROM best b JOIN probe p ON p.cid = b.cid
      |  WHERE b.rn = 1),
      |scored AS (
      |  SELECT ca.vec_id, ca.cid,
      |    list_sum(list_transform(range(1, 65), i -> e.v[i] * qv[i])) /
      |    sqrt(list_sum(list_transform(e.v, x -> x * x)) *
      |         list_sum(list_transform(qv, x -> x * x))) AS sim
      |  FROM cand ca JOIN v e ON e.vec_id = ca.vec_id, q)
      |SELECT vec_id, cid,
      |  CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS sim_e6
      |FROM scored ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin

  private val ivf: Seq[GraftQuery] = Seq(

    GraftQuery(
      "s04_ivf_assign",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val emb = doubled(t)
        nearestCentroid(emb, centroids(emb))
          .groupBy("cid")
          .agg(count(lit(1)).as("list_size"),
               floor(avg(col("sim")) * 10000 + 0.5).cast(LongType).as("avg_sim_e4"))
      },
      Some("""WITH dim AS (
             |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
             |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
             |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
             |sims AS (
             |  SELECT e.vec_id, c.cid,
             |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
             |    sqrt(list_sum(list_transform(v, x -> x * x)) *
             |         list_sum(list_transform(cv, x -> x * x))) AS sim
             |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e, cent c),
             |best AS (
             |  SELECT vec_id, cid, sim,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
             |  FROM sims)
             |SELECT cid, count(*) AS list_size,
             |  CAST(floor(avg(sim) * 10000 + 0.5) AS BIGINT) AS avg_sim_e4
             |FROM best WHERE rn = 1 GROUP BY cid""".stripMargin),
      "J7/north star: IVF coarse quantizer — centroid lists + nearest-centroid assignment"),

    GraftQuery(
      "s06_ivf_search",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // The IVF QUERY path completing s04's build step: probe only the
        // nprobe=2 centroid lists nearest the query vector, exact-rerank
        // inside them. At 100 TB the corpus is stored bucketed by cid, so
        // the probe prunes partitions and the scan touches nprobe/k of
        // the data; centroids and the probe set stay broadcast-sized.
        val emb = doubled(t)
        val cent = centroids(emb)
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        val probe = cent.crossJoin(broadcast(qv))
          .select(col("cid"), cosineFast(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(2)
          .select(col("cid"))
        val assigned = nearestCentroid(emb.filter(col("vec_id") =!= 0), cent)
          .select(col("vec_id"), col("cid"))
        assigned
          .join(broadcast(probe), Seq("cid"))
          .join(emb.select(col("vec_id"), col("v")), Seq("vec_id"))
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), col("cid"), cosineFast(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(5)
          .select(col("vec_id"), col("cid"),
                  floor(col("sim") * 1000000 + 0.5).cast(LongType).as("sim_e6"))
      },
      Some(ivfSearchOracle),
      "J7/north star: IVF probe search — nprobe=2 lists, exact rerank inside"),

    GraftQuery(
      "s07_semantic_clusters",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // The semantic twin of d07: exact connected components over the
        // embedding near-dup pair graph (s05 ships the one-pass
        // keep-first approximation). Same iterative min-label
        // propagation, same scale shape: the pair graph is (id, id)
        // longs, orders of magnitude smaller than the vector corpus.
        graft.dedup.DedupQueries.clusterLabels(
            embeddingNeardupPairs(t).select(col("vec_a"), col("vec_b")))
          .toDF("vec_id", "cluster_id")
      },
      Some(neardupPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ") +
        """, pe AS (SELECT vec_a, vec_b FROM p WHERE sim >= 0.3),
          |edges AS (
          |  SELECT vec_a AS s, vec_b AS d FROM pe
          |  UNION SELECT vec_b, vec_a FROM pe),
          |reach(vec_id, r) AS (
          |  SELECT s, s FROM edges
          |  UNION
          |  SELECT e.s, r.r FROM edges e JOIN reach r ON r.vec_id = e.d)
          |SELECT vec_id, min(r) AS cluster_id
          |FROM reach GROUP BY vec_id""".stripMargin),
      "North star: semantic clusters — connected components over embedding near-dup pairs"),

    GraftQuery(
      "s08_int8_quantize",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Vector compression for ANN at scale: symmetric int8
        // quantization (per-vector scale = max|x|/127) — the 4×
        // footprint cut that makes a 100 TB vector corpus fit its
        // serving tier. All math promotes float32 → double FIRST (an
        // exact conversion), so both engines run identical IEEE ops;
        // outputs are integers + a fixed-point scale. Zero shuffles —
        // pure higher-order array expressions inside codegen.
        val xd = expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        t.embeddings
          .withColumn("xd", xd)
          .withColumn("maxabs", expr(
            "aggregate(xd, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x)))"))
          .withColumn("q", expr(
            "transform(xd, x -> CAST(floor(x * 127.0 / greatest(maxabs, 1e-30) + 0.5) AS BIGINT))"))
          .select(col("vec_id"),
            size(col("q")).as("n_dims"),
            floor(col("maxabs") / 127.0 * 1000000 + 0.5).cast(LongType).as("scale_e6"),
            expr("aggregate(q, CAST(0 AS BIGINT), (s, x) -> s + x)").as("sum_q"),
            expr("array_min(q)").as("min_q"),
            expr("array_max(q)").as("max_q"))
      },
      Some("""WITH v AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
             |  FROM embeddings),
             |m AS (
             |  SELECT vec_id, xd,
             |    list_aggregate(list_transform(xd, x -> abs(x)), 'max') AS maxabs
             |  FROM v),
             |q AS (
             |  SELECT vec_id, maxabs,
             |    list_transform(xd,
             |      x -> CAST(floor(x * 127.0 / greatest(maxabs, 1e-30) + 0.5) AS BIGINT)) AS qv
             |  FROM m)
             |SELECT vec_id,
             |  len(qv) AS n_dims,
             |  CAST(floor(maxabs / 127.0 * 1000000 + 0.5) AS BIGINT) AS scale_e6,
             |  CAST(list_sum(qv) AS BIGINT) AS sum_q,
             |  CAST(list_aggregate(qv, 'min') AS BIGINT) AS min_q,
             |  CAST(list_aggregate(qv, 'max') AS BIGINT) AS max_q
             |FROM q""".stripMargin),
      "North star: symmetric int8 vector quantization (per-vector scale, zero shuffles)"),

    GraftQuery(
      "s09_ann_recall",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // The quality metric every ANN deployment publishes: recall@k of
        // the approximate paths (s02 LSH bucket, s06 IVF probe) against
        // the exact brute-force top-k (s01). All three rankings are
        // deterministic total orders (sim DESC, vec_id ASC), so recall
        // itself is oracle-exact. Scale shape: every candidate set is
        // reduced by TakeOrderedAndProject to ≤5 rows BEFORE any window
        // ranking — the global row_number runs on 5 rows, never the
        // corpus.
        val emb = doubled(t)
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        val cos = emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), cosineFast(col("v"), col("qv")).as("sim"))
        val w5 = org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col("vec_id").asc)
        def top5(cand: DataFrame): DataFrame =
          cand.orderBy(col("sim").desc, col("vec_id").asc).limit(5)
            .withColumn("rn", row_number().over(w5))
            .select(col("vec_id"), col("rn"))
        val exact = top5(cos).toDF("vec_id", "rn_e")
        // LSH path (s02's candidate set)
        val planes = hyperplanes(4, 64)
        val embB = emb.withColumn("bucket", lshBucket(col("v"), planes))
        val qb = embB.filter(col("vec_id") === 0)
          .select(col("v").as("qv"), col("bucket").as("qbucket"))
        val lshTop = top5(embB.filter(col("vec_id") =!= 0)
          .join(broadcast(qb), col("bucket") === col("qbucket"))
          .select(col("vec_id"), cosineFast(col("v"), col("qv")).as("sim")))
        // IVF path (s06's candidate set)
        val cent = centroids(emb)
        val probe = cent.crossJoin(broadcast(qv))
          .select(col("cid"), cosineFast(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(2)
          .select(col("cid"))
        val ivfTop = top5(
          nearestCentroid(emb.filter(col("vec_id") =!= 0), cent)
            .select(col("vec_id"), col("cid"))
            .join(broadcast(probe), Seq("cid"))
            .join(emb.select(col("vec_id"), col("v")), Seq("vec_id"))
            .crossJoin(broadcast(qv))
            .select(col("vec_id"), cosineFast(col("v"), col("qv")).as("sim")))
        val meth = lshTop.withColumn("method", lit("lsh"))
          .union(ivfTop.withColumn("method", lit("ivf")))
          .withColumnRenamed("rn", "rn_a")
          .join(exact, Seq("vec_id"))
        val ks = Seq(1, 3, 5).toDF("k")
        val mk = Seq("lsh", "ivf").toDF("method").crossJoin(broadcast(ks))
        val hits = meth.crossJoin(broadcast(ks))
          .filter(col("rn_a") <= col("k") && col("rn_e") <= col("k"))
          .groupBy("method", "k")
          .agg(count(lit(1)).as("n"))
        mk.join(hits, Seq("method", "k"), "left")
          .select(col("method"), col("k"),
            coalesce(col("n"), lit(0L)).as("n_hits"),
            floor(coalesce(col("n"), lit(0L)) * 10000.0 / col("k") + 0.5)
              .cast(LongType).as("recall_e4"))
          .orderBy(col("method"), col("k"))
      },
      Some(s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
              |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
              |cos AS (
              |  SELECT e.vec_id,
              |    list_sum(list_transform(range(1, 65), i -> e.v[i] * qv[i])) /
              |    sqrt(list_sum(list_transform(e.v, x -> x * x)) *
              |         list_sum(list_transform(qv, x -> x * x))) AS sim
              |  FROM v e, q WHERE e.vec_id <> 0),
              |exact AS (
              |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rn_e
              |  FROM cos ORDER BY sim DESC, vec_id LIMIT 5),
              |b AS (SELECT vec_id, v, ${bucketSql(hyperplanes(4, 64), "v")} AS bucket FROM v),
              |qb AS (SELECT bucket AS qbucket FROM b WHERE vec_id = 0),
              |lshr AS (
              |  SELECT c.vec_id, ROW_NUMBER() OVER (ORDER BY c.sim DESC, c.vec_id) AS rn_a
              |  FROM cos c JOIN b ON b.vec_id = c.vec_id, qb
              |  WHERE b.bucket = qb.qbucket
              |  ORDER BY c.sim DESC, c.vec_id LIMIT 5),
              |dim AS (
              |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
              |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
              |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
              |probe AS (
              |  SELECT cid FROM (
              |    SELECT c.cid,
              |      list_sum(list_transform(range(1, 65), i -> cv[i] * qv[i])) /
              |      sqrt(list_sum(list_transform(cv, x -> x * x)) *
              |           list_sum(list_transform(qv, x -> x * x))) AS csim
              |    FROM cent c, q)
              |  ORDER BY csim DESC, cid LIMIT 2),
              |csims AS (
              |  SELECT e.vec_id, c.cid,
              |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
              |    sqrt(list_sum(list_transform(v, x -> x * x)) *
              |         list_sum(list_transform(cv, x -> x * x))) AS sim
              |  FROM v e, cent c WHERE e.vec_id <> 0),
              |best AS (
              |  SELECT vec_id, cid,
              |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
              |  FROM csims),
              |cand AS (
              |  SELECT b2.vec_id FROM best b2 JOIN probe p ON p.cid = b2.cid
              |  WHERE b2.rn = 1),
              |ivfr AS (
              |  SELECT c.vec_id, ROW_NUMBER() OVER (ORDER BY c.sim DESC, c.vec_id) AS rn_a
              |  FROM cos c JOIN cand ca ON ca.vec_id = c.vec_id
              |  ORDER BY c.sim DESC, c.vec_id LIMIT 5),
              |meth AS (
              |  SELECT 'lsh' AS method, a.rn_a, e.rn_e
              |  FROM lshr a JOIN exact e USING (vec_id)
              |  UNION ALL
              |  SELECT 'ivf', a.rn_a, e.rn_e
              |  FROM ivfr a JOIN exact e USING (vec_id)),
              |ks AS (SELECT unnest([1, 3, 5]) AS k),
              |mk AS (SELECT m.method, k.k
              |       FROM (SELECT unnest(['lsh', 'ivf']) AS method) m, ks k),
              |hits AS (
              |  SELECT method, k.k AS k, count(*) AS n
              |  FROM meth, ks k WHERE rn_a <= k.k AND rn_e <= k.k
              |  GROUP BY 1, 2)
              |SELECT mk.method, mk.k,
              |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
              |  CAST(floor(coalesce(h.n, 0) * 10000.0 / mk.k + 0.5) AS BIGINT) AS recall_e4
              |FROM mk LEFT JOIN hits h ON h.method = mk.method AND h.k = mk.k
              |ORDER BY mk.method, mk.k""".stripMargin),
      "North star: ANN recall@k audit — LSH and IVF paths vs exact top-k"),

    GraftQuery(
      "s10_product_quantize",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // Product quantization — the codebook compression ANN serving
        // stacks on top of IVF (Jégou et al.'s PQ): split each 64-dim
        // vector into M=4 16-dim subvectors, quantize each against a
        // per-subspace codebook, store 4 small codes instead of 64
        // floats. Codebooks REUSE the per-label centroids (the mean of
        // a subvector is the subvector of the mean), so the broadcast
        // codebook is one tiny table. Scale shape: one narrow pass over
        // the corpus against a broadcast codebook; the 4 per-subspace
        // argmins share ONE (vec_id, m) exchange. Per-subspace errors
        // round to e6 BEFORE summing, so the emitted reconstruction
        // error is integer-exact across engines regardless of FP
        // summation order.
        val emb = doubled(t)
        val cent = centroids(emb)
        def sub(c: Column, m: Int): Column = slice(c, m * 16 + 1, 16)
        def subDist(m: Int): Column =
          aggregate(
            zip_with(sub(col("v"), m), sub(col("cv"), m),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x)
        val dists = emb.crossJoin(broadcast(cent))
          .select(col("vec_id"),
            col("cid"),
            posexplode(array((0 until 4).map(subDist): _*)))
          .toDF("vec_id", "cid", "m", "d")
          .withColumn("d_e6", floor(col("d") * 1000000 + 0.5).cast(LongType))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id", "m").orderBy(col("d").asc, col("cid").asc)
        dists
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy("vec_id")
          .agg(
            max(when(col("m") === 0, col("cid"))).as("code0"),
            max(when(col("m") === 1, col("cid"))).as("code1"),
            max(when(col("m") === 2, col("cid"))).as("code2"),
            max(when(col("m") === 3, col("cid"))).as("code3"),
            sum(col("d_e6")).as("recon_err_e6"))
      },
      Some("""WITH dim AS (
             |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
             |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
             |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |d AS (
             |  SELECT e.vec_id, c.cid, s.m,
             |    list_sum(list_transform(range(1, 17),
             |      i -> (e.v[s.m*16 + i] - c.cv[s.m*16 + i])
             |         * (e.v[s.m*16 + i] - c.cv[s.m*16 + i]))) AS d
             |  FROM v e, cent c, (SELECT unnest([0, 1, 2, 3]) AS m) s),
             |best AS (
             |  SELECT vec_id, m, cid,
             |    CAST(floor(d * 1000000 + 0.5) AS BIGINT) AS d_e6,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
             |  FROM d)
             |SELECT vec_id,
             |  max(CASE WHEN m = 0 THEN cid END) AS code0,
             |  max(CASE WHEN m = 1 THEN cid END) AS code1,
             |  max(CASE WHEN m = 2 THEN cid END) AS code2,
             |  max(CASE WHEN m = 3 THEN cid END) AS code3,
             |  CAST(sum(d_e6) AS BIGINT) AS recon_err_e6
             |FROM best WHERE rn = 1 GROUP BY vec_id""".stripMargin),
      "North star: product quantization — 4 subspace codes + integer-exact recon error"),

    GraftQuery(
      "s11_pq_search",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // The PQ QUERY path completing s10's encode step: asymmetric
        // distance computation (ADC). The query vector is NOT quantized;
        // instead a 4×k lookup table of exact query-subvector-to-
        // -centroid distances is built once (tiny, broadcast), and each
        // corpus vector's approximate distance is the sum of 4 table
        // lookups keyed by its PQ codes — at 100 TB the scan touches
        // only the integer codes, never the float vectors. LUT entries
        // round to e6 before summing, so ranking is integer-exact
        // across engines; top-5 by (adc_e6, vec_id) total order.
        val emb = doubled(t)
        val cent = centroids(emb)
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        def sub(c: Column, m: Int): Column = slice(c, m * 16 + 1, 16)
        def subDistTo(target: Column)(m: Int): Column =
          aggregate(
            zip_with(sub(col("cv"), m), sub(target, m),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x)
        // 4×k LUT: exact distance from each query subvector to each
        // subspace centroid
        val lut = cent.crossJoin(broadcast(qv))
          .select(col("cid"), posexplode(array((0 until 4).map(subDistTo(col("qv"))): _*)))
          .toDF("cid", "m", "ld")
          .select(col("cid"), col("m"),
            floor(col("ld") * 1000000 + 0.5).cast(LongType).as("ld_e6"))
        // PQ codes of the corpus (s10's encode shape, query excluded)
        def encDist(m: Int): Column =
          aggregate(
            zip_with(sub(col("v"), m), sub(col("cv"), m),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id", "m").orderBy(col("d").asc, col("cid").asc)
        val codes = emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(cent))
          .select(col("vec_id"), col("cid"),
            posexplode(array((0 until 4).map(encDist): _*)))
          .toDF("vec_id", "cid", "m", "d")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("m"), col("cid"))
        codes.join(broadcast(lut), Seq("m", "cid"))
          .groupBy("vec_id")
          .agg(sum(col("ld_e6")).as("adc_e6"))
          .orderBy(col("adc_e6").asc, col("vec_id").asc)
          .limit(5)
      },
      Some("""WITH dim AS (
             |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
             |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
             |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
             |lut AS (
             |  SELECT c.cid, s.m,
             |    CAST(floor(list_sum(list_transform(range(1, 17),
             |      i -> (c.cv[s.m*16 + i] - qv[s.m*16 + i])
             |         * (c.cv[s.m*16 + i] - qv[s.m*16 + i]))) * 1000000 + 0.5) AS BIGINT) AS ld_e6
             |  FROM cent c, q, (SELECT unnest([0, 1, 2, 3]) AS m) s),
             |d AS (
             |  SELECT e.vec_id, c.cid, s.m,
             |    list_sum(list_transform(range(1, 17),
             |      i -> (e.v[s.m*16 + i] - c.cv[s.m*16 + i])
             |         * (e.v[s.m*16 + i] - c.cv[s.m*16 + i]))) AS d
             |  FROM v e, cent c, (SELECT unnest([0, 1, 2, 3]) AS m) s
             |  WHERE e.vec_id <> 0),
             |best AS (
             |  SELECT vec_id, m, cid,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
             |  FROM d),
             |adc AS (
             |  SELECT b.vec_id, CAST(sum(l.ld_e6) AS BIGINT) AS adc_e6
             |  FROM best b JOIN lut l ON l.m = b.m AND l.cid = b.cid
             |  WHERE b.rn = 1 GROUP BY b.vec_id)
             |SELECT vec_id, adc_e6 FROM adc
             |ORDER BY adc_e6 ASC, vec_id ASC LIMIT 5""".stripMargin),
      "North star: PQ asymmetric-distance search — broadcast LUT, codes-only scan"),

    GraftQuery(
      "s12_ivf_partitioned",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // s06's SCALE claim EXECUTED: "at 100 TB the corpus is stored
        // bucketed by cid, so the probe prunes partitions". This query
        // actually builds that layout — assignments written
        // partitionBy(cid) — then re-reads with the probe set as a
        // partition filter, so the rerank scan touches only nprobe of
        // k directories (the same mechanics as src03's day pruning).
        // The probe ids are collected (nprobe ints — bounded, like the
        // st17 codebook) because partition pruning needs literal
        // predicates. Results must equal s06 exactly.
        val emb = doubled(t)
        val cent = centroids(emb)
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        val layout = graft.streaming.Streams.dataDir("graft_ivf_part_")
        nearestCentroid(emb.filter(col("vec_id") =!= 0), cent)
          .select(col("vec_id"), col("cid"))
          .join(emb.select(col("vec_id"), col("v")), Seq("vec_id"))
          .write.mode("overwrite").partitionBy("cid").parquet(layout)
        val probeIds = cent.crossJoin(broadcast(qv))
          .select(col("cid"), cosineFast(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(2)
          .collect().map(_.getInt(0))
        spark.read.parquet(layout)
          .filter(col("cid").isin(probeIds.toIndexedSeq: _*)) // partition-pruned scan
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), col("cid"), cosineFast(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(5)
          .select(col("vec_id"), col("cid"),
                  floor(col("sim") * 1000000 + 0.5).cast(LongType).as("sim_e6"))
      },
      // identical contract to s06 — same probe, same rerank, new layout
      Some(ivfSearchOracle),
      "North star: IVF over a cid-partitioned layout — probe prunes the scan to nprobe dirs"),

    GraftQuery(
      "s15_ivf_append",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // INDEX MAINTENANCE — the ANN side of d12's incremental ingest:
        // the coarse quantizer is FROZEN (centroids from the existing
        // corpus only; production retrains offline, never per ingest),
        // the existing corpus sits in the s12 cid-partitioned layout,
        // and a new vector batch is assigned against the frozen
        // centroids and APPENDED into the same directory tree — each
        // new vector lands in its cid directory, no rewrite of the
        // existing lists. The probe-pruned serve then runs over the
        // UPDATED layout and must rank old and new vectors together
        // exactly as a full rebuild would (the oracle replays: frozen
        // existing-only centroids, full-corpus search).
        val emb = doubled(t)
        val split = Tables.incrementalSplitId(emb, "vec_id")
        val cent = centroids(emb.filter(col("vec_id") < split)).localCheckpoint()
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        val layout = graft.streaming.Streams.dataDir("graft_ivf_append_")
        def writeAssigned(part: DataFrame, mode: String): Unit =
          nearestCentroid(part, cent)
            .select(col("vec_id"), col("cid"))
            .join(part.select(col("vec_id"), col("v")), Seq("vec_id"))
            .write.mode(mode).partitionBy("cid").parquet(layout)
        writeAssigned(emb.filter(col("vec_id") =!= 0 && col("vec_id") < split),
          "overwrite")
        writeAssigned(emb.filter(col("vec_id") >= split), "append")
        val probeIds = cent.crossJoin(broadcast(qv))
          .select(col("cid"), cosineFast(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(2)
          .collect().map(_.getInt(0))
        spark.read.parquet(layout)
          .filter(col("cid").isin(probeIds.toIndexedSeq: _*))
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), col("cid"), cosineFast(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(5)
          .select(col("vec_id"), col("cid"),
                  floor(col("sim") * 1000000 + 0.5).cast(LongType).as("sim_e6"))
      },
      Some("""WITH split AS (
             |  SELECT CAST(floor(max(vec_id) * 0.8) AS BIGINT) AS sv FROM embeddings),
             |dim AS (
             |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
             |  FROM embeddings, range(1, 65) t(i)
             |  WHERE vec_id < (SELECT sv FROM split) GROUP BY 1, 2),
             |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
             |probe AS (
             |  SELECT cid FROM (
             |    SELECT c.cid,
             |      list_sum(list_transform(range(1, 65), i -> cv[i] * qv[i])) /
             |      sqrt(list_sum(list_transform(cv, x -> x * x)) *
             |           list_sum(list_transform(qv, x -> x * x))) AS csim
             |    FROM cent c, q)
             |  ORDER BY csim DESC, cid LIMIT 2),
             |sims AS (
             |  SELECT e.vec_id, c.cid,
             |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
             |    sqrt(list_sum(list_transform(v, x -> x * x)) *
             |         list_sum(list_transform(cv, x -> x * x))) AS sim
             |  FROM v e, cent c WHERE e.vec_id <> 0),
             |best AS (
             |  SELECT vec_id, cid,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
             |  FROM sims),
             |cand AS (
             |  SELECT b.vec_id, b.cid FROM best b JOIN probe p ON p.cid = b.cid
             |  WHERE b.rn = 1),
             |scored AS (
             |  SELECT ca.vec_id, ca.cid,
             |    list_sum(list_transform(range(1, 65), i -> e.v[i] * qv[i])) /
             |    sqrt(list_sum(list_transform(e.v, x -> x * x)) *
             |         list_sum(list_transform(qv, x -> x * x))) AS sim
             |  FROM cand ca JOIN v e ON e.vec_id = ca.vec_id, q)
             |SELECT vec_id, cid,
             |  CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS sim_e6
             |FROM scored ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin),
      "North star: incremental ANN ingest — frozen quantizer, append to the cid layout, serve sees the batch"),

    GraftQuery(
      "s19_ivf_rebalance",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // INDEX MAINTENANCE, part 2 — the offline retrain that s15's
        // frozen-quantizer story defers: after enough appends the lists
        // drift, so rebalance with ONE spherical k-means (Lloyd)
        // iteration over the full corpus and reassign. The spherical
        // update averages UNIT vectors — the mean direction of
        // normalized members is the argmax of the within-list cosine
        // sum (a raw mean is only equivalent when all norms are equal),
        // so the objective provably never decreases (spec-pinned).
        // Report per-list membership before/after plus the exact
        // integer sim mass (sum of e6-floored cosines). Scale shape:
        // centroids broadcast at every use; the update is one
        // posexplode + (cid, pos) groupBy — the same linear pass as the
        // s04 build, never a vector×vector join.
        //
        // Determinism: this query SUMS floored sims over every row, so
        // a last-bit centroid difference between engines would flip
        // some floor eventually. Centroid means are therefore computed
        // integer-exactly: member coords quantized to e9 ints (the
        // coords themselves are bitwise-identical in both engines),
        // summed as BIGINT (order-independent), then divided in a fixed
        // chain — making centroids, hence every downstream cosine,
        // bitwise-identical across engines.
        val emb = doubled(t)
        val split = Tables.incrementalSplitId(emb, "vec_id")
        def centQuant(memb: DataFrame): DataFrame = // (cid, w: array<double>)
          memb.select(col("cid"), posexplode(col("w")))
            .toDF("cid", "pos", "x")
            .groupBy("cid", "pos")
            .agg((sum(floor(col("x") * 1e9 + 0.5)).cast("double")
                    / count(lit(1)) / 1e9).as("c"))
            .groupBy("cid")
            .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
                           s => s.getField("c")).as("cv"))
        val cent0 = centQuant(
          emb.filter(col("vec_id") < split)
            .select(col("label").as("cid"), col("v").as("w"))).localCheckpoint()
        val assign0 = nearestCentroid(emb, cent0)
        val unit = emb.select(col("vec_id"),
          transform(col("v"), x =>
            x / sqrt(aggregate(col("v"), lit(0.0), (a, y) => a + y * y))).as("vn"))
        val cent1 = centQuant(
          assign0.select(col("cid"), col("vec_id"))
            .join(unit, Seq("vec_id"))
            .select(col("cid"), col("vn").as("w")))
        val assign1 = nearestCentroid(emb, cent1)
        val before = assign0.groupBy("cid")
          .agg(count(lit(1)).as("n_before"),
               sum(floor(col("sim") * 1000000 + 0.5).cast(LongType)).as("sum_sim_before_e6"))
        val after = assign1.groupBy("cid")
          .agg(count(lit(1)).as("n_after"),
               sum(floor(col("sim") * 1000000 + 0.5).cast(LongType)).as("sum_sim_after_e6"))
        before.join(after, Seq("cid"), "full")
          .select(col("cid"),
                  coalesce(col("n_before"), lit(0L)).as("n_before"),
                  coalesce(col("n_after"), lit(0L)).as("n_after"),
                  coalesce(col("sum_sim_before_e6"), lit(0L)).as("sum_sim_before_e6"),
                  coalesce(col("sum_sim_after_e6"), lit(0L)).as("sum_sim_after_e6"))
      },
      Some("""WITH split AS (
             |  SELECT CAST(floor(max(vec_id) * 0.8) AS BIGINT) AS sv FROM embeddings),
             |dim0 AS (
             |  SELECT label AS cid, i AS pos,
             |    CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
             |      / count(*) / 1000000000 AS c
             |  FROM embeddings, range(1, 65) t(i)
             |  WHERE vec_id < (SELECT sv FROM split) GROUP BY 1, 2),
             |cent0 AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim0 GROUP BY cid),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |sims0 AS (
             |  SELECT e.vec_id, c.cid,
             |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
             |    sqrt(list_sum(list_transform(v, x -> x * x)) *
             |         list_sum(list_transform(cv, x -> x * x))) AS sim
             |  FROM v e, cent0 c),
             |a0 AS (
             |  SELECT vec_id, cid, sim FROM (
             |    SELECT vec_id, cid, sim,
             |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
             |    FROM sims0) WHERE rn = 1),
             |vu AS (
             |  SELECT vec_id,
             |    list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS vn
             |  FROM v),
             |dim1 AS (
             |  SELECT a0.cid, i AS pos,
             |    CAST(sum(CAST(floor(e.vn[i] * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
             |      / count(*) / 1000000000 AS c
             |  FROM a0 JOIN vu e USING (vec_id), range(1, 65) t(i) GROUP BY 1, 2),
             |cent1 AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim1 GROUP BY cid),
             |sims1 AS (
             |  SELECT e.vec_id, c.cid,
             |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
             |    sqrt(list_sum(list_transform(v, x -> x * x)) *
             |         list_sum(list_transform(cv, x -> x * x))) AS sim
             |  FROM v e, cent1 c),
             |a1 AS (
             |  SELECT vec_id, cid, sim FROM (
             |    SELECT vec_id, cid, sim,
             |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
             |    FROM sims1) WHERE rn = 1),
             |nb AS (SELECT cid, count(*) AS n_before,
             |         CAST(sum(CAST(floor(sim * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_sim_before_e6
             |       FROM a0 GROUP BY cid),
             |na AS (SELECT cid, count(*) AS n_after,
             |         CAST(sum(CAST(floor(sim * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_sim_after_e6
             |       FROM a1 GROUP BY cid)
             |SELECT coalesce(nb.cid, na.cid) AS cid,
             |  coalesce(n_before, 0) AS n_before,
             |  coalesce(n_after, 0) AS n_after,
             |  coalesce(sum_sim_before_e6, 0) AS sum_sim_before_e6,
             |  coalesce(sum_sim_after_e6, 0) AS sum_sim_after_e6
             |FROM nb FULL JOIN na ON nb.cid = na.cid""".stripMargin),
      "North star: offline IVF rebalance — one spherical-Lloyd iteration, reassign, per-list drift report"),

    GraftQuery(
      "s16_ivfpq_residual",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // The CANONICAL IVF-PQ (Jégou et al. §III): PQ encodes the
        // RESIDUAL v − centroid(cell), not the raw vector — residuals
        // concentrate near the origin, so the same code budget spends
        // its precision on the part of v the coarse quantizer didn't
        // explain. s13's composition, upgraded: codes are residual
        // codes, and the query builds a PER-CELL LUT from its own
        // residual qv − centroid(cell) (still nprobe × 4 × k rows —
        // broadcast-sized). The layout scan stays partition-pruned and
        // codes-only. The residual codebook is bucket means
        // (vec_id % 8) — deterministic, so the oracle replays training,
        // encoding, LUT, and ADC end to end.
        val emb = doubled(t)
        val cent = centroids(emb)
        val corpus = emb.filter(col("vec_id") =!= 0)
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        val assign = nearestCentroid(corpus, cent).select(col("vec_id"), col("cid"))
        val residuals = corpus.join(assign, "vec_id")
          .join(broadcast(cent), "cid")
          .select(col("vec_id"), col("cid"),
            zip_with(col("v"), col("cv"), (x, y) => x - y).as("r"))
        val rcent = residuals
          .select((col("vec_id") % 8).as("rcid"), posexplode(col("r")))
          .toDF("rcid", "pos", "x")
          .groupBy("rcid", "pos").agg(avg(col("x")).as("c"))
          .groupBy("rcid")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
                         s => s.getField("c")).as("cv"))
          .select(col("rcid").as("cid"), col("cv"))
          .localCheckpoint() // tiny codebook, consumed by encode AND LUT
        val layout = graft.streaming.Streams.dataDir("graft_ivfpq_res_")
        pqCodes(residuals.select(col("vec_id"), col("r").as("v")), rcent)
          .join(assign, Seq("vec_id"))
          .write.mode("overwrite").partitionBy("cid").parquet(layout)
        val probed = cent.crossJoin(broadcast(qv))
          .select(col("cid"), col("cv"), col("qv"),
            cosineFast(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(2)
          .localCheckpoint() // nprobe rows
        val probeIds = probed.select("cid").collect().map(_.getInt(0))
        // per-cell query residual → per-cell LUT (nprobe × 4 × 8 rows)
        val qres = probed.select(col("cid").as("pcell"),
          zip_with(col("qv"), col("cv"), (x, y) => x - y).as("qr"))
        def subDistTo(m: Int): Column =
          aggregate(
            zip_with(slice(col("cv"), m * 16 + 1, 16), slice(col("qr"), m * 16 + 1, 16),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x)
        val lut = rcent.crossJoin(broadcast(qres))
          .select(col("pcell").as("cid"), col("cid").as("code"),
            posexplode(array((0 until 4).map(subDistTo): _*)))
          .toDF("cid", "code", "m", "ld")
          .select(col("cid"), col("code"), col("m"),
            floor(col("ld") * 1000000 + 0.5).cast(LongType).as("ld_e6"))
        spark.read.parquet(layout)
          .filter(col("cid").isin(probeIds.toIndexedSeq: _*)) // pruned, codes-only
          .join(broadcast(lut), Seq("cid", "m", "code"))
          .groupBy(col("vec_id"), col("cid"))
          .agg(sum(col("ld_e6")).as("adc_e6"))
          .orderBy(col("adc_e6").asc, col("vec_id").asc)
          .limit(5)
          .select(col("vec_id"), col("cid"), col("adc_e6"))
      },
      Some("""WITH dim AS (
             |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
             |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
             |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
             |asims AS (
             |  SELECT e.vec_id, c.cid,
             |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
             |    sqrt(list_sum(list_transform(v, x -> x * x)) *
             |         list_sum(list_transform(cv, x -> x * x))) AS sim
             |  FROM v e, cent c WHERE e.vec_id <> 0),
             |assign AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT vec_id, cid,
             |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
             |    FROM asims) WHERE rn = 1),
             |rv AS (
             |  SELECT e.vec_id, a.cid,
             |    list_transform(range(1, 65), i -> e.v[i] - c.cv[i]) AS r
             |  FROM v e JOIN assign a ON a.vec_id = e.vec_id
             |           JOIN cent c ON c.cid = a.cid),
             |rdim AS (
             |  SELECT vec_id % 8 AS rcid, i AS pos, avg(r[i]) AS c
             |  FROM rv, range(1, 65) t(i) GROUP BY 1, 2),
             |rcent AS (SELECT rcid, list(c ORDER BY pos) AS rcv FROM rdim GROUP BY rcid),
             |probe AS (
             |  SELECT cid, cv FROM (
             |    SELECT c.cid, c.cv,
             |      list_sum(list_transform(range(1, 65), i -> cv[i] * qv[i])) /
             |      sqrt(list_sum(list_transform(cv, x -> x * x)) *
             |           list_sum(list_transform(qv, x -> x * x))) AS csim
             |    FROM cent c, q)
             |  ORDER BY csim DESC, cid LIMIT 2),
             |d AS (
             |  SELECT e.vec_id, rc.rcid, s.m,
             |    list_sum(list_transform(range(1, 17),
             |      i -> (e.r[s.m*16 + i] - rc.rcv[s.m*16 + i])
             |         * (e.r[s.m*16 + i] - rc.rcv[s.m*16 + i]))) AS d
             |  FROM rv e, rcent rc, (SELECT unnest([0, 1, 2, 3]) AS m) s),
             |codes AS (
             |  SELECT vec_id, m, rcid AS code FROM (
             |    SELECT vec_id, m, rcid,
             |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, rcid) AS rn
             |    FROM d) WHERE rn = 1),
             |cand AS (SELECT a.vec_id, a.cid FROM assign a JOIN probe p ON p.cid = a.cid),
             |qres AS (
             |  SELECT p.cid AS pcell,
             |    list_transform(range(1, 65), i -> qv[i] - p.cv[i]) AS qr
             |  FROM probe p, q),
             |lut AS (
             |  SELECT qr.pcell AS cid, rc.rcid AS code, s.m,
             |    CAST(floor(list_sum(list_transform(range(1, 17),
             |      i -> (rc.rcv[s.m*16 + i] - qr.qr[s.m*16 + i])
             |         * (rc.rcv[s.m*16 + i] - qr.qr[s.m*16 + i]))) * 1000000 + 0.5) AS BIGINT) AS ld_e6
             |  FROM rcent rc, qres qr, (SELECT unnest([0, 1, 2, 3]) AS m) s),
             |adc AS (
             |  SELECT ca.vec_id, ca.cid, CAST(sum(l.ld_e6) AS BIGINT) AS adc_e6
             |  FROM cand ca
             |  JOIN codes co ON co.vec_id = ca.vec_id
             |  JOIN lut l ON l.cid = ca.cid AND l.m = co.m AND l.code = co.code
             |  GROUP BY ca.vec_id, ca.cid)
             |SELECT vec_id, cid, adc_e6
             |FROM adc ORDER BY adc_e6 ASC, vec_id ASC LIMIT 5""".stripMargin),
      "North star: canonical residual IVF-PQ — per-cell residual LUT, pruned codes-only scan"),

    GraftQuery(
      "s20_pq_codebook_refresh",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // INDEX MAINTENANCE, part 3 — the refresh s19 leaves undone:
        // s19 retrains the COARSE quantizer, but the PQ codebooks (s10)
        // stay frozen from the day the index was built, so their
        // reconstruction error only drifts upward as the corpus
        // evolves. One k-means (Lloyd) refinement PER SUBSPACE
        // codebook: each codeword moves to the mean of the subvectors
        // currently assigned to it (integer-exact e9 means — s19's
        // cross-engine determinism discipline), unassigned codewords
        // hold position, then the corpus re-encodes. Per-cell
        // membership and e6-floored error mass are reported
        // before/after; one Lloyd step provably never increases the
        // total error (assignment and update are both non-increasing —
        // spec-pinned alongside the artifact-seam serve equivalence).
        // Scale shape: the codebooks are tiny and broadcast at every
        // use; assignment is one narrow pass; the update is one
        // (m, cid, pos) groupBy — the s04 build's linear shape, never
        // a vector×vector join.
        val emb = doubled(t)
        val svs = subspaced(emb)
        val cb0 = pqSubCodebook(centroids(emb)).localCheckpoint()
        val codes0 = pqCodesSub(svs, cb0).localCheckpoint()
        val cb1 = pqRefineCodebook(svs, codes0, cb0).localCheckpoint()
        val codes1 = pqCodesSub(svs, cb1)
        val before = codes0.groupBy("m", "code")
          .agg(count(lit(1)).as("n_before"),
            sum(col("d_e6")).as("err_before_e6"))
        val after = codes1.groupBy("m", "code")
          .agg(count(lit(1)).as("n_after"),
            sum(col("d_e6")).as("err_after_e6"))
        before.join(after, Seq("m", "code"), "full")
          .select(col("m").cast(LongType).as("m"), col("code"),
            coalesce(col("n_before"), lit(0L)).as("n_before"),
            coalesce(col("n_after"), lit(0L)).as("n_after"),
            coalesce(col("err_before_e6"), lit(0L)).as("err_before_e6"),
            coalesce(col("err_after_e6"), lit(0L)).as("err_after_e6"))
          .orderBy("m", "code")
      },
      Some("""WITH dim AS (
             |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
             |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
             |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |sv AS (
             |  SELECT vec_id, s.m,
             |    list_transform(range(1, 17), i -> v[s.m*16 + i]) AS sv
             |  FROM v, (SELECT unnest([0, 1, 2, 3]) AS m) s),
             |cb0 AS (
             |  SELECT s.m, cid,
             |    list_transform(range(1, 17), i -> cv[s.m*16 + i]) AS w
             |  FROM cent, (SELECT unnest([0, 1, 2, 3]) AS m) s),
             |d0 AS (
             |  SELECT e.vec_id, e.m, c.cid,
             |    list_sum(list_transform(range(1, 17),
             |      i -> (e.sv[i] - c.w[i]) * (e.sv[i] - c.w[i]))) AS d
             |  FROM sv e JOIN cb0 c ON c.m = e.m),
             |a0 AS (
             |  SELECT vec_id, m, cid, CAST(floor(d * 1000000 + 0.5) AS BIGINT) AS d_e6
             |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
             |        FROM d0) WHERE rn = 1),
             |mean1 AS (
             |  SELECT a0.m, a0.cid, i AS pos,
             |    CAST(sum(CAST(floor(e.sv[i] * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
             |      / count(*) / 1000000000 AS c
             |  FROM a0 JOIN sv e ON e.vec_id = a0.vec_id AND e.m = a0.m,
             |       range(1, 17) t(i)
             |  GROUP BY 1, 2, 3),
             |cb1n AS (SELECT m, cid, list(c ORDER BY pos) AS w FROM mean1 GROUP BY m, cid),
             |cb1 AS (
             |  SELECT c0.m, c0.cid, coalesce(c1.w, c0.w) AS w
             |  FROM cb0 c0 LEFT JOIN cb1n c1 ON c1.m = c0.m AND c1.cid = c0.cid),
             |d1 AS (
             |  SELECT e.vec_id, e.m, c.cid,
             |    list_sum(list_transform(range(1, 17),
             |      i -> (e.sv[i] - c.w[i]) * (e.sv[i] - c.w[i]))) AS d
             |  FROM sv e JOIN cb1 c ON c.m = e.m),
             |a1 AS (
             |  SELECT vec_id, m, cid, CAST(floor(d * 1000000 + 0.5) AS BIGINT) AS d_e6
             |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
             |        FROM d1) WHERE rn = 1),
             |nb AS (
             |  SELECT m, cid, count(*) AS n_before,
             |    CAST(sum(d_e6) AS BIGINT) AS err_before_e6
             |  FROM a0 GROUP BY 1, 2),
             |na AS (
             |  SELECT m, cid, count(*) AS n_after,
             |    CAST(sum(d_e6) AS BIGINT) AS err_after_e6
             |  FROM a1 GROUP BY 1, 2)
             |SELECT CAST(coalesce(nb.m, na.m) AS BIGINT) AS m,
             |  coalesce(nb.cid, na.cid) AS code,
             |  coalesce(n_before, 0) AS n_before,
             |  coalesce(n_after, 0) AS n_after,
             |  coalesce(err_before_e6, 0) AS err_before_e6,
             |  coalesce(err_after_e6, 0) AS err_after_e6
             |FROM nb FULL JOIN na ON na.m = nb.m AND na.cid = nb.cid
             |ORDER BY m, code""".stripMargin),
      "North star: PQ codebook refresh — one per-subspace Lloyd step, integer-exact means, error mass non-increasing"),

    GraftQuery(
      "s21_ivf_delete",
      (spark, dir) => s21Serves(spark, dir)._2,
      Some("""WITH dim AS (
             |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
             |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
             |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
             |probe AS (
             |  SELECT cid FROM (
             |    SELECT c.cid,
             |      list_sum(list_transform(range(1, 65), i -> cv[i] * qv[i])) /
             |      sqrt(list_sum(list_transform(cv, x -> x * x)) *
             |           list_sum(list_transform(qv, x -> x * x))) AS csim
             |    FROM cent c, q)
             |  ORDER BY csim DESC, cid LIMIT 2),
             |sims AS (
             |  SELECT e.vec_id, c.cid,
             |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
             |    sqrt(list_sum(list_transform(v, x -> x * x)) *
             |         list_sum(list_transform(cv, x -> x * x))) AS sim
             |  FROM v e, cent c WHERE e.vec_id <> 0 AND e.vec_id % 10 <> 3),
             |best AS (
             |  SELECT vec_id, cid,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
             |  FROM sims),
             |cand AS (
             |  SELECT b.vec_id, b.cid FROM best b JOIN probe p ON p.cid = b.cid
             |  WHERE b.rn = 1),
             |scored AS (
             |  SELECT ca.vec_id, ca.cid,
             |    list_sum(list_transform(range(1, 65), i -> e.v[i] * qv[i])) /
             |    sqrt(list_sum(list_transform(e.v, x -> x * x)) *
             |         list_sum(list_transform(qv, x -> x * x))) AS sim
             |  FROM cand ca JOIN v e ON e.vec_id = ca.vec_id, q)
             |SELECT vec_id, cid,
             |  CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS sim_e6
             |FROM scored ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin),
      "North star: ANN deletion — O(deletes) tombstones at ingest, compaction folds them in, serve ≡ rebuild-without-deleted"))

  /** s21: DELETION closes the ANN maintenance lifecycle (s15 append /
    * s19 coarse retrain / s20 codebook refresh had no retract edge —
    * takedowns, TTL expiry, and upstream dedup all need one). A delete
    * batch writes TOMBSTONES — O(deletes) ids, the ingest path never
    * rewrites posting lists — the serve anti-joins its probe-pruned
    * scan against the broadcast tombstone set, and a background
    * COMPACTION (src09's rewrite) folds tombstones into the cid
    * layout, after which serve needs no filter at all. The coarse
    * quantizer stays FROZEN under deletes (the s15 discipline;
    * retraining is s19's separate offline job), so the oracle replays
    * full-corpus centroids over a deleted-excluded search. Returns
    * (tombstone-filtered serve over the LIVE layout, unfiltered serve
    * over the COMPACTED layout) — pinned identical in
    * OperatorInvariantsSpec; the registry entry exposes the compacted
    * form. */
  private[graft] def s21Serves(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val t = Tables(spark, dir)
    val emb = doubled(t)
    val cent = centroids(emb).localCheckpoint()
    val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val layout = graft.streaming.Streams.dataDir("graft_ivf_del_")
    nearestCentroid(emb.filter(col("vec_id") =!= 0), cent)
      .select(col("vec_id"), col("cid"))
      .join(emb.select(col("vec_id"), col("v")), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cid").parquet(layout)
    val tombDir = graft.streaming.Streams.dataDir("graft_ivf_tomb_")
    emb.filter(col("vec_id") % 10 === 3).select(col("vec_id"))
      .write.mode("overwrite").parquet(tombDir)
    val probeIds = cent.crossJoin(broadcast(qv))
      .select(col("cid"), cosineFast(col("cv"), col("qv")).as("csim"))
      .orderBy(col("csim").desc, col("cid").asc)
      .limit(2).collect().map(_.getInt(0))
    def serve(src: DataFrame): DataFrame =
      src.crossJoin(broadcast(qv))
        .select(col("vec_id"), col("cid"), cosineFast(col("v"), col("qv")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(5)
        .select(col("vec_id"), col("cid"),
                floor(col("sim") * 1000000 + 0.5).cast(LongType).as("sim_e6"))
    val tomb = spark.read.parquet(tombDir)
    val tombServe = serve(spark.read.parquet(layout)
      .filter(col("cid").isin(probeIds.toIndexedSeq: _*)) // partition-pruned
      .join(broadcast(tomb), Seq("vec_id"), "left_anti"))
    // the maintenance job: rewrite the layout minus tombstones (all k
    // dirs — a real job may compact only dirs past a tombstone-density
    // threshold, the src09 small-file criterion applied to deletes)
    val compacted = graft.streaming.Streams.dataDir("graft_ivf_delc_")
    spark.read.parquet(layout)
      .join(broadcast(tomb), Seq("vec_id"), "left_anti")
      .write.mode("overwrite").partitionBy("cid").parquet(compacted)
    val compServe = serve(spark.read.parquet(compacted)
      .filter(col("cid").isin(probeIds.toIndexedSeq: _*)))
    (tombServe, compServe)
  }

  /** PQ sub-vector m (16 dims) of a 64-dim column. */
  private def subVec(c: Column, m: Int): Column = slice(c, m * 16 + 1, 16)

  /** PQ codes, long format (vec_id, m, code): per (vector, subspace)
    * argmin-distance centroid id. One (vec_id, m) exchange shared by the
    * 4 subspace argmins; the codebook is broadcast. Same math as s10/s11,
    * factored for reuse by the composed IVF+PQ path (s13/s14/st19). */
  def pqCodes(emb: DataFrame, cent: DataFrame): DataFrame = {
    def encDist(m: Int): Column =
      aggregate(
        zip_with(subVec(col("v"), m), subVec(col("cv"), m),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id", "m").orderBy(col("d").asc, col("cid").asc)
    emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        posexplode(array((0 until 4).map(encDist): _*)))
      .toDF("vec_id", "cid", "m", "d")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("cid").as("code"))
  }

  /** ADC lookup table (code, m, ld_e6): exact squared distance from each
    * query subvector to each subspace centroid, rounded to e6 BEFORE any
    * summing so downstream ranking is integer-exact across engines.
    * 4×k rows — always broadcast. */
  def pqLut(cent: DataFrame, qv: DataFrame): DataFrame = {
    def subDistTo(m: Int): Column =
      aggregate(
        zip_with(subVec(col("cv"), m), subVec(col("qv"), m),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    cent.crossJoin(broadcast(qv))
      .select(col("cid"), posexplode(array((0 until 4).map(subDistTo): _*)))
      .toDF("cid", "m", "ld")
      .select(col("cid").as("code"), col("m"),
        floor(col("ld") * 1000000 + 0.5).cast(LongType).as("ld_e6"))
  }

  /** s20: per-subspace explode of the vectors — (vec_id, m, sv[16]),
    * one narrow generate pass. */
  private[graft] def subspaced(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      posexplode(array((0 until 4).map(m => subVec(col("v"), m)): _*)))
      .toDF("vec_id", "m", "sv")

  /** s20: the s10 codebook in explicit per-subspace form (m, cid,
    * w[16]) — each codeword starts as the matching 16-dim slice of a
    * coarse centroid (the mean of a subvector is the subvector of the
    * mean), and the refresh then moves codewords independently per
    * subspace, which the shared-slice form cannot express. */
  private[graft] def pqSubCodebook(cent: DataFrame): DataFrame =
    cent.select(col("cid"),
      posexplode(array((0 until 4).map(m => subVec(col("cv"), m)): _*)))
      .toDF("cid", "m", "w")
      .select(col("m"), col("cid"), col("w"))

  /** s20: PQ encode against an arbitrary per-subspace codebook — s10's
    * argmin math generalized off the shared-slice codebook. Emits the
    * e6-floored subspace error next to each code so the refresh can
    * account error mass without a second distance pass. */
  private[graft] def pqCodesSub(svs: DataFrame, cb: DataFrame): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id", "m").orderBy(col("d").asc, col("cid").asc)
    svs.join(broadcast(cb), Seq("m"))
      .select(col("vec_id"), col("m"), col("cid"),
        aggregate(zip_with(col("sv"), col("w"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("d"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("cid").as("code"),
        floor(col("d") * 1000000 + 0.5).cast(LongType).as("d_e6"))
  }

  /** s20: ONE Lloyd refinement of the per-subspace codebooks — each
    * codeword moves to the integer-exact mean (member coords quantized
    * to e9 BIGINTs, summed order-independently, divided in a fixed
    * chain — s19's cross-engine determinism discipline) of its
    * currently-assigned subvectors; codewords with no members hold
    * their old position (the k-means empty-cell convention, which
    * keeps the update non-increasing). */
  private[graft] def pqRefineCodebook(svs: DataFrame, codes: DataFrame,
                                      cb: DataFrame): DataFrame = {
    val means = codes.join(svs, Seq("vec_id", "m"))
      .select(col("m"), col("code").as("cid"), posexplode(col("sv")))
      .toDF("m", "cid", "pos", "x")
      .groupBy("m", "cid", "pos")
      .agg((sum(floor(col("x") * 1e9 + 0.5)).cast("double")
        / count(lit(1)) / 1e9).as("c"))
      .groupBy("m", "cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("w1"))
    cb.join(means, Seq("m", "cid"), "left")
      .select(col("m"), col("cid"), coalesce(col("w1"), col("w")).as("w"))
  }

  /** Shared oracle CTE prefix for the composed IVF+PQ path: centroids,
    * probe set, per-vector assignment, candidate set (assignment ∩ probe),
    * ADC LUT, and per-candidate integer ADC. */
  private val ivfpqCte: String =
    """WITH dim AS (
      |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
      |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
      |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
      |probe AS (
      |  SELECT cid FROM (
      |    SELECT c.cid,
      |      list_sum(list_transform(range(1, 65), i -> cv[i] * qv[i])) /
      |      sqrt(list_sum(list_transform(cv, x -> x * x)) *
      |           list_sum(list_transform(qv, x -> x * x))) AS csim
      |    FROM cent c, q)
      |  ORDER BY csim DESC, cid LIMIT 2),
      |asims AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
      |    sqrt(list_sum(list_transform(v, x -> x * x)) *
      |         list_sum(list_transform(cv, x -> x * x))) AS sim
      |  FROM v e, cent c WHERE e.vec_id <> 0),
      |assign AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
      |    FROM asims) WHERE rn = 1),
      |cand AS (SELECT a.vec_id, a.cid FROM assign a JOIN probe p ON p.cid = a.cid),
      |lut AS (
      |  SELECT c.cid AS code, s.m,
      |    CAST(floor(list_sum(list_transform(range(1, 17),
      |      i -> (c.cv[s.m*16 + i] - qv[s.m*16 + i])
      |         * (c.cv[s.m*16 + i] - qv[s.m*16 + i]))) * 1000000 + 0.5) AS BIGINT) AS ld_e6
      |  FROM cent c, q, (SELECT unnest([0, 1, 2, 3]) AS m) s),
      |d AS (
      |  SELECT e.vec_id, c.cid, s.m,
      |    list_sum(list_transform(range(1, 17),
      |      i -> (e.v[s.m*16 + i] - c.cv[s.m*16 + i])
      |         * (e.v[s.m*16 + i] - c.cv[s.m*16 + i]))) AS d
      |  FROM v e, cent c, (SELECT unnest([0, 1, 2, 3]) AS m) s
      |  WHERE e.vec_id IN (SELECT vec_id FROM cand)),
      |best AS (
      |  SELECT vec_id, m, cid,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
      |  FROM d),
      |adc AS (
      |  SELECT b.vec_id, CAST(sum(l.ld_e6) AS BIGINT) AS adc_e6
      |  FROM best b JOIN lut l ON l.m = b.m AND l.code = b.cid
      |  WHERE b.rn = 1 GROUP BY b.vec_id)
      |""".stripMargin

  private val ivfpq: Seq[GraftQuery] = Seq(

    GraftQuery(
      "s13_ivfpq_search",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // The composed 100 TB ANN serving shape — IVF partition pruning
        // (s12) UNDER PQ asymmetric-distance rerank (s11): the corpus is
        // stored as integer PQ codes partitioned by IVF cell, the probe
        // selects nprobe=2 cells as literal partition filters, and the
        // rerank is 4 broadcast-LUT lookups per candidate. The scan
        // touches nprobe/k of the DIRECTORIES and zero float vectors —
        // both axes of the real IVF-PQ index (Jégou et al.) at once.
        // Driver-side materializations stay bounded: nprobe ints.
        val emb = doubled(t)
        val cent = centroids(emb)
        val corpus = emb.filter(col("vec_id") =!= 0)
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        val layout = graft.streaming.Streams.dataDir("graft_ivfpq_part_")
        pqCodes(corpus, cent)
          .join(nearestCentroid(corpus, cent).select(col("vec_id"), col("cid")),
                Seq("vec_id"))
          .write.mode("overwrite").partitionBy("cid").parquet(layout)
        val probeIds = cent.crossJoin(broadcast(qv))
          .select(col("cid"), cosineFast(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(2)
          .collect().map(_.getInt(0))
        spark.read.parquet(layout)
          .filter(col("cid").isin(probeIds.toIndexedSeq: _*)) // partition-pruned, codes-only scan
          .join(broadcast(pqLut(cent, qv)), Seq("m", "code"))
          .groupBy(col("vec_id"), col("cid"))
          .agg(sum(col("ld_e6")).as("adc_e6"))
          .orderBy(col("adc_e6").asc, col("vec_id").asc)
          .limit(5)
          .select(col("vec_id"), col("cid"), col("adc_e6"))
      },
      Some(ivfpqCte +
        """SELECT a.vec_id, ca.cid, a.adc_e6
          |FROM adc a JOIN cand ca ON ca.vec_id = a.vec_id
          |ORDER BY a.adc_e6 ASC, a.vec_id ASC LIMIT 5""".stripMargin),
      "North star: IVF-PQ serving — partition-pruned codes-only scan + broadcast-LUT ADC rerank"),

    GraftQuery(
      "s14_ivfpq_recall",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // Recall audit of the composed IVF-PQ path (s13's ranking —
        // probe-restricted candidates ordered by integer ADC) against
        // the exact brute-force top-k, s09-style. Quantifies BOTH error
        // sources at once: IVF probe misses and PQ ranking distortion.
        // Scale shape: candidate sets shrink to ≤5 rows via
        // TakeOrderedAndProject before any global window.
        val emb = doubled(t)
        val cent = centroids(emb)
        val corpus = emb.filter(col("vec_id") =!= 0)
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        val w5 = org.apache.spark.sql.expressions.Window
          .orderBy(col("ord").asc, col("vec_id").asc)
        val exact = corpus.crossJoin(broadcast(qv))
          .select(col("vec_id"), (-cosineFast(col("v"), col("qv"))).as("ord"))
          .orderBy(col("ord").asc, col("vec_id").asc).limit(5)
          .withColumn("rn_e", row_number().over(w5))
          .select(col("vec_id"), col("rn_e"))
        val probe = cent.crossJoin(broadcast(qv))
          .select(col("cid"), cosineFast(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(2)
          .select(col("cid"))
        val cand = nearestCentroid(corpus, cent)
          .select(col("vec_id"), col("cid"))
          .join(broadcast(probe), Seq("cid"))
        val ivfpqTop = pqCodes(corpus, cent)
          .join(cand.select(col("vec_id")), Seq("vec_id"))
          .join(broadcast(pqLut(cent, qv)), Seq("m", "code"))
          .groupBy(col("vec_id"))
          .agg(sum(col("ld_e6")).as("ord"))
          .orderBy(col("ord").asc, col("vec_id").asc).limit(5)
          .withColumn("rn_a", row_number().over(w5))
          .select(col("vec_id"), col("rn_a"))
        val ks = Seq(1, 3, 5).toDF("k")
        val hits = ivfpqTop.join(exact, Seq("vec_id"))
          .crossJoin(broadcast(ks))
          .filter(col("rn_a") <= col("k") && col("rn_e") <= col("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("n"))
        ks.join(hits, Seq("k"), "left")
          .select(col("k"),
            coalesce(col("n"), lit(0L)).as("n_hits"),
            floor(coalesce(col("n"), lit(0L)) * 10000.0 / col("k") + 0.5)
              .cast(LongType).as("recall_e4"))
          .orderBy(col("k"))
      },
      Some(ivfpqCte +
        """, cos AS (
          |  SELECT e.vec_id,
          |    list_sum(list_transform(range(1, 65), i -> e.v[i] * qv[i])) /
          |    sqrt(list_sum(list_transform(e.v, x -> x * x)) *
          |         list_sum(list_transform(qv, x -> x * x))) AS sim
          |  FROM v e, q WHERE e.vec_id <> 0),
          |exact AS (
          |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rn_e
          |  FROM cos ORDER BY sim DESC, vec_id LIMIT 5),
          |appr AS (
          |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY adc_e6 ASC, vec_id) AS rn_a
          |  FROM adc ORDER BY adc_e6 ASC, vec_id LIMIT 5),
          |ks AS (SELECT unnest([1, 3, 5]) AS k),
          |hits AS (
          |  SELECT k.k AS k, count(*) AS n
          |  FROM appr a JOIN exact e USING (vec_id), ks k
          |  WHERE a.rn_a <= k.k AND e.rn_e <= k.k
          |  GROUP BY 1)
          |SELECT ks.k,
          |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
          |  CAST(floor(coalesce(h.n, 0) * 10000.0 / ks.k + 0.5) AS BIGINT) AS recall_e4
          |FROM ks LEFT JOIN hits h ON h.k = ks.k
          |ORDER BY ks.k""".stripMargin),
      "North star: IVF-PQ recall@k audit vs exact top-k — quantifies probe + quantization loss"))

  private val filtered: Seq[GraftQuery] = Seq(

    GraftQuery(
      "s17_filtered_ann",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // FILTERED (hybrid) ANN — top-k among vectors satisfying a
        // metadata predicate, the production vector-search shape
        // ("nearest docs WHERE tenant = X AND lang = 'en'") and the
        // classically hard ANN regime: a selective filter empties the
        // nearest cells, so a fixed-nprobe probe under-recalls. The
        // standard mitigation is OVER-PROBING (nprobe 2 → 4 here;
        // production adapts nprobe to the filter's selectivity), with
        // the predicate applied to the ASSIGNMENT relation before any
        // vector moves — so the rerank join touches only filtered
        // candidates inside probed cells, and on the s12 partitioned
        // layout both the cid pruning and the metadata predicate reach
        // the scan together. Predicate (vec_id % 3 = 1) is independent
        // of cell structure — the adversarial case; the oracle replays
        // probe + filter + rerank exactly.
        val emb = doubled(t)
        val cent = centroids(emb)
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        val probe = cent.crossJoin(broadcast(qv))
          .select(col("cid"), cosineFast(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc)
          .limit(4)
          .select(col("cid"))
        val assigned = nearestCentroid(emb.filter(col("vec_id") =!= 0), cent)
          .select(col("vec_id"), col("cid"))
          .filter(col("vec_id") % 3 === 1)
        assigned
          .join(broadcast(probe), Seq("cid"))
          .join(emb.select(col("vec_id"), col("v")), Seq("vec_id"))
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), col("cid"), cosineFast(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(5)
          .select(col("vec_id"), col("cid"),
                  floor(col("sim") * 1000000 + 0.5).cast(LongType).as("sim_e6"))
      },
      Some("""WITH dim AS (
             |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
             |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
             |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
             |probe AS (
             |  SELECT cid FROM (
             |    SELECT c.cid,
             |      list_sum(list_transform(range(1, 65), i -> cv[i] * qv[i])) /
             |      sqrt(list_sum(list_transform(cv, x -> x * x)) *
             |           list_sum(list_transform(qv, x -> x * x))) AS csim
             |    FROM cent c, q)
             |  ORDER BY csim DESC, cid LIMIT 4),
             |sims AS (
             |  SELECT e.vec_id, c.cid,
             |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
             |    sqrt(list_sum(list_transform(v, x -> x * x)) *
             |         list_sum(list_transform(cv, x -> x * x))) AS sim
             |  FROM v e, cent c WHERE e.vec_id <> 0),
             |best AS (
             |  SELECT vec_id, cid,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
             |  FROM sims),
             |cand AS (
             |  SELECT b.vec_id, b.cid FROM best b JOIN probe p ON p.cid = b.cid
             |  WHERE b.rn = 1 AND b.vec_id % 3 = 1),
             |scored AS (
             |  SELECT ca.vec_id, ca.cid,
             |    list_sum(list_transform(range(1, 65), i -> e.v[i] * qv[i])) /
             |    sqrt(list_sum(list_transform(e.v, x -> x * x)) *
             |         list_sum(list_transform(qv, x -> x * x))) AS sim
             |  FROM cand ca JOIN v e ON e.vec_id = ca.vec_id, q)
             |SELECT vec_id, cid,
             |  CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS sim_e6
             |FROM scored ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin),
      "North star: FILTERED ANN — metadata predicate inside the probe, over-probed nprobe=4"),

    GraftQuery(
      "s18_filtered_recall",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // WHY s17 over-probes, measured: recall@5 of the filtered IVF
        // search against the exact filtered top-5, at nprobe=2 (s06's
        // unfiltered default) vs nprobe=4. The audit quantifies the
        // filtered-ANN failure mode — the filter thins every probed
        // cell, so candidate mass shifts into cells a narrow probe
        // skips — and pins that widening the probe never hurts
        // (recall4 ≥ recall2: candidate sets are nested by probe-set
        // inclusion, so this is a THEOREM, not a data accident; the
        // recall VALUES are corpus facts the oracle recomputes). The
        // exact arm is a full filtered scan — the audit's price, not
        // the serve path's.
        val emb = doubled(t)
        val cent = centroids(emb)
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        def probeIds(n: Int) = cent.crossJoin(broadcast(qv))
          .select(col("cid"), cosineFast(col("cv"), col("qv")).as("csim"))
          .orderBy(col("csim").desc, col("cid").asc).limit(n).select(col("cid"))
        val keep = col("vec_id") =!= 0 && col("vec_id") % 3 === 1
        val exactTop = emb.filter(keep).crossJoin(broadcast(qv))
          .select(col("vec_id"), cosineFast(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
        val assigned = nearestCentroid(emb.filter(col("vec_id") =!= 0), cent)
          .filter(col("vec_id") % 3 === 1).select(col("vec_id"), col("cid"))
        def ivfTop(n: Int) = assigned
          .join(broadcast(probeIds(n)), Seq("cid"))
          .join(emb.select(col("vec_id"), col("v")), Seq("vec_id"))
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), cosineFast(col("v"), col("qv")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
        val nExact = exactTop.agg(count(lit(1)).as("n_exact"))
        val hit2 = exactTop.join(ivfTop(2), Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("n_hit2"))
        val hit4 = exactTop.join(ivfTop(4), Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("n_hit4"))
        nExact.crossJoin(broadcast(hit2)).crossJoin(broadcast(hit4))
          .select(col("n_exact"),
            floor(col("n_hit2") * 100.0 / col("n_exact") + 0.5).cast(LongType).as("recall2_e2"),
            floor(col("n_hit4") * 100.0 / col("n_exact") + 0.5).cast(LongType).as("recall4_e2"),
            (col("n_hit4") >= col("n_hit2")).as("over_probe_never_hurts"))
      },
      Some("""WITH dim AS (
             |  SELECT label AS cid, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS c
             |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
             |cent AS (SELECT cid, list(c ORDER BY pos) AS cv FROM dim GROUP BY cid),
             |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
             |csims AS (
             |  SELECT c.cid,
             |    list_sum(list_transform(range(1, 65), i -> cv[i] * qv[i])) /
             |    sqrt(list_sum(list_transform(cv, x -> x * x)) *
             |         list_sum(list_transform(qv, x -> x * x))) AS csim
             |  FROM cent c, q),
             |probe2 AS (SELECT cid FROM csims ORDER BY csim DESC, cid LIMIT 2),
             |probe4 AS (SELECT cid FROM csims ORDER BY csim DESC, cid LIMIT 4),
             |fsims AS (
             |  SELECT e.vec_id,
             |    list_sum(list_transform(range(1, 65), i -> e.v[i] * qv[i])) /
             |    sqrt(list_sum(list_transform(e.v, x -> x * x)) *
             |         list_sum(list_transform(qv, x -> x * x))) AS sim
             |  FROM v e, q WHERE e.vec_id <> 0 AND e.vec_id % 3 = 1),
             |exact_top AS (SELECT vec_id, sim FROM fsims ORDER BY sim DESC, vec_id LIMIT 5),
             |asims AS (
             |  SELECT e.vec_id, c.cid,
             |    list_sum(list_transform(range(1, 65), i -> v[i] * cv[i])) /
             |    sqrt(list_sum(list_transform(v, x -> x * x)) *
             |         list_sum(list_transform(cv, x -> x * x))) AS sim
             |  FROM v e, cent c WHERE e.vec_id <> 0),
             |best AS (
             |  SELECT vec_id, cid,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
             |  FROM asims),
             |assigned AS (
             |  SELECT vec_id, cid FROM best WHERE rn = 1 AND vec_id % 3 = 1),
             |ivf2 AS (
             |  SELECT f.vec_id FROM fsims f JOIN assigned a ON a.vec_id = f.vec_id
             |  JOIN probe2 p ON p.cid = a.cid ORDER BY f.sim DESC, f.vec_id LIMIT 5),
             |ivf4 AS (
             |  SELECT f.vec_id FROM fsims f JOIN assigned a ON a.vec_id = f.vec_id
             |  JOIN probe4 p ON p.cid = a.cid ORDER BY f.sim DESC, f.vec_id LIMIT 5),
             |counts AS (
             |  SELECT
             |    (SELECT count(*) FROM exact_top) AS n_exact,
             |    (SELECT count(*) FROM exact_top e JOIN ivf2 i ON i.vec_id = e.vec_id) AS n_hit2,
             |    (SELECT count(*) FROM exact_top e JOIN ivf4 i ON i.vec_id = e.vec_id) AS n_hit4)
             |SELECT n_exact,
             |  CAST(floor(n_hit2 * 100.0 / n_exact + 0.5) AS BIGINT) AS recall2_e2,
             |  CAST(floor(n_hit4 * 100.0 / n_exact + 0.5) AS BIGINT) AS recall4_e2,
             |  (n_hit4 >= n_hit2) AS over_probe_never_hurts
             |FROM counts""".stripMargin),
      "North star: filtered-ANN recall audit — nprobe=2 vs over-probed 4 against exact filtered top-k"))

  /** JL projection of `v` onto the seeded hyperplanes: a k-dim array of
    * dot products, one narrow row-local pass (planes are literals baked
    * into the plan — broadcast-free, shuffle-free). */
  def projectJl(v: Column, planes: Seq[Array[Double]]): Column =
    array(planes.map { p =>
      val lp = array(p.toIndexedSeq.map(lit(_)): _*)
      dot(v, lp)
    }: _*)

  /** Oracle-side twin of [[projectJl]]: the seeded planes embedded as
    * double literals (Double.toString round-trips exactly) so the SQL
    * engine computes the identical projected vectors. */
  private def projSql(planes: Seq[Array[Double]], v: String): String =
    planes.map { p =>
      val lit = p.mkString("[", ", ", "]")
      s"list_sum(list_transform(range(1, ${p.length + 1}), i -> $v[i] * $lit[i]))"
    }.mkString("[", ", ", "]")

  private val projection: Seq[GraftQuery] = Seq(

    GraftQuery(
      "s22_jl_projection",
      (spark, dir) => {
        val spark2 = spark
        import spark2.implicits._
        val t = Tables(spark, dir)
        // Johnson–Lindenstrauss random projection — the dimensionality
        // lever a 100 TB embedding corpus pulls FIRST, before any index:
        // 64-dim vectors project onto 16 seeded gaussian hyperplanes
        // (4× fewer bytes per vector, 4× cheaper every downstream dot
        // product), and the audit publishes recall@{1,3,5} of the
        // projected-space cosine top-k against the exact 64-dim top-k
        // (s01), the same contract as the index audits s09/s14/s18.
        // Scale shape: the projection is row-local with the plane
        // matrix baked into the plan as literals (zero shuffles, zero
        // broadcasts, whole-stage codegen); the audit reduces every
        // candidate set with TakeOrderedAndProject to ≤5 rows before
        // the tiny driver-side window ranking. s02's LSH is the 1-bit
        // extreme of this projection; s22 keeps the magnitudes, so it
        // composes with every downstream index (IVF/PQ train equally
        // well in the projected space).
        val planes = hyperplanes(16, 64, seed = 7L)
        val emb = doubled(t).withColumn("pv", projectJl(col("v"), planes))
        val qrow = emb.filter(col("vec_id") === 0)
          .select(col("v").as("qv"), col("pv").as("pq"))
        val base = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(qrow))
        val w5 = org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col("vec_id").asc)
        def top5(c: DataFrame): DataFrame =
          c.orderBy(col("sim").desc, col("vec_id").asc).limit(5)
            .withColumn("rn", row_number().over(w5))
            .select(col("vec_id"), col("rn"))
        val exact = top5(base.select(col("vec_id"),
          cosineFast(col("v"), col("qv")).as("sim"))).toDF("vec_id", "rn_e")
        val jlTop = top5(base.select(col("vec_id"),
          cosineFast(col("pv"), col("pq")).as("sim")))
        val ks = Seq(1, 3, 5).toDF("k")
        val hits = jlTop.withColumnRenamed("rn", "rn_a")
          .join(exact, Seq("vec_id"))
          .crossJoin(broadcast(ks))
          .filter(col("rn_a") <= col("k") && col("rn_e") <= col("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("n"))
        ks.join(hits, Seq("k"), "left")
          .select(col("k"),
            coalesce(col("n"), lit(0L)).as("n_hits"),
            floor(coalesce(col("n"), lit(0L)) * 10000.0 / col("k") + 0.5)
              .cast(LongType).as("recall_e4"))
          .orderBy(col("k"))
      },
      Some(s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |p AS (SELECT vec_id, v, ${projSql(hyperplanes(16, 64, seed = 7L), "v")} AS pv FROM v),
              |q AS (SELECT v AS qv, pv AS pq FROM p WHERE vec_id = 0),
              |cos AS (
              |  SELECT e.vec_id,
              |    list_sum(list_transform(range(1, 65), i -> e.v[i] * qv[i])) /
              |    sqrt(list_sum(list_transform(e.v, x -> x * x)) *
              |         list_sum(list_transform(qv, x -> x * x))) AS sim
              |  FROM p e, q WHERE e.vec_id <> 0),
              |exact AS (
              |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rn_e
              |  FROM cos ORDER BY sim DESC, vec_id LIMIT 5),
              |pcos AS (
              |  SELECT e.vec_id,
              |    list_sum(list_transform(range(1, 17), i -> e.pv[i] * pq[i])) /
              |    sqrt(list_sum(list_transform(e.pv, x -> x * x)) *
              |         list_sum(list_transform(pq, x -> x * x))) AS sim
              |  FROM p e, q WHERE e.vec_id <> 0),
              |jl AS (
              |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rn_a
              |  FROM pcos ORDER BY sim DESC, vec_id LIMIT 5),
              |ks AS (SELECT unnest([1, 3, 5]) AS k),
              |hits AS (
              |  SELECT ks.k, count(*) AS n
              |  FROM jl j JOIN exact e ON e.vec_id = j.vec_id, ks
              |  WHERE j.rn_a <= ks.k AND e.rn_e <= ks.k
              |  GROUP BY ks.k)
              |SELECT ks.k AS k, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
              |  CAST(floor(coalesce(h.n, 0) * 10000.0 / ks.k + 0.5) AS BIGINT) AS recall_e4
              |FROM ks LEFT JOIN hits h ON h.k = ks.k
              |ORDER BY ks.k""".stripMargin),
      "North star: JL random projection 64→16 dims — row-local literal-matrix map, recall@k audit vs exact"),

    GraftQuery(
      "s23_hybrid_rrf",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // HYBRID RETRIEVAL — the serving query every RAG/search stack
        // runs in front of a training corpus: a lexical ranker and a
        // vector ranker fused by reciprocal-rank fusion (Cormack et al.
        // 2009, k=60). Corpus = docs carrying BOTH text and an
        // embedding (documents ⋈ embeddings on id); query = doc 0.
        //   - lexical: matched-term IDF sum, integer-exact via the t20
        //     bit-length idiom (idf_bits = len(bin(N+1)) − len(bin(df)))
        //     over DISTINCT (doc, term) — no transcendentals, so the
        //     ranking is bitwise-reproducible cross-engine;
        //   - vector: exact cosine vs the query embedding (s01's path);
        //   - fusion: rrf_e6 = Σ 1e6 div (60 + rank) over both top-10
        //     lists — integer division, rank-only (RRF's whole point:
        //     score scales never need calibrating).
        // Scale shape: df is ONE token shuffle; the query-term df slice
        // and the query vector broadcast; lexical scoring is a
        // broadcast semi-join + map-side-partial per-doc sum; both
        // candidate lists are cut by TakeOrderedAndProject to 10 rows
        // before the (driver-sized) ranking windows and fusion join.
        // At 100 TB the lexical side sits on an inverted-index layout
        // (src05 bucketing by term) but the fusion contract is
        // unchanged — ranks in, fused ranks out.
        val emb = doubled(t).select(col("vec_id").as("doc_id"), col("v"))
        val corpus = t.documents.select(col("doc_id"), col("text"))
          .join(emb, Seq("doc_id"))
        val tok = corpus
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
          .filter(length(col("tk")) > 0).distinct()
        val df = tok.groupBy("tk").agg(count(lit(1)).as("df"))
        val nDocs = corpus.agg(count(lit(1)).as("n_docs"))
        val qterms = tok.filter(col("doc_id") === 0).select("tk")
        val qdf = df.join(broadcast(qterms), Seq("tk"))
        val lex = tok.filter(col("doc_id") =!= 0)
          .join(broadcast(qdf), Seq("tk"))
          .crossJoin(broadcast(nDocs))
          .select(col("doc_id"),
            (length(bin(col("n_docs") + 1)) - length(bin(col("df")))).as("w"))
          .groupBy("doc_id").agg(sum(col("w")).as("score"))
        val qv = emb.filter(col("doc_id") === 0).select(col("v").as("qv"))
        val vec = corpus.filter(col("doc_id") =!= 0)
          .crossJoin(broadcast(qv))
          .select(col("doc_id"), cosineFast(col("v"), col("qv")).as("score"))
        def top10(c: DataFrame, rname: String): DataFrame = {
          val w = org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id").asc)
          c.orderBy(col("score").desc, col("doc_id").asc).limit(10)
            .withColumn(rname, row_number().over(w))
            .select(col("doc_id"), col(rname))
        }
        top10(lex, "lex_rank").join(top10(vec, "vec_rank"), Seq("doc_id"), "full_outer")
          .withColumn("rrf_e6",
            coalesce(expr("CAST(1000000 div (60 + lex_rank) AS BIGINT)"), lit(0L)) +
            coalesce(expr("CAST(1000000 div (60 + vec_rank) AS BIGINT)"), lit(0L)))
          .select(col("doc_id"),
            coalesce(col("lex_rank"), lit(0)).cast(LongType).as("lex_rank"),
            coalesce(col("vec_rank"), lit(0)).cast(LongType).as("vec_rank"),
            col("rrf_e6"))
          .orderBy(col("rrf_e6").desc, col("doc_id").asc)
          .limit(5)
      },
      Some("""WITH emb AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings),
             |corpus AS (SELECT d.doc_id, d.text, e.v FROM documents d JOIN emb e USING (doc_id)),
             |tok AS (SELECT DISTINCT doc_id, tk FROM (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM corpus)
             |  WHERE length(tk) > 0),
             |n AS (SELECT count(*) AS n_docs FROM corpus),
             |df AS (SELECT tk, count(*) AS df FROM tok GROUP BY tk),
             |qt AS (SELECT tk FROM tok WHERE doc_id = 0),
             |lex AS (
             |  SELECT t.doc_id,
             |    CAST(sum(length(bin(n.n_docs + 1)) - length(bin(d.df))) AS BIGINT) AS score
             |  FROM tok t JOIN qt USING (tk) JOIN df d USING (tk), n
             |  WHERE t.doc_id <> 0 GROUP BY t.doc_id),
             |lr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rank
             |       FROM lex ORDER BY score DESC, doc_id LIMIT 10),
             |q AS (SELECT v AS qv FROM corpus WHERE doc_id = 0),
             |vec AS (SELECT c.doc_id,
             |  list_sum(list_transform(range(1, 65), i -> c.v[i] * qv[i])) /
             |  sqrt(list_sum(list_transform(c.v, x -> x * x)) *
             |       list_sum(list_transform(qv, x -> x * x))) AS score
             |  FROM corpus c, q WHERE c.doc_id <> 0),
             |vr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS vec_rank
             |       FROM vec ORDER BY score DESC, doc_id LIMIT 10),
             |fused AS (
             |  SELECT coalesce(lr.doc_id, vr.doc_id) AS doc_id,
             |    CAST(coalesce(lr.lex_rank, 0) AS BIGINT) AS lex_rank,
             |    CAST(coalesce(vr.vec_rank, 0) AS BIGINT) AS vec_rank,
             |    CAST(coalesce(1000000 // (60 + lr.lex_rank), 0)
             |       + coalesce(1000000 // (60 + vr.vec_rank), 0) AS BIGINT) AS rrf_e6
             |  FROM lr FULL OUTER JOIN vr ON vr.doc_id = lr.doc_id)
             |SELECT doc_id, lex_rank, vec_rank, rrf_e6
             |FROM fused ORDER BY rrf_e6 DESC, doc_id LIMIT 5""".stripMargin),
      "North star: hybrid retrieval — integer-exact lexical IDF + exact cosine, fused by RRF(k=60)"),

    GraftQuery(
      "s24_mmr_diversify",
      (spark, dir) => {
        val t = Tables(spark, dir)
        // DIVERSIFIED SERVING — maximal marginal relevance (Carbonell &
        // Goldstein 1998) over the exact top-20 candidates: greedily
        // pick 5 results maximizing λ·sim(q,d) − (1−λ)·max_{s∈S}
        // sim(d,s) with λ=0.7, so near-duplicate hits can't crowd the
        // result list (the serving-side mirror of what d01–d19 scrub
        // from the corpus). Scale shape: the DISTRIBUTED part is s01's
        // narrow scan + TakeOrderedAndProject to 20 rows; the greedy
        // rerank is O(k²) on a k=20 list — bounded like the IVF probe
        // lists, the sanctioned driver-side size class. Cross-engine
        // determinism: all sims come from the same sequential-fold
        // cosine both engines compute bit-identically (the s01/s09
        // contract), the MMR arithmetic is sums/products of those
        // doubles with literal λ, and every argmax tie-breaks on
        // vec_id — so the greedy trajectory is replayed EXACTLY by the
        // oracle's 5 unrolled selection CTEs.
        val emb = doubled(t)
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        val cand = emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), col("v"), cosineFast(col("v"), col("qv")).as("s"))
          .orderBy(col("s").desc, col("vec_id").asc)
          .limit(20)
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < math.min(a.length, b.length)) {
            dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          dot / math.sqrt(na * nb)
        }
        val selected = scala.collection.mutable.ArrayBuffer[(Long, Array[Double], Double)]()
        val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
        (1 to 5).foreach { rank =>
          val scored = remaining.map { case (id, v, s) =>
            val pen = if (selected.isEmpty) 0.0
                      else selected.map(sl => cos(v, sl._2)).max
            (id, v, s, 0.7 * s - 0.3 * pen)
          }
          val best = scored.minBy { case (id, _, _, m) => (-m, id) }
          selected += ((best._1, best._2, best._3))
          remaining -= ((best._1, best._2, best._3))
          out += ((rank.toLong, best._1,
            math.floor(best._4 * 1000000 + 0.5).toLong))
        }
        val spark2 = spark
        import spark2.implicits._
        out.toSeq.toDF("rank", "vec_id", "mmr_e6")
      },
      Some {
        val cosSql = (a: String, b: String) =>
          s"""list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i])) /
             |  sqrt(list_sum(list_transform($a, x -> x * x)) *
             |       list_sum(list_transform($b, x -> x * x)))""".stripMargin
        val steps = (2 to 5).map { i =>
          val prev = (1 until i).map(j => s"SELECT vec_id FROM sel$j").mkString(" UNION ALL ")
          s"""m$i AS (
             |  SELECT c.vec_id, 0.7 * c.s - 0.3 * max(p.ps) AS mmr
             |  FROM cand c JOIN p ON p.ai = c.vec_id AND p.bi IN ($prev)
             |  WHERE c.vec_id NOT IN ($prev)
             |  GROUP BY c.vec_id, c.s),
             |sel$i AS (
             |  SELECT vec_id, CAST($i AS BIGINT) AS rank, mmr
             |  FROM m$i ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
           |simq AS (
           |  SELECT e.vec_id, e.v, ${cosSql("e.v", "qv")} AS s
           |  FROM v e, q WHERE e.vec_id <> 0),
           |cand AS (SELECT * FROM simq ORDER BY s DESC, vec_id LIMIT 20),
           |p AS (
           |  SELECT a.vec_id AS ai, b.vec_id AS bi, ${cosSql("a.v", "b.v")} AS ps
           |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
           |sel1 AS (
           |  SELECT vec_id, CAST(1 AS BIGINT) AS rank, 0.7 * s AS mmr
           |  FROM cand ORDER BY s DESC, vec_id LIMIT 1),
           |$steps
           |SELECT rank, vec_id, CAST(floor(mmr * 1000000 + 0.5) AS BIGINT) AS mmr_e6
           |FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
           |      UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
           |      UNION ALL SELECT * FROM sel5)""".stripMargin
      },
      "North star: MMR-diversified top-k serving — TakeOrdered candidates, greedy rerank replayed by unrolled oracle"))

  val queries: Seq[GraftQuery] =
    exactAndLsh ++ ivf ++ ivfpq ++ filtered ++ projection
}
