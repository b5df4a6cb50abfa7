package graft

import graft.sources.{GraftCatalog, SnapshotCatalog, SnapshotFileIndex}
import org.apache.spark.sql.functions._

/** The DSv2 `TableCatalog` surface: named-table SQL over snapshot-
  * catalog tables — reads rewritten to the planner-integrated FileIndex
  * relation (same pruned scan as the programmatic API), writes through
  * the V1 fallback as single catalog commits, time travel via
  * VERSION/TIMESTAMP AS OF. */
class GraftCatalogSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val dir = graft.streaming.Streams.dataDir("graft_warehouse_sql_")
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    dir
  }

  test("CREATE TABLE + INSERT INTO + SELECT by name: one commit per insert, reads serve the snapshot") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft.db.t1 (id BIGINT, k STRING)")
    val root = s"$wh/db/t1"
    assert(SnapshotCatalog.isTable(root), "CREATE TABLE did not commit")
    spark.sql("INSERT INTO graft.db.t1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.db.t1 VALUES (3, 'c')")
    // one catalog commit per INSERT: creation + 2 appends
    assert(SnapshotCatalog.versions(root) == Seq(1, 2, 3))
    assert(SnapshotCatalog.history(root).map(_._2) == Seq("append", "append", "append"))
    val got = spark.sql("SELECT id, k FROM graft.db.t1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // INSERT OVERWRITE is one replace commit; time travel still serves v2
    spark.sql("INSERT OVERWRITE graft.db.t1 VALUES (9, 'z')")
    assert(SnapshotCatalog.history(root).last._2 == "replace")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.t1").head().getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.t1 VERSION AS OF 2")
      .head().getLong(0) == 2L, "VERSION AS OF lost the pre-overwrite snapshot")
  }

  test("named-table SQL plans the SAME pruned FileIndex scan as the programmatic API") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    // stage through the SCALA API — SQL must see the same table
    val root = s"$wh/db/events_sql"
    (0 until 6).foreach { b =>
      val lo = b * 10L + 1L
      SnapshotCatalog.append(
        (lo to lo + 9L).map(i => (i, f"k$i%03d")).toDF("id", "k").coalesce(1),
        root, s"b$b")
    }
    val q = spark.sql(
      "SELECT count(*) AS n, sum(id) AS s FROM graft.db.events_sql WHERE id BETWEEN 25 AND 34")
    val r = q.collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == (25L to 34L).sum)
    // the rewrite produced a v1 FileScan whose listing the log stats cut
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Scan parquet"), s"named read did not plan a FileScan:\n$plan")
    assert(SnapshotFileIndex.scannedFiles(q) == 2L,
      s"named-table SQL lost planning-time file skipping")
    // deletion vectors apply to named reads with zero opt-in
    SnapshotCatalog.deleteWhere(spark, root, col("id") % 2 === 0)
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.events_sql").head().getLong(0) == 30L)
  }

  test("a partitioned named table: CREATE PARTITIONED BY, INSERT lays out hive-style, partition filters cut files") {
    val wh = warehouse
    spark.sql(
      "CREATE TABLE graft.db.part1 (id BIGINT, p STRING) PARTITIONED BY (p)")
    val root = s"$wh/db/part1"
    assert(SnapshotCatalog.partitionSpecAt(root, 1).exists(
      _.fieldNames.sameElements(Array("p"))), "creation commit lost the spec")
    spark.sql("INSERT INTO graft.db.part1 SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(1, 21)")
    spark.sql("INSERT INTO graft.db.part1 SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(21, 41)")
    // hive layout on disk + spec in the log
    val files = SnapshotCatalog.manifestFiles(root, SnapshotCatalog.latestVersion(root))
    assert(files.forall(f => f.contains("/p=a/") || f.contains("/p=b/")),
      "SQL insert did not lay out hive-style")
    val q = spark.sql(
      "SELECT count(*) AS n, sum(id) AS s FROM graft.db.part1 WHERE p = 'a'")
    val r = q.collect().head
    val evens = (1L until 41L).filter(_ % 2 == 0)
    assert(r.getLong(0) == evens.size.toLong && r.getLong(1) == evens.sum)
    val scanned = SnapshotFileIndex.scannedFiles(q)
    assert(scanned < files.size,
      s"partition filter did not cut the named scan: $scanned of ${files.size}")
    // TIMESTAMP AS OF now resolves the latest version
    val n = spark.sql(
      "SELECT count(*) AS n FROM graft.db.part1 TIMESTAMP AS OF current_timestamp()")
      .head().getLong(0)
    assert(n == 40L)
    // SHOW PARTITIONS: live partition dirs from the log alone
    val parts = spark.sql("SHOW PARTITIONS graft.db.part1")
      .collect().map(_.getString(0)).toSeq
    assert(parts == Seq("p=a", "p=b"), s"SHOW PARTITIONS drifted: $parts")
    val eUnpart = intercept[Exception] {
      spark.sql("SHOW PARTITIONS graft.db.t1")
    }
    assert(eUnpart.getMessage.contains("not a partitioned table"))
  }

  test("SQL DELETE routes into the deletion-vector tier: ANY deterministic predicate, one O(matched) commit, no rewrite; subqueries refuse") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/del1"
    SnapshotCatalog.append(
      (1L to 40L).map(i => (i, s"k$i")).toDF("id", "k").coalesce(1), root, "b0")
    val filesBefore = SnapshotCatalog.manifestFiles(root, 1)
    spark.sql("DELETE FROM graft.db.del1 WHERE id <= 10 OR k = 'k15'")
    // the delete landed as DVs: history kind, data files untouched
    assert(SnapshotCatalog.history(root).last._2 == "delete",
      "SQL DELETE did not land as a deletion-vector commit")
    val v2 = SnapshotCatalog.latestVersion(root)
    assert(SnapshotCatalog.manifestFiles(root, v2) == filesBefore,
      "SQL DELETE rewrote data files")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.del1").head().getLong(0) == 29L)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.db.del1 VERSION AS OF 1")
      .head().getLong(0) == 40L, "time travel lost the pre-delete rows")
    // a predicate BEYOND the pushed-filter subset (arithmetic) works —
    // the full-predicate tier routes through deleteWhere's column
    // evaluation, same one-DV-commit shape
    spark.sql("DELETE FROM graft.db.del1 WHERE id % 2 = 0 AND id > 20")
    val v3 = SnapshotCatalog.latestVersion(root)
    assert(SnapshotCatalog.history(root).last._2 == "delete" &&
      SnapshotCatalog.manifestFiles(root, v3) == filesBefore,
      "the arithmetic-predicate DELETE did not land as one DV commit")
    // survivors: 11..40 minus k15 (29 rows) minus the 10 even ids > 20
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.del1").head().getLong(0) == 19L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.db.del1 WHERE id % 2 = 0 AND id > 20")
      .head().getLong(0) == 0L)
    // a SUBQUERY predicate refuses loudly — never a wrong delete
    val e = intercept[Exception] {
      spark.sql("DELETE FROM graft.db.del1 WHERE id IN " +
        "(SELECT id FROM graft.db.del1 WHERE id > 35)")
    }
    assert(e.getMessage.toLowerCase.matches("(?s).*(delete|filter|condition|subquer).*"),
      e.getMessage)
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.del1").head().getLong(0) == 19L,
      "the refused DELETE changed the table")
    // TRUNCATE: one replace commit to empty; the old version survives
    spark.sql("TRUNCATE TABLE graft.db.del1")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.del1").head().getLong(0) == 0L)
    assert(SnapshotCatalog.history(root).last._2 == "replace")
    assert(SnapshotCatalog.readSnapshot(spark, root, Some(v2)).count() == 40L,
      "truncate destroyed the prior version")
  }

  test("SQL UPDATE: one merge-on-read commit — matched rows DV-deleted, transformed copies appended, CDC-derivable") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/upd1"
    SnapshotCatalog.append(
      (1L to 20L).map(i => (i, i * 10L, s"s$i")).toDF("id", "v", "s")
        .coalesce(1), root, "b0")
    val filesBefore = SnapshotCatalog.manifestFiles(root, 1)
    spark.sql("UPDATE graft.db.upd1 SET v = v + 1000, s = concat(s, '!') WHERE id <= 5")
    val v2 = SnapshotCatalog.latestVersion(root)
    // ONE commit, kind merge (data adds + DV adds), originals untouched
    assert(v2 == 2 && SnapshotCatalog.history(root).last._2 == "merge")
    assert(filesBefore.forall(SnapshotCatalog.manifestFiles(root, v2).contains),
      "UPDATE rewrote an untouched data file")
    val got = spark.sql("SELECT id, v, s FROM graft.db.upd1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == 20)
    assert(got.take(5).toSeq ==
      (1L to 5L).map(i => (i, i * 10L + 1000L, s"s$i!")).toSeq,
      s"updated rows wrong: ${got.take(5).toSeq}")
    assert(got.drop(5).toSeq == (6L to 20L).map(i => (i, i * 10L, s"s$i")).toSeq)
    // the UPDATE is CDC-derivable: retractions of the old rows +
    // inserts of the new, in one version
    val feed = SnapshotCatalog.changeFeedRows(spark, root, 1, 2)
    assert(feed.filter(col("_change_type") === "delete").count() == 5L)
    assert(feed.filter(col("_change_type") === "insert")
      .agg(min(col("v"))).head().getLong(0) == 1010L)
    // zero-match UPDATE commits nothing
    spark.sql("UPDATE graft.db.upd1 SET v = 0 WHERE id > 999")
    assert(SnapshotCatalog.latestVersion(root) == v2)
  }

  test("SQL MERGE INTO (upsert shape) routes to the mergeOnRead fast path") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/mrg1"
    SnapshotCatalog.append(
      (1L to 10L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1), root, "b0")
    Seq((5L, 999L), (11L, 111L)).toDF("id", "v")
      .createOrReplaceTempView("mrg1_src")
    spark.sql(
      """MERGE INTO graft.db.mrg1 t USING mrg1_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(SnapshotCatalog.history(root).last._2 == "merge")
    val got = spark.sql("SELECT id, v FROM graft.db.mrg1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == ((1L to 10L).map(i =>
      (i, if (i == 5L) 999L else i * 10L)) :+ (11L, 111L)),
      s"merge result wrong: $got")
    assert(got.map(_._1).distinct.length == got.length, "merge duplicated a key")
  }

  test("MERGE matched-action breadth: conditioned partial UPDATE + matched DELETE + conditioned INSERT in one commit; multi-match refuses") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/mrg2"
    SnapshotCatalog.append(
      (1L to 10L).map(i => (i, i * 10L, s"s$i")).toDF("id", "v", "s")
        .coalesce(1), root, "b0")
    val vBefore = SnapshotCatalog.latestVersion(root)
    val filesBefore = SnapshotCatalog.manifestFiles(root, vBefore)
    Seq((2L, 999L), (3L, 5L), (5L, 777L), (11L, 111L), (12L, 3L))
      .toDF("id", "nv").createOrReplaceTempView("mrg2_src")
    // clause-order semantics: id=2,5 → conditioned UPDATE (nv > 100,
    // partial SET touching v only, RHS mixing both sides); id=3 →
    // matched DELETE; id=11 → conditioned INSERT (nv > 100); id=12 →
    // matched by no clause on the not-matched side (nv <= 100) → dropped
    spark.sql(
      """MERGE INTO graft.db.mrg2 t USING mrg2_src s ON t.id = s.id
        |WHEN MATCHED AND s.nv > 100 THEN UPDATE SET v = s.nv + t.v
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.nv > 100 THEN INSERT (id, v) VALUES (s.id, s.nv)""".stripMargin)
    // ONE commit, merge-shaped, no data file rewritten
    assert(SnapshotCatalog.latestVersion(root) == vBefore + 1)
    assert(SnapshotCatalog.history(root).last._2 == "merge")
    assert(filesBefore.forall(
      SnapshotCatalog.manifestFiles(root, vBefore + 1).contains),
      "generalized MERGE rewrote an untouched data file")
    val got = spark.sql("SELECT id, v, s FROM graft.db.mrg2 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSeq
    val expected = (1L to 10L).flatMap {
      case 3L => None                                   // matched DELETE
      case 2L => Some((2L, 999L + 20L, Some("s2")))     // conditioned UPDATE
      case 5L => Some((5L, 777L + 50L, Some("s5")))
      case i => Some((i, i * 10L, Some(s"s$i")))
    } :+ ((11L, 111L, None))                            // INSERT, s NULL
    assert(got == expected, s"generalized MERGE drifted:\n got $got\n exp $expected")
    // a NARROWER-typed source (INT keys/values against the BIGINT
    // table — the common migration shape: the analyzer wraps the key
    // in a cast, and the landed batch must carry the TABLE's types) +
    // a scalar subquery in the matched condition
    spark.sql(
      """MERGE INTO graft.db.mrg2 t
        |USING (SELECT CAST(4 AS INT) AS id, CAST(7 AS INT) AS nv) s
        |ON t.id = s.id
        |WHEN MATCHED AND t.v < (SELECT max(v) FROM graft.db.mrg2)
        |  THEN UPDATE SET v = s.nv""".stripMargin)
    assert(spark.sql("SELECT v FROM graft.db.mrg2 WHERE id = 4")
      .head().getLong(0) == 7L, "cast-keyed conditioned MERGE failed")
    // UPDATE with an uncorrelated subquery predicate works (the
    // condition re-resolves over the command's own snapshot read)
    spark.sql("UPDATE graft.db.mrg2 SET v = v + 1 WHERE id IN " +
      "(SELECT id FROM graft.db.mrg2 WHERE v >= 900)")
    assert(spark.sql("SELECT v FROM graft.db.mrg2 WHERE id = 2")
      .head().getLong(0) == 1020L, "subquery UPDATE failed")
    // a source with duplicate keys makes the matched action
    // non-deterministic: refuse loudly, nothing commits
    val vBeforeDup = SnapshotCatalog.latestVersion(root)
    Seq((7L, 1000L), (7L, 2000L)).toDF("id", "nv")
      .createOrReplaceTempView("mrg2_dup")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft.db.mrg2 t USING mrg2_dup s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("multiple source rows"))),
      s"multi-match did not refuse: $e")
    assert(SnapshotCatalog.latestVersion(root) == vBeforeDup,
      "the refused MERGE committed something")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: clause-ordered UPDATE/DELETE on the unmatched target side, one commit, no rewrite, CDC-derivable") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/mrg3"
    SnapshotCatalog.append(
      (1L to 10L).map(i => (i, i * 10L, if (i % 2 == 0) "even" else "odd"))
        .toDF("id", "v", "s").coalesce(1), root, "b0")
    val vBefore = SnapshotCatalog.latestVersion(root)
    val filesBefore = SnapshotCatalog.manifestFiles(root, vBefore)
    Seq((2L, 999L), (3L, 888L)).toDF("id", "nv")
      .createOrReplaceTempView("mrg3_src")
    // matched (2,3) → UPDATE from source; unmatched-by-source odd rows
    // → conditioned DELETE; remaining unmatched (even) → UPDATE against
    // the target row only (clause order: DELETE wins for odd)
    spark.sql(
      """MERGE INTO graft.db.mrg3 t USING mrg3_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED BY SOURCE AND t.s = 'odd' THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v + 1""".stripMargin)
    assert(SnapshotCatalog.latestVersion(root) == vBefore + 1,
      "by-source MERGE was not one commit")
    assert(SnapshotCatalog.history(root).last._2 == "merge")
    assert(filesBefore.forall(
      SnapshotCatalog.manifestFiles(root, vBefore + 1).contains),
      "by-source MERGE rewrote an untouched data file")
    val got = spark.sql("SELECT id, v FROM graft.db.mrg3 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = Seq(
      (2L, 999L),          // matched UPDATE
      (3L, 888L),          // matched UPDATE (odd, but matched side wins)
      (4L, 41L), (6L, 61L), (8L, 81L), (10L, 101L)) // by-source UPDATE
    assert(got == expected, s"by-source MERGE drifted:\n got $got\n exp $expected")
    // CDC-derivable: the single version retracts every actioned row
    // (matched and by-source alike) and inserts the transformed copies
    val feed = SnapshotCatalog.changeFeedRows(
      spark, root, vBefore, vBefore + 1)
    assert(feed.filter(col("_change_type") === "delete").count() == 10L,
      "by-source retractions missing from the change feed")
    assert(feed.filter(col("_change_type") === "insert").count() == 6L)
    // an empty source makes EVERY row unmatched-by-source
    spark.sql("SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS nv " +
      "WHERE 1 = 0").createOrReplaceTempView("mrg3_empty")
    spark.sql(
      """MERGE INTO graft.db.mrg3 t USING mrg3_empty s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED BY SOURCE AND t.id >= 8 THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.db.mrg3")
      .head().getLong(0) == 4L, "empty-source by-source DELETE failed")
  }

  test("CONVERT TO GRAFT: in-place conversion of a plain hive-partitioned dir — no byte copied, named DML works after, crash re-run converges") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    // a PLAIN parquet table (hive-partitioned), written outside the
    // catalog, at a warehouse table location
    val root = s"$wh/db/conv1"
    (1L to 40L).map(i => (i, i * 10L, s"p${i % 4}"))
      .toDF("id", "v", "p").repartition(2)
      .write.partitionBy("p").parquet(root)
    def bytes(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val it = fs.listFiles(p, true)
      var s = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) s += f.getLen
      }
      s
    }
    val bytesBefore = bytes(root)
    // simulate a CRASHED earlier convert: pre-move one file by hand
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val one = SnapshotCatalog.listDataEntries(s"$root/p=p1").head._1
    val preDest = new org.apache.hadoop.fs.Path(
      s"$root/data/convert-v1/p=p1/${new org.apache.hadoop.fs.Path(one).getName}")
    fs.mkdirs(preDest.getParent)
    assert(fs.rename(new org.apache.hadoop.fs.Path(one), preDest))
    val row = spark.sql(s"CONVERT TO GRAFT parquet.`$root` PARTITIONED BY (p)")
      .collect().head
    assert(row.getInt(1) == 1, "convert did not commit version 1")
    assert(SnapshotCatalog.isTable(root))
    // no byte copied: the converted table's data is the SAME bytes
    assert(bytes(root) == bytesBefore,
      s"convert copied data: $bytesBefore -> ${bytes(root)}")
    // named reads serve everything, partition values reconstructed
    val got = spark.sql(
      "SELECT p, count(*) AS n, sum(v) AS s FROM graft.db.conv1 GROUP BY p ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = (1L to 40L).groupBy(i => s"p${i % 4}").toSeq.sortBy(_._1)
      .map { case (p, is) => (p, is.size.toLong, is.map(_ * 10L).sum) }
    assert(got == exp, s"converted read drifted:\n got $got\n exp $exp")
    // partition pruning holds on the converted layout: the named read
    // scans only p=p2's files
    val all = SnapshotCatalog.manifestFiles(root, 1)
    val pq = spark.sql("SELECT count(*) AS n FROM graft.db.conv1 WHERE p = 'p2'")
    pq.collect()
    val scanned = SnapshotFileIndex.scannedFiles(pq)
    assert(scanned > 0L && scanned < all.size,
      s"converted table did not prune: $scanned of ${all.size}")
    // the table is fully DML-capable after conversion
    spark.sql("DELETE FROM graft.db.conv1 WHERE id % 2 = 0")
    assert(spark.sql("SELECT count(*) FROM graft.db.conv1")
      .head().getLong(0) == 20L)
    // converting an already-converted table refuses
    val e = intercept[Exception] {
      spark.sql(s"CONVERT TO GRAFT parquet.`$root`")
    }
    assert(e.getMessage.contains("already a graft table"))
    // a FLAT (unpartitioned) dir converts through the Scala API
    val flat = s"$wh/db/conv2"
    (1L to 10L).map(i => (i, s"k$i")).toDF("id", "k").coalesce(2)
      .write.parquet(flat)
    val (nf, v) = SnapshotCatalog.convertInPlace(spark, flat)
    assert(nf == 2 && v == 1)
    assert(spark.sql("SELECT sum(id) FROM graft.db.conv2")
      .head().getLong(0) == 55L)
    // a mis-declared spec refuses loudly
    val flat2 = s"$wh/db/conv3"
    (1L to 4L).map(i => (i, s"k$i")).toDF("id", "k")
      .write.parquet(flat2)
    val e2 = intercept[Exception] {
      spark.sql(s"CONVERT TO GRAFT parquet.`$flat2` PARTITIONED BY (k)")
    }
    assert(e2.getMessage.contains("does not match the directory layout"))
  }

  test("TBLPROPERTIES: log-carried, SHOW/SET/UNSET, survive rewrites, time travel serves each version's map") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft.db.props1 (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('team' = 'data', 'tier' = 'gold')")
    val root = s"$wh/db/props1"
    def showProps(extra: String = ""): Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES graft.db.props1$extra")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(showProps().get("team").contains("data") &&
      showProps().get("tier").contains("gold"),
      s"CREATE TBLPROPERTIES lost: ${showProps()}")
    spark.sql("INSERT INTO graft.db.props1 VALUES (1, 10)")
    spark.sql("ALTER TABLE graft.db.props1 SET TBLPROPERTIES " +
      "('tier' = 'silver', 'retention' = '7d')")
    spark.sql("ALTER TABLE graft.db.props1 UNSET TBLPROPERTIES ('team')")
    val now = showProps()
    assert(now.get("tier").contains("silver") &&
      now.get("retention").contains("7d") && !now.contains("team"),
      s"SET/UNSET drifted: $now")
    // properties survive a rewrite (Delta keeps them across OPTIMIZE/
    // REPLACE) and time travel serves the version's own map
    spark.sql("INSERT OVERWRITE graft.db.props1 VALUES (2, 20)")
    assert(showProps().get("tier").contains("silver"),
      "properties lost across a replace commit")
    val vOld = 1 // the creation commit carried team=data
    assert(SnapshotCatalog.propertiesAt(root, vOld)
      .get("team").contains("data"),
      "time travel lost the old properties map")
    // DESCRIBE DETAIL: live-table facts from the log alone
    val det = spark.sql("DESCRIBE DETAIL graft.db.props1").collect().head
    assert(det.getString(0) == "graft" && det.getString(1) == root &&
      det.getLong(3) >= 1L && det.getLong(4) > 0L && det.getLong(5) == 1L,
      s"DESCRIBE DETAIL drifted: $det")
  }

  test("CHECK constraints: ADD validates existing rows, writes enforce in-pass (INSERT/UPDATE/MERGE), NULL passes, DROP lifts") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/chk1"
    SnapshotCatalog.append(
      Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Option.empty[Long]))
        .toDF("id", "v").coalesce(1), root, "b0")
    // adding a constraint existing rows VIOLATE refuses, commits nothing
    val v0 = SnapshotCatalog.latestVersion(root)
    val eBad = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.chk1 ADD CONSTRAINT vbig CHECK (v > 15)")
    }
    assert(eBad.getMessage.contains("existing rows violate"))
    assert(SnapshotCatalog.latestVersion(root) == v0,
      "refused ADD CONSTRAINT committed something")
    // a satisfiable constraint lands as one metadata-only commit; the
    // NULL row passes (SQL CHECK: only FALSE violates)
    spark.sql("ALTER TABLE graft.db.chk1 ADD CONSTRAINT vpos CHECK (v > 0)")
    assert(SnapshotCatalog.latestVersion(root) == v0 + 1)
    assert(SnapshotCatalog.manifestFiles(root, v0 + 1) ==
      SnapshotCatalog.manifestFiles(root, v0), "ADD CONSTRAINT touched data")
    // INSERT enforcing: a violating row fails the write, nothing commits
    val vC = SnapshotCatalog.latestVersion(root)
    val eIns = intercept[Exception] {
      spark.sql("INSERT INTO graft.db.chk1 VALUES (4, -5)")
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(eIns).exists(c => Option(c.getMessage)
      .exists(_.contains("CHECK constraint vpos"))),
      s"INSERT violation not attributed: $eIns")
    assert(SnapshotCatalog.latestVersion(root) == vC,
      "violating INSERT committed")
    // a passing INSERT (including NULL) lands
    spark.sql("INSERT INTO graft.db.chk1 VALUES (4, 40), (5, NULL)")
    assert(spark.sql("SELECT count(*) FROM graft.db.chk1")
      .head().getLong(0) == 5L)
    // UPDATE and MERGE route their appended copies through the same
    // enforcement seam
    val eUpd = intercept[Exception] {
      spark.sql("UPDATE graft.db.chk1 SET v = -1 WHERE id = 1")
    }
    assert(causes(eUpd).exists(c => Option(c.getMessage)
      .exists(_.contains("CHECK constraint vpos"))), s"UPDATE bypassed: $eUpd")
    Seq((2L, -7L)).toDF("id", "nv").createOrReplaceTempView("chk1_src")
    val eMrg = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft.db.chk1 t USING chk1_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    }
    assert(causes(eMrg).exists(c => Option(c.getMessage)
      .exists(_.contains("CHECK constraint vpos"))), s"MERGE bypassed: $eMrg")
    // DROP CONSTRAINT lifts enforcement; unknown names refuse
    spark.sql("ALTER TABLE graft.db.chk1 DROP CONSTRAINT vpos")
    spark.sql("UPDATE graft.db.chk1 SET v = -1 WHERE id = 1")
    assert(spark.sql("SELECT v FROM graft.db.chk1 WHERE id = 1")
      .head().getLong(0) == -1L)
    val eNo = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.chk1 DROP CONSTRAINT nope")
    }
    assert(eNo.getMessage.contains("no constraint named"))
  }

  test("ALTER TABLE DROP COLUMN: metadata-only, reads project past old files, tombstone refuses resurrection, REPLACE clears it") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/dropc1"
    SnapshotCatalog.append(
      (1L to 6L).map(i => (i, i * 10L, s"s$i")).toDF("id", "v", "s")
        .coalesce(1), root, "b0")
    val v1 = SnapshotCatalog.latestVersion(root)
    val filesBefore = SnapshotCatalog.manifestFiles(root, v1)
    spark.sql("ALTER TABLE graft.db.dropc1 DROP COLUMN s")
    val v2 = SnapshotCatalog.latestVersion(root)
    // metadata-only: same files, new served schema
    assert(v2 == v1 + 1 &&
      SnapshotCatalog.manifestFiles(root, v2) == filesBefore,
      "DROP COLUMN touched data files")
    assert(spark.sql("SELECT * FROM graft.db.dropc1").columns.toSeq ==
      Seq("id", "v"), "dropped column still served")
    // time travel serves the pre-drop schema WITH the column
    assert(spark.sql(s"SELECT * FROM graft.db.dropc1 VERSION AS OF $v1")
      .columns.toSeq == Seq("id", "v", "s"),
      "time travel lost the pre-drop column")
    // appends keep working (old files' physical column is projected past)
    spark.sql("INSERT INTO graft.db.dropc1 VALUES (7, 70)")
    assert(spark.sql("SELECT count(*), sum(v) FROM graft.db.dropc1")
      .collect().head match { case r => r.getLong(0) == 7L && r.getLong(1) == 280L },
      "post-drop append drifted")
    // resurrection refuses: appending the dropped name (or re-ADDing it)
    // would serve the OLD files' physical data under the new name
    val eApp = intercept[Exception] {
      SnapshotCatalog.append(Seq((8L, 80L, "ghost")).toDF("id", "v", "s")
        .coalesce(1), root, "b1")
    }
    assert(eApp.getMessage.contains("resurrect"), s"append guard missing: $eApp")
    val eAdd = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.dropc1 ADD COLUMNS (s STRING)")
    }
    assert(eAdd.getMessage.contains("DROPPED"), s"re-ADD guard missing: $eAdd")
    // partition columns and constraint-referenced columns refuse to drop
    spark.sql("ALTER TABLE graft.db.dropc1 ADD CONSTRAINT vpos CHECK (v > 0)")
    val eCons = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.dropc1 DROP COLUMN v")
    }
    assert(eCons.getMessage.contains("CHECK constraint"),
      s"constraint-reference guard missing: $eCons")
    // a FULL REPLACE physically rewrites — the tombstone clears and the
    // name is usable again
    spark.sql("REPLACE TABLE graft.db.dropc1 AS " +
      "SELECT id, v, CAST('fresh' AS STRING) AS s FROM graft.db.dropc1")
    assert(spark.sql("SELECT count(*) FROM graft.db.dropc1 WHERE s = 'fresh'")
      .head().getLong(0) == 7L, "post-replace re-added column wrong")
    spark.sql("INSERT INTO graft.db.dropc1 VALUES (9, 90, 'ok')")
    assert(spark.sql("SELECT count(*) FROM graft.db.dropc1")
      .head().getLong(0) == 8L, "tombstone did not clear after replace")
    // RENAME refuses with the rewrite pointer
    val eRen = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.dropc1 RENAME COLUMN v TO val")
    }
    assert(eRen.getMessage.contains("physical-name mapping"),
      s"rename refusal drifted: $eRen")
  }

  test("CLUSTER BY: declared clustering drives bare OPTIMIZE (liquid shape); VACUUM DRY RUN previews without mutating") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    spark.sql("CREATE TABLE graft.db.liq1 (id BIGINT, v BIGINT) CLUSTER BY (id)")
    val root = s"$wh/db/liq1"
    assert(SnapshotCatalog.properties(root).get("graft.clusterBy")
      .contains("id"), "CREATE ... CLUSTER BY did not land the property")
    // shuffled litter (>= the merge fan-out floor): every file spans
    // the whole id range
    (0 until 4).foreach { b =>
      SnapshotCatalog.append(
        (1L to 99L by 3L).map(i => (((i * 37 + b) % 99) + 1L, i))
          .toDF("id", "v").coalesce(1), root, s"b$b")
    }
    // a BARE OPTIMIZE clusters by the declared columns: the rewrite is
    // range-partitioned + sorted, so a range predicate afterwards cuts
    // files by the refreshed stats
    val fired = spark.sql("OPTIMIZE graft.db.liq1").collect().head.getBoolean(0)
    assert(fired)
    val q = spark.sql("SELECT count(*) AS n FROM graft.db.liq1 WHERE id <= 20")
    q.collect()
    val v = SnapshotCatalog.latestVersion(root)
    val live = SnapshotCatalog.manifestFiles(root, v).size
    assert(live >= 2 && SnapshotFileIndex.scannedFiles(q) < live,
      s"bare OPTIMIZE did not cluster: scanned " +
        s"${SnapshotFileIndex.scannedFiles(q)} of $live")
    // a declared clustering column refuses to DROP (clear it first)
    val eDrop = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.liq1 DROP COLUMN id")
    }
    assert(eDrop.getMessage.contains("CLUSTER BY"), eDrop.getMessage)
    // CLUSTER BY NONE clears the declaration
    spark.sql("ALTER TABLE graft.db.liq1 CLUSTER BY NONE")
    assert(!SnapshotCatalog.properties(root).contains("graft.clusterBy"))
    // VACUUM DRY RUN reports what WOULD expire, mutating nothing
    val vsBefore = SnapshotCatalog.versions(root)
    val dry = spark.sql("VACUUM graft.db.liq1 RETAIN 0 HOURS DRY RUN")
      .collect().head
    assert(dry.getInt(0) > 0 && dry.getInt(1) > 0,
      s"dry run previewed nothing: $dry")
    assert(SnapshotCatalog.versions(root) == vsBefore,
      "VACUUM DRY RUN expired versions")
    val wet = spark.sql("VACUUM graft.db.liq1 RETAIN 0 HOURS")
      .collect().head
    assert(wet.getInt(0) == dry.getInt(0) && wet.getInt(1) == dry.getInt(1),
      s"dry-run preview drifted from the real vacuum: $dry vs $wet")
  }

  test("COPY INTO: exactly once per source file, markers atomic with the data; re-runs load only the remainder") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    spark.sql("CREATE TABLE graft.db.cpy1 (id BIGINT, v BIGINT)")
    val root = s"$wh/db/cpy1"
    val src = graft.streaming.Streams.dataDir("graft_copy_src_")
    (1L to 5L).map(i => (i, i * 10L)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/a")
    (6L to 9L).map(i => (i, i * 10L)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/b")
    val r1 = spark.sql(s"COPY INTO graft.db.cpy1 FROM '$src'")
      .collect().head
    assert(r1.getInt(0) == 2, s"first COPY loaded ${r1.getInt(0)} files")
    assert(spark.sql("SELECT sum(v) FROM graft.db.cpy1").head().getLong(0) ==
      (1L to 9L).map(_ * 10L).sum)
    // replay: nothing new, no commit
    val vAfter = SnapshotCatalog.latestVersion(root)
    val r2 = spark.sql(s"COPY INTO graft.db.cpy1 FROM '$src'")
      .collect().head
    assert(r2.getInt(0) == 0 && SnapshotCatalog.latestVersion(root) == vAfter,
      "replayed COPY re-loaded or committed")
    // incremental: one NEW file loads alone; a missing column null-fills
    Seq(Tuple1(100L)).toDF("id").coalesce(1).write.parquet(s"$src/c")
    val r3 = spark.sql(s"COPY INTO graft.db.cpy1 FROM '$src'")
      .collect().head
    assert(r3.getInt(0) == 1, "incremental COPY missed the new file")
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.cpy1 WHERE id = 100 AND v IS NULL")
      .head().getLong(0) == 1L, "missing source column did not null-fill")
    // an extra source column refuses loudly, nothing commits
    val vB = SnapshotCatalog.latestVersion(root)
    Seq((200L, 1L, "x")).toDF("id", "v", "extra")
      .coalesce(1).write.parquet(s"$src/d")
    val e = intercept[Exception] {
      spark.sql(s"COPY INTO graft.db.cpy1 FROM '$src'")
    }
    assert(e.getMessage.contains("extra"), e.getMessage)
    assert(SnapshotCatalog.latestVersion(root) == vB,
      "refused COPY committed something")
  }

  test("OPTIMIZE WHERE: partition-scoped pass touches only matching partitions; out-of-scope deletes stay in effect") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/optw1"
    // litter in two partitions, then a delete landing DVs in BOTH
    (0 until 3).foreach { b =>
      SnapshotCatalog.append(
        (1L to 10L).map(i => (b * 10L + i, i * 10L, if (i % 2 == 0) "a" else "b"))
          .toDF("id", "v", "p").coalesce(1),
        root, s"b$b", partitionBy = Seq("p"))
    }
    // i=9 -> p=b, i=10 -> p=a: DVs land in BOTH partitions
    spark.sql("DELETE FROM graft.db.optw1 WHERE v IN (90, 100)")
    val vPre = SnapshotCatalog.latestVersion(root)
    val bFilesPre = SnapshotCatalog.manifestFiles(root, vPre)
      .filter(_.contains("p=b"))
    val preCounts = spark.sql(
      "SELECT p, count(*) AS n FROM graft.db.optw1 GROUP BY p ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // scoped pass: only p=a compacts; p=b's very files survive and its
    // deletes keep applying (DV positions re-landed, not reset)
    val fired = spark.sql("OPTIMIZE graft.db.optw1 WHERE p = 'a'")
      .collect().head.getBoolean(0)
    assert(fired, "scoped OPTIMIZE did not fire")
    val vPost = SnapshotCatalog.latestVersion(root)
    val postFiles = SnapshotCatalog.manifestFiles(root, vPost)
    assert(bFilesPre.forall(postFiles.contains),
      "scoped OPTIMIZE rewrote an out-of-scope partition's files")
    assert(postFiles.count(_.contains("p=a")) <
      SnapshotCatalog.manifestFiles(root, vPre).count(_.contains("p=a")),
      "scoped OPTIMIZE did not compact the in-scope partition")
    assert(SnapshotCatalog.dvFiles(root, vPost).nonEmpty,
      "scoped OPTIMIZE reset the out-of-scope deletion vectors")
    val postCounts = spark.sql(
      "SELECT p, count(*) AS n FROM graft.db.optw1 GROUP BY p ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(postCounts == preCounts,
      s"scoped OPTIMIZE changed content: $preCounts -> $postCounts")
    // re-running the same scope is quiescent for the bearing side (p=a
    // has no litter or DVs left; the fresh single output is clean)
    // a non-partition column in WHERE refuses
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE graft.db.optw1 WHERE v = 10")
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
    // the unscoped pass then retires everything: DVs clear
    spark.sql("OPTIMIZE graft.db.optw1")
    assert(SnapshotCatalog.dvFiles(root,
      SnapshotCatalog.latestVersion(root)).isEmpty)
    assert(spark.sql("SELECT count(*) FROM graft.db.optw1")
      .head().getLong(0) == preCounts.map(_._2).sum)
  }

  test("SHALLOW CLONE: zero-copy sandbox referencing the source's files/DVs; clones and source diverge independently") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val srcRoot = s"$wh/db/clsrc"
    SnapshotCatalog.append(
      (1L to 20L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(2),
      srcRoot, "b0")
    // a DV delete on the source — the clone must inherit it in effect
    SnapshotCatalog.deleteWhere(spark, srcRoot, col("id") > 15L)
    val vSrc = SnapshotCatalog.latestVersion(srcRoot)
    val row = spark.sql(
      "CREATE TABLE graft.db.clone1 SHALLOW CLONE graft.db.clsrc")
      .collect().head
    assert(row.getInt(0) == vSrc)
    val cloneRoot = s"$wh/db/clone1"
    // zero copy: the clone's data dir holds NOTHING; reads ≡ source
    assert(SnapshotCatalog.listDataEntries(s"$cloneRoot/data").isEmpty,
      "shallow clone copied data")
    assert(spark.sql("SELECT sum(v) FROM graft.db.clone1").head().getLong(0) ==
      (1L to 15L).map(_ * 10L).sum, "clone read drifted from source")
    // divergence: DML on the clone never touches the source...
    spark.sql("DELETE FROM graft.db.clone1 WHERE id <= 5")
    assert(spark.sql("SELECT count(*) FROM graft.db.clone1")
      .head().getLong(0) == 10L)
    assert(spark.sql("SELECT count(*) FROM graft.db.clsrc")
      .head().getLong(0) == 15L, "clone DELETE leaked into the source")
    // ...and source appends never show in the clone
    spark.sql("INSERT INTO graft.db.clsrc VALUES (99, 990)")
    assert(spark.sql("SELECT count(*) FROM graft.db.clone1")
      .head().getLong(0) == 10L, "source append leaked into the clone")
    // the clone's own vacuum GCs only its own staged files — the
    // referenced source files survive
    SnapshotCatalog.expire(cloneRoot, keepLast = 1, minAgeMs = 0L)
    assert(spark.sql("SELECT count(*) FROM graft.db.clsrc WHERE id <= 20")
      .head().getLong(0) == 15L, "clone vacuum deleted source files")
    // the ownership rule under the WORST shape: the clone REWRITES its
    // content (its old versions now reference ONLY foreign source
    // files), then vacuums aggressively — the dropped versions' source
    // references must fall out of the log WITHOUT touching the source
    spark.sql("INSERT OVERWRITE graft.db.clone1 VALUES (1000, 1)")
    SnapshotCatalog.expire(cloneRoot, keepLast = 1, minAgeMs = 0L)
    assert(spark.sql("SELECT count(*) FROM graft.db.clsrc")
      .head().getLong(0) == 16L,
      "a rewritten clone's vacuum deleted the SOURCE table's files")
    assert(spark.sql("SELECT count(*) FROM graft.db.clone1")
      .head().getLong(0) == 1L)
    // VERSION AS OF clones the historical snapshot (pre-delete v1)
    spark.sql("CREATE TABLE graft.db.clone2 SHALLOW CLONE graft.db.clsrc " +
      "VERSION AS OF 1")
    assert(spark.sql("SELECT count(*) FROM graft.db.clone2")
      .head().getLong(0) == 20L, "versioned clone drifted")
    // cloning onto an existing table refuses
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.db.clone1 SHALLOW CLONE graft.db.clsrc")
    }
    assert(e.getMessage.contains("already a table"))
  }

  test("ALTER TABLE ADD COLUMNS: one metadata-only commit; old rows null-fill; drops/re-types refuse") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/alt1"
    SnapshotCatalog.append((1L to 6L).map(i => (i, s"k$i")).toDF("id", "k")
      .coalesce(1), root, "b0")
    val filesBefore = SnapshotCatalog.manifestFiles(root, 1)
    spark.sql("ALTER TABLE graft.db.alt1 ADD COLUMNS (extra BIGINT)")
    val v2 = SnapshotCatalog.latestVersion(root)
    assert(v2 == 2 && SnapshotCatalog.manifestFiles(root, v2) == filesBefore,
      "ADD COLUMNS touched data files")
    // pre-evolution rows null-fill; the new column is insertable
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.alt1 WHERE extra IS NULL")
      .head().getLong(0) == 6L)
    spark.sql("INSERT INTO graft.db.alt1 VALUES (7, 'k7', 700)")
    val got = spark.sql(
      "SELECT id, extra FROM graft.db.alt1 WHERE extra IS NOT NULL").collect()
    assert(got.length == 1 && got.head.getLong(0) == 7L && got.head.getLong(1) == 700L)
    // time travel to the pre-evolution version serves the OLD schema
    assert(!spark.sql(s"SELECT * FROM graft.db.alt1 VERSION AS OF 1")
      .columns.contains("extra"),
      "time travel leaked the accreted column into the old version")
    // re-types refuse — Spark's analyzer rejects the narrowing change
    // before it reaches the catalog (DROP COLUMN has its own
    // metadata-only path, covered by its dedicated test)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.alt1 ALTER COLUMN k TYPE BIGINT")
    }
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("rewrite"), e.getMessage)
  }

  test("SQL UPDATE evaluates every SET RHS against the PRE-update row: SET a = b, b = a swaps") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/updswap"
    SnapshotCatalog.append(
      (1L to 6L).map(i => (i, i * 10L, i * 100L)).toDF("id", "a", "b")
        .coalesce(1), root, "b0")
    // SQL UPDATE semantics (and the Delta UpdateCommand pattern): all
    // assignments see the ORIGINAL row — a sequential withColumn chain
    // would feed the second assignment the first one's new value and
    // silently fail to swap
    spark.sql("UPDATE graft.db.updswap SET a = b, b = a WHERE id <= 3")
    val got = spark.sql("SELECT id, a, b FROM graft.db.updswap ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == (1L to 6L).map(i =>
      if (i <= 3L) (i, i * 100L, i * 10L) else (i, i * 10L, i * 100L)),
      s"swap failed: $got")
    // a SET target outside the table's columns refuses loudly
    val e = intercept[Exception] {
      SnapshotCatalog.updateWhere(spark, root, col("id") === 1L,
        Seq("nope" -> lit(0L)), "badset")
    }
    assert(e.getMessage.contains("not in the table's columns"), e.getMessage)
  }

  test("SHOW NAMESPACES excludes table roots; TRUNCATE refuses at a pinned version") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    // a top-level TABLE under the warehouse must not list as a namespace
    SnapshotCatalog.append((1L to 3L).toDF("id").coalesce(1),
      s"$wh/toplevel_t", "b0")
    val namespaces = spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).toSet
    assert(namespaces.contains("db"), s"lost the real namespace: $namespaces")
    assert(!namespaces.contains("toplevel_t"),
      s"a table root listed as a namespace: $namespaces")
    // TRUNCATE at a pinned version would execute against the live table
    // — same guard as writes and DELETE
    val root = s"$wh/db/trpin"
    SnapshotCatalog.append((1L to 3L).toDF("id").coalesce(1), root, "b0")
    SnapshotCatalog.append((4L to 6L).toDF("id").coalesce(1), root, "b1")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val pinned = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "trpin"),
      "1").asInstanceOf[graft.sources.GraftTable]
    val e = intercept[Exception] { pinned.truncateTable() }
    assert(e.getMessage.contains("pinned"), e.getMessage)
    assert(SnapshotCatalog.readSnapshot(spark, root).count() == 6L,
      "the guarded TRUNCATE mutated the table")
  }

  test("SQL maintenance verbs: DESCRIBE HISTORY rows, OPTIMIZE fires incrementally (clean large file untouched), VACUUM expires") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/maintsql"
    // one large-ish clean batch + small litter + a DV-landing delete
    SnapshotCatalog.append(
      (1L to 400L).map(i => (i, i * 2L)).toDF("id", "v").coalesce(1), root, "big")
    (0 until 5).foreach { b =>
      SnapshotCatalog.append(
        (401L + b * 10L to 410L + b * 10L).map(i => (i, i * 2L)).toDF("id", "v")
          .coalesce(1), root, s"small$b")
    }
    SnapshotCatalog.deleteWhere(spark, root, col("id") > 440L)
    val bigFile = SnapshotCatalog.manifestFiles(root, 1).head
    def md5(p: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      java.util.Base64.getEncoder.encodeToString(d.digest(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          new org.apache.hadoop.fs.Path(p).toUri.getPath))))
    }
    val bigMd5 = md5(bigFile)
    // DESCRIBE HISTORY: one row per commit, newest first
    val hist = spark.sql("DESCRIBE HISTORY graft.db.maintsql").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(hist.head._2 == "delete" && hist.length == 7 &&
      hist.last == ((1, "append")), s"history drifted: ${hist.toSeq}")
    // OPTIMIZE: fires (DVs + litter), INCREMENTAL — the clean large
    // file survives byte-identical, DVs clear, litter bin-packs
    val opt = spark.sql("OPTIMIZE graft.db.maintsql").collect().head
    assert(opt.getBoolean(0), "OPTIMIZE did not fire")
    val vNow = SnapshotCatalog.latestVersion(root)
    assert(SnapshotCatalog.manifestFiles(root, vNow).contains(bigFile) &&
      md5(bigFile) == bigMd5, "OPTIMIZE rewrote the clean large file")
    assert(SnapshotCatalog.dvFiles(root, vNow).isEmpty,
      "OPTIMIZE left deletion vectors in effect")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.maintsql")
      .head().getLong(0) == 440L, "OPTIMIZE changed content")
    // VACUUM RETAIN 0 HOURS: everything but the latest version expires
    val vac = spark.sql("VACUUM graft.db.maintsql RETAIN 0 HOURS")
      .collect().head
    assert(vac.getInt(0) > 0, "VACUUM expired nothing")
    assert(SnapshotCatalog.versions(root) == Seq(vNow),
      s"VACUUM left versions: ${SnapshotCatalog.versions(root)}")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.maintsql")
      .head().getLong(0) == 440L, "VACUUM damaged live content")
    // a non-graft name refuses; ordinary SQL still parses (delegation)
    val e = intercept[Exception] { spark.sql("OPTIMIZE not_a_graft_table") }
    assert(e.getMessage.contains("graft"), e.getMessage)
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
  }

  test("RESTORE TABLE TO VERSION AS OF: one metadata-only commit, DVs re-landed, undone versions still time-travel; OPTIMIZE ZORDER clusters") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/restoresql"
    SnapshotCatalog.append(
      (1L to 20L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1), root, "b0")
    SnapshotCatalog.deleteWhere(spark, root, col("id") > 15L)   // v2: DVs
    val vTarget = SnapshotCatalog.latestVersion(root)           // 2
    SnapshotCatalog.append((21L to 30L).toDF("id")
      .withColumn("v", col("id") * 10L).coalesce(1), root, "bad")
    spark.sql("UPDATE graft.db.restoresql SET v = 0 WHERE id <= 5")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.restoresql")
      .head().getLong(0) == 25L)
    val r = spark.sql(
      s"RESTORE TABLE graft.db.restoresql TO VERSION AS OF $vTarget")
      .collect().head
    assert(r.getInt(0) == vTarget && r.getInt(1) == vTarget + 3)
    // live content == version 2's (the DV-delete applied, the botched
    // append and update gone), with DVs re-landed
    val got = spark.sql("SELECT id, v FROM graft.db.restoresql ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == (1L to 15L).map(i => (i, i * 10L)),
      s"restore drifted: $got")
    // the undone versions still time-travel (history preserved)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft.db.restoresql VERSION AS OF ${vTarget + 1}")
      .head().getLong(0) == 25L,
      "restore destroyed the in-between versions")
    // restoring to a non-surviving version refuses
    val e = intercept[Exception] {
      spark.sql("RESTORE TABLE graft.db.restoresql TO VERSION AS OF 99")
    }
    assert(e.getMessage.contains("surviving"), e.getMessage)
    // OPTIMIZE ZORDER BY: the fired rewrite is a clustering one — the
    // restored DV-bearing file compacts sorted, stats come out tight
    val opt = spark.sql(
      "OPTIMIZE graft.db.restoresql ZORDER BY (id)").collect().head
    assert(opt.getBoolean(0), "OPTIMIZE ZORDER did not fire")
    assert(SnapshotCatalog.dvFiles(root,
      SnapshotCatalog.latestVersion(root)).isEmpty)
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.restoresql")
      .head().getLong(0) == 15L)
    // RESTORE TO TIMESTAMP AS OF: resolves the newest version at-or-
    // before the instant (here: now → the current latest), one commit
    val rts = spark.sql("RESTORE TABLE graft.db.restoresql TO TIMESTAMP " +
      s"AS OF '${new java.sql.Timestamp(System.currentTimeMillis() + 1000)}'")
      .collect().head
    assert(rts.getInt(1) == rts.getInt(0) + 1 ||
      rts.getInt(1) == SnapshotCatalog.latestVersion(root),
      s"timestamp restore drifted: $rts")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.restoresql")
      .head().getLong(0) == 15L, "timestamp restore changed content")
  }

  test("atomic CTAS: one version-1 commit; a failed CTAS leaves NO table; RTAS is one replace commit keeping history") {
    val wh = warehouse
    // CTAS through the staging catalog: schema + spec + data land as
    // ONE commit — no create-then-write window with an empty half-table
    spark.sql("CREATE TABLE graft.db.ctas1 AS " +
      "SELECT id, id * 2 AS v FROM range(10)")
    val root = s"$wh/db/ctas1"
    assert(SnapshotCatalog.versions(root) == Seq(1),
      s"CTAS was not one commit: ${SnapshotCatalog.versions(root)}")
    assert(spark.sql("SELECT sum(v) AS s FROM graft.db.ctas1")
      .head().getLong(0) == (0L until 10L).map(_ * 2).sum)
    // a CTAS whose query FAILS mid-write leaves no table behind
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.db.ctas_fail AS " +
        "SELECT raise_error('boom') AS x FROM range(10)")
    }
    assert(!SnapshotCatalog.isTable(s"$wh/db/ctas_fail"),
      "a failed CTAS left a committed half-table")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.ctas_fail").collect()
    }
    // partitioned CTAS records the spec in the same single commit
    spark.sql("CREATE TABLE graft.db.ctas2 PARTITIONED BY (p) AS " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS p FROM range(8)")
    assert(SnapshotCatalog.partitionSpecAt(s"$wh/db/ctas2", 1)
      .exists(_.fieldNames.sameElements(Array("p"))),
      "partitioned CTAS lost the spec")
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.db.ctas2 WHERE p = 'a'")
      .head().getLong(0) == 4L)
    // RTAS: ONE replace-shaped commit on the SAME log — prior versions
    // still time-travel (the non-staging fallback drops the table and
    // its history)
    spark.sql("REPLACE TABLE graft.db.ctas1 AS " +
      "SELECT id AS nid FROM range(3)")
    assert(SnapshotCatalog.versions(root) == Seq(1, 2) &&
      SnapshotCatalog.history(root).last._2 == "replace",
      "RTAS was not one replace commit on the existing log")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.ctas1")
      .head().getLong(0) == 3L)
    assert(spark.sql(
      "SELECT sum(v) AS s FROM graft.db.ctas1 VERSION AS OF 1")
      .head().getLong(0) == (0L until 10L).map(_ * 2).sum,
      "RTAS destroyed time travel to the pre-replace content")
    // CREATE OR REPLACE on a missing table creates
    spark.sql("CREATE OR REPLACE TABLE graft.db.ctas3 AS SELECT 1 AS one")
    assert(spark.sql("SELECT one FROM graft.db.ctas3").head().getInt(0) == 1)
  }

  test("CTAS/RTAS with constraint TBLPROPERTIES enforce on the staged rows themselves") {
    val wh = warehouse
    val root = s"$wh/db/ctascons"
    // a violating CTAS fails loudly and leaves NO table
    val eBad = intercept[Exception] {
      spark.sql("CREATE TABLE graft.db.ctascons " +
        "TBLPROPERTIES ('graft.constraints.xpos'='x > 0') " +
        "AS SELECT -1 AS x")
    }
    assert(eBad.getMessage.contains("CHECK constraint xpos") ||
      Option(eBad.getCause).exists(_.getMessage.contains("CHECK constraint xpos")),
      s"violating CTAS did not fail on its own constraint: ${eBad.getMessage}")
    assert(!SnapshotCatalog.isTable(root),
      "violating CTAS left a (half-)committed table behind")
    // a satisfying CTAS lands WITH the constraint in force for later writes
    spark.sql("CREATE TABLE graft.db.ctascons " +
      "TBLPROPERTIES ('graft.constraints.xpos'='x > 0') " +
      "AS SELECT 5 AS x")
    assert(spark.sql("SELECT x FROM graft.db.ctascons").head().getInt(0) == 5)
    val eIns = intercept[Exception] {
      spark.sql("INSERT INTO graft.db.ctascons VALUES (-2)")
    }
    assert(eIns.getMessage.contains("CHECK constraint xpos") ||
      Option(eIns.getCause).exists(_.getMessage.contains("CHECK constraint xpos")),
      s"constraint published by CTAS not enforced on the next INSERT: ${eIns.getMessage}")
    // RTAS: a NEW constraint in the replace's properties validates the
    // staged rows; the replaced table survives untouched on refusal
    val vBefore = SnapshotCatalog.latestVersion(root)
    val eRtas = intercept[Exception] {
      spark.sql("REPLACE TABLE graft.db.ctascons " +
        "TBLPROPERTIES ('graft.constraints.ypos'='y > 0') " +
        "AS SELECT -7 AS y")
    }
    assert(eRtas.getMessage.contains("CHECK constraint ypos") ||
      Option(eRtas.getCause).exists(_.getMessage.contains("CHECK constraint ypos")),
      s"violating RTAS landed: ${eRtas.getMessage}")
    assert(SnapshotCatalog.latestVersion(root) == vBefore &&
      spark.sql("SELECT x FROM graft.db.ctascons").head().getInt(0) == 5,
      "refused RTAS disturbed the existing table")
    // REPLACE drops a carried constraint whose column vanished from the
    // new schema (xpos references x; the new table only has y) — later
    // writes must not fail analysis on a ghost column
    spark.sql("REPLACE TABLE graft.db.ctascons " +
      "TBLPROPERTIES ('graft.constraints.ypos'='y > 0') " +
      "AS SELECT 7 AS y")
    val props = SnapshotCatalog.properties(root)
    assert(!props.contains("graft.constraints.xpos"),
      s"REPLACE carried a constraint on a dropped column: $props")
    assert(props.get("graft.constraints.ypos").contains("y > 0"))
    spark.sql("INSERT INTO graft.db.ctascons VALUES (3)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.ctascons")
      .head().getLong(0) == 2L)
    val eY = intercept[Exception] {
      spark.sql("INSERT INTO graft.db.ctascons VALUES (-3)")
    }
    assert(eY.getMessage.contains("CHECK constraint ypos") ||
      Option(eY.getCause).exists(_.getMessage.contains("CHECK constraint ypos")),
      s"RTAS-published constraint not enforced: ${eY.getMessage}")
  }

  test("RESTORE restores PROPERTIES with files/schema: dropped-column tombstones and late constraints do not outlive the restore") {
    val wh = warehouse
    val spark2 = spark
    import spark2.implicits._
    val root = s"$wh/db/restoreprops"
    SnapshotCatalog.append(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "v").coalesce(1),
      root, "b0")
    val vKeep = SnapshotCatalog.latestVersion(root)
    // post-vKeep metadata: DROP COLUMN v (tombstone) + a constraint
    spark.sql("ALTER TABLE graft.db.restoreprops DROP COLUMN v")
    spark.sql("ALTER TABLE graft.db.restoreprops ADD CONSTRAINT idpos CHECK (id > 0)")
    assert(SnapshotCatalog.properties(root).contains("graft.dropped.v"))
    // restore to the pre-drop version: schema serves v again AND the
    // tombstone is gone, so appending v does not refuse; the late
    // constraint no longer enforces
    SnapshotCatalog.restore(root, vKeep)
    val props = SnapshotCatalog.properties(root)
    assert(!props.contains("graft.dropped.v"),
      s"restore left the post-restore tombstone in force: $props")
    assert(!props.contains("graft.constraints.idpos"),
      s"restore kept a constraint added after the restored version: $props")
    SnapshotCatalog.append(
      Seq((3L, "c", 30L)).toDF("id", "k", "v").coalesce(1), root, "b1")
    val got = spark.sql("SELECT id, v FROM graft.db.restoreprops ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 30L)),
      s"restored schema+append drifted: $got")
  }

  test("catalog hygiene: listTables, tableExists, drop; writes to a pinned version refuse") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft.db.tmp1 (id BIGINT)")
    spark.sql("INSERT INTO graft.db.tmp1 VALUES (1)")
    val names = spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1)).toSet
    assert(names.contains("tmp1"), s"SHOW TABLES missed tmp1: $names")
    spark.sql("DROP TABLE graft.db.tmp1")
    assert(!SnapshotCatalog.isTable(s"$wh/db/tmp1"), "DROP TABLE left the root")
    val e = intercept[Exception] { spark.sql("SELECT * FROM graft.db.tmp1").collect() }
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }
}
