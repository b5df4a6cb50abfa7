package graft.tools

/** Cross-PROCESS commit racer — the other half of the catalog's
  * optimistic-concurrency proof. SnapshotCatalogSpec's in-JVM race
  * exercises [[graft.sources.SnapshotCatalog.commitRetry]] across
  * threads; this main is spawned as a SECOND JVM by
  * SnapshotCatalogSpec's cross-process test so the race crosses a real
  * process boundary — the scenario two independent Spark JOBS create
  * when they commit to one table, where a JVM lock is worthless and
  * only the [[graft.sources.SnapshotCatalog.AtomicPublish]] protocol
  * (hard-link creation on local filesystems, exclusive rename on HDFS,
  * conditional PUT on object stores) keeps both writers safe.
  *
  * Args: `<tableRoot> <nCommits> <tag>`. Each commit appends one
  * synthetic file path derived from (tag, i); the parent asserts that
  * after both processes finish, the versions are consecutive and the
  * final resolution contains EVERY path from BOTH writers — a lost
  * update would drop one side's paths silently.
  *
  * No SparkSession: the catalog's metadata tier is pure Hadoop
  * FileSystem, which is exactly why a second JVM is cheap enough to
  * spawn inside a spec.
  */
object CommitRacer {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val n = args(1).toInt
    val tag = args(2)
    (1 to n).foreach { i =>
      graft.sources.SnapshotCatalog.commitRetry(root)(prev =>
        prev :+ s"$root/data/$tag/part-$i.parquet")
    }
    println(s"racer $tag: $n commits done")
  }
}
