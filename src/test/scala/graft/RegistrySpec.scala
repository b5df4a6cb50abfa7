package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene — the driver contract's structural invariants.
  * These catch authoring mistakes (duplicate names silently shadowing a
  * query in the `queries` Map, an oracle keyed to a name that doesn't
  * exist) before the driver's gate does. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique (Map construction would silently drop dups)") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("every oracle belongs to a registered query") {
    val names = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- names
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("oracles reference only tables that exist in the test data") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // crude but effective: any FROM/JOIN identifier must be a known table
    // or a CTE defined in the same statement
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val ctes = "(?i)(?:WITH(?:\\s+RECURSIVE)?|,)\\s*(\\w+)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // \b keeps identifiers ENDING in from/join (valid_from, …) from
      // matching as keywords and mis-capturing the next word
      val refs = "(?i)\\b(?:FROM|JOIN)\\s+(\\w+)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // range(...) is DuckDB's builtin sequence TVF (src27 synthesizes
      // merge-source rows with it), not a data table
      val unknown = refs -- tables -- ctes --
        Set("read_parquet", "read_csv", "range")
      assert(unknown.isEmpty,
        s"$name references unknown relations: ${unknown.mkString(", ")}")
    }
  }

  test("non-streaming query names map 1:1 onto a SURVEY coverage row prefix") {
    val prefixes = Set("q", "d", "s", "t", "mm", "ml", "st", "absa", "csv", "gr")
    val bad = SparkEntry.all.map(_.name)
      .filterNot(n => prefixes.exists(p => n.startsWith(p)))
    assert(bad.isEmpty, s"unclassifiable query names: ${bad.mkString(", ")}")
  }
}
