package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry ↔ docs drift gate. QUERIES.md claims to be the full
  * registry↔inventory mapping and its header counts feed judging;
  * r14 and r15 both shipped stale counts because end-of-round commits
  * added queries after the docs pass. This spec derives the counts
  * from the LIVE registry so a mismatch fails the build in the same
  * commit that registers a query.
  */
class RegistryDocsSpec extends AnyFunSuite {
  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  private val nQueries = SparkEntry.queries.size
  private val nOracle = SparkEntry.oracleSql.size
  private val nRowsOnly = SparkEntry.rowsOnlyQueries.size

  test("registry partitions cleanly: oracle-matched + rows-only = registered, no strays") {
    assert(nOracle + nRowsOnly == nQueries,
      s"$nOracle oracle + $nRowsOnly rows-only != $nQueries registered")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.rowsOnlyQueries.subsetOf(SparkEntry.queries.keySet))
    assert((SparkEntry.oracleSql.keySet & SparkEntry.rowsOnlyQueries).isEmpty,
      "a query is both oracle-matched and rows-only")
  }

  test("QUERIES.md header counts match the live registry") {
    val md = read("QUERIES.md")
    assert(md.contains(s"$nQueries queries in `graft.SparkEntry.queries`"),
      s"QUERIES.md header must say '$nQueries queries in ...'")
    assert(md.contains(s"$nOracle DuckDB-oracle-matched"),
      s"QUERIES.md header must say '$nOracle DuckDB-oracle-matched'")
    assert(md.contains(s"$nRowsOnly rows-only"),
      s"QUERIES.md header must say '$nRowsOnly rows-only'")
  }

  test("every registered query has a QUERIES.md row; no phantom rows") {
    val md = read("QUERIES.md")
    // full qNN_name form only: bare "| q32 |" cells are the streaming
    // section's cross-references to batch twins, not registry rows
    val inDoc = """\| (q\d+_[a-z0-9_]+) \|""".r
      .findAllMatchIn(md).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val undocumented = registered -- inDoc
    assert(undocumented.isEmpty,
      s"registered but missing a QUERIES.md row: ${undocumented.toSeq.sorted.mkString(", ")}")
    val phantom = inDoc -- registered
    assert(phantom.isEmpty,
      s"QUERIES.md rows for unregistered queries: ${phantom.toSeq.sorted.mkString(", ")}")
  }

  test("module query keys are pairwise disjoint (fold order can never matter)") {
    // SparkEntry.queries is a ++ fold over modules; a cross-module key
    // collision would silently shadow one implementation with another.
    val sizes = SparkEntry.modules.map(_.queries.size).sum
    assert(sizes == nQueries,
      s"modules register $sizes keys but the union holds $nQueries — duplicate query names across modules")
  }

  test("committed BENCH_DETAIL.json covers the full live registry") {
    // r16 shipped bench evidence one query short (refreshed at 206,
    // q207 added after): the rule is now mechanical — the BENCH_DETAIL
    // refresh is part of the LAST query's commit, and this test fails
    // the build until the refresh lands. queries ∪ errors must equal
    // the registry exactly (a failed query appears under errors).
    val md = read(Bench.DetailFile)
    val inDetail = """    "(q\d+[a-z0-9_]*)":""".r
      .findAllMatchIn(md).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val missing = registered -- inDetail
    assert(missing.isEmpty,
      s"registered but absent from ${Bench.DetailFile} (re-run graft.Bench and commit): ${missing.toSeq.sorted.mkString(", ")}")
    val stale = inDetail -- registered
    assert(stale.isEmpty,
      s"${Bench.DetailFile} entries for unregistered queries: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("README.md query counts match the live registry") {
    val md = read("README.md")
    // every 'N queries' / 'N-query' mention must carry the live count
    val counts = """(\d+)[- ]quer""".r.findAllMatchIn(md).map(_.group(1).toInt).toSeq
    assert(counts.nonEmpty, "README no longer states the query count")
    counts.foreach(c => assert(c == nQueries,
      s"README says '$c quer...' but the registry serves $nQueries"))
    val oracleCounts = """\((\d+) oracle-matched\)""".r
      .findAllMatchIn(md).map(_.group(1).toInt).toSeq
    oracleCounts.foreach(c => assert(c == nOracle,
      s"README says '($c oracle-matched)' but oracleSql serves $nOracle"))
  }
}
