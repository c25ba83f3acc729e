package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stamps the README's catalog-count claims from code (VERDICT r16 #6:
  * the module map said "155-query catalog" while the catalog held 156
  * entries — doc drift no spec caught). Every "N-entry ... catalog"
  * number in the README must equal `SparkEntry.queries.size`, and the
  * old "N-query catalog" phrasing is banned so a future edit can't
  * reintroduce an unchecked count.
  */
class ReadmeContractSpec extends AnyFunSuite {

  private lazy val readme = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
    "UTF-8")

  test("every catalog-count claim in README matches SparkEntry.queries.size") {
    val n = SparkEntry.queries.size
    val claims = "(\\d+)-entry[a-z ]{0,20}catalog".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(claims.nonEmpty, "README no longer states the catalog size — " +
      "keep at least one stamped count so users know the surface area")
    val stale = claims.filter(_ != n)
    assert(stale.isEmpty,
      s"README claims catalog size(s) $stale but SparkEntry.queries has $n entries")
  }

  test("the unstamped 'N-query catalog' phrasing stays banned") {
    val hits = "\\d+-query catalog".r.findAllIn(readme).toSeq
    assert(hits.isEmpty,
      s"README uses unstamped catalog-count phrasing $hits — use 'N-entry ... catalog' " +
        "so the count stays under this spec's check")
  }

  test("queries and oracleSql stay in lockstep") {
    // every oracle names a real entry; entries without an oracle are the
    // documented weaker rows-only check, but an oracle for a DELETED
    // entry is dead weight the driver would silently skip
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries without a query: $orphans")
  }
}
