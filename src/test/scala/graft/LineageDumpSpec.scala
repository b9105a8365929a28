package graft

import graft.tools.LineageDump
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The committed registry-wide lineage artifact must regenerate
  * byte-identically (round-8 verdict #7): any query whose output columns
  * silently change which source columns they derive from fails HERE with
  * a line diff, instead of shipping a semantics drift the per-query
  * oracles might still hash-match (e.g. a join key swapped for an equal
  * column, or a projection rewired to a lookalike).
  */
class LineageDumpSpec extends SparkTestBase {

  test("LINEAGE.tsv regenerates byte-identical across the whole registry", Slow) {
    val committed = new String(
      Files.readAllBytes(Paths.get("LINEAGE.tsv")), StandardCharsets.UTF_8)
    val fresh = LineageDump.render(spark, "/root/testdata/sf0.001")
    if (fresh != committed) {
      val cl = committed.linesIterator.toVector
      val fl = fresh.linesIterator.toVector
      val onlyCommitted = cl.diff(fl).take(10)
      val onlyFresh = fl.diff(cl).take(10)
      fail("LINEAGE.tsv drifted — regenerate with `runMain graft.tools.LineageDump` " +
        "and REVIEW the diff (a lineage change means a query's source columns moved):\n" +
        s"  committed-only: ${onlyCommitted.mkString(" | ")}\n" +
        s"  fresh-only:     ${onlyFresh.mkString(" | ")}")
    }
  }
}
