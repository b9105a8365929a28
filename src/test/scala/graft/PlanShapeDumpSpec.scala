package graft

import graft.tools.PlanShapeDump
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The committed registry-wide plan-shape artifact must regenerate
  * byte-identically — the physical-plan sibling of `LineageDumpSpec`:
  * a query that silently gains a shuffle or loses a broadcast still
  * hash-matches its oracle at test scale, but fails HERE with the exact
  * (query, counts) line that moved.
  */
class PlanShapeDumpSpec extends SparkTestBase {

  test("PLANSHAPE.tsv regenerates byte-identical across the whole registry", Slow) {
    val committed = new String(
      Files.readAllBytes(Paths.get("PLANSHAPE.tsv")), StandardCharsets.UTF_8)
    val fresh = PlanShapeDump.render(spark, "/root/testdata/sf0.001")
    if (fresh != committed) {
      val cl = committed.linesIterator.toVector
      val fl = fresh.linesIterator.toVector
      fail("PLANSHAPE.tsv drifted — regenerate with `runMain graft.tools.PlanShapeDump` " +
        "and REVIEW the diff (a shape change means a plan gained/lost a wide node):\n" +
        s"  committed-only: ${cl.diff(fl).take(10).mkString(" | ")}\n" +
        s"  fresh-only:     ${fl.diff(cl).take(10).mkString(" | ")}")
    }
  }
}
