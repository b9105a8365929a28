package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

/** Semantics gates for changelog application: delete-removes-key,
  * last-op-wins ordering, base-row survival, and the chunked-application
  * associativity that makes incremental (per-commit) compaction equal
  * one-shot compaction of the whole log.
  */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  // (key, ord, op, payload)
  private def logDf(rows: (Long, Long, String, String)*) =
    rows.toDF("k", "ord", "op", "v")

  private def stateDf(rows: (Long, Long, String)*) =
    rows.toDF("k", "ord", "v")

  private def applyLog(base: org.apache.spark.sql.DataFrame,
      log: org.apache.spark.sql.DataFrame) =
    Cdc.apply(base, log, "k", Seq("ord"), "op", Seq("v"))

  private def emptyBase = stateDf().limit(0)

  test("last op wins; a trailing delete removes the key") {
    val log = logDf(
      (1L, 1L, "U", "a1"), (1L, 2L, "U", "a2"),          // upsert twice
      (2L, 1L, "U", "b1"), (2L, 2L, "D", ""),            // deleted last
      (3L, 1L, "D", ""), (3L, 2L, "U", "c2"))            // resurrected
    val out = applyLog(emptyBase, log)
      .select("k", "ord", "v").as[(Long, Long, String)].collect().sorted
    assert(out.toSeq == Seq((1L, 2L, "a2"), (3L, 2L, "c2")))
  }

  test("untouched base rows survive; touched ones are replaced or deleted") {
    val base = stateDf((1L, 5L, "old1"), (2L, 5L, "old2"), (3L, 5L, "old3"))
    val log = logDf((2L, 6L, "U", "new2"), (3L, 6L, "D", ""))
    val out = applyLog(base, log)
      .select("k", "ord", "v").as[(Long, Long, String)].collect().sorted
    assert(out.toSeq == Seq((1L, 5L, "old1"), (2L, 6L, "new2")))
  }

  test("equal ordering keys break deterministically: changelog beats base, upsert beats delete") {
    // key 1: base row and a DELETE share ord 5 — the delete is the later
    // epoch and must win (the key disappears), not partition-order luck.
    // key 2: base row and an UPSERT share ord 5 — the upsert wins.
    // key 3: a delete and an upsert tie at ord 5 within the changelog —
    // the upsert wins the full-tie ("U" > "D" in the ord struct).
    val base = stateDf((1L, 5L, "old1"), (2L, 5L, "old2"))
    val log = logDf(
      (1L, 5L, "D", ""),
      (2L, 5L, "U", "new2"),
      (3L, 5L, "D", ""), (3L, 5L, "U", "c"))
    val out = applyLog(base, log)
      .select("k", "ord", "v").as[(Long, Long, String)].collect().sorted
    assert(out.toSeq == Seq((2L, 5L, "new2"), (3L, 5L, "c")))
  }

  test("chunked application equals one-shot application (associativity)") {
    // 40 keys, 6 ops each in commit order; chunk boundary mid-history.
    val ops = for {
      k <- 1L to 40L; i <- 1L to 6L
    } yield (k, i, if ((k + i) % 7 == 0) "D" else "U", s"v$k-$i")
    val (c1, c2) = ops.partition(_._2 <= 3)
    val whole = applyLog(emptyBase, logDf(ops: _*))
    val chunked = applyLog(applyLog(emptyBase, logDf(c1: _*)), logDf(c2: _*))
    assert(chunked.select("k", "ord", "v").as[(Long, Long, String)]
      .collect().sorted.toSeq ==
      whole.select("k", "ord", "v").as[(Long, Long, String)]
        .collect().sorted.toSeq)
    // sanity: some keys really end deleted
    assert(whole.count() < 40)
  }

  test("randomized logs: distributed apply equals an in-memory fold, chunked any way") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { round =>
      val nKeys = 30 + rnd.nextInt(40)
      val ops = (1 to 600).map { i =>
        (rnd.nextInt(nKeys).toLong, i.toLong,
          if (rnd.nextInt(4) == 0) "D" else "U", s"p$round-$i")
      }
      // oracle: in-memory fold in ord order, last op wins, D removes
      val want = ops.groupBy(_._1).flatMap { case (k, ks) =>
        val (_, ord, op, v) = ks.maxBy(_._2)
        if (op == "D") None else Some((k, ord, v))
      }.toSeq.sorted
      // distributed: split into 3 chunks along ord and apply in sequence
      val sorted = ops.sortBy(_._2)
      val chunks = sorted.grouped(200).toSeq
      val got = chunks.foldLeft(emptyBase) { (st, chunk) =>
        applyLog(st, logDf(chunk: _*))
      }.select("k", "ord", "v").as[(Long, Long, String)].collect().sorted.toSeq
      assert(got == want, s"round $round diverged")
    }
  }

  test("plan is one hash aggregation, no window sort") {
    val log = logDf((1L, 1L, "U", "a"))
    val plan = applyLog(emptyBase, log).queryExecution.executedPlan
    val txt = plan.toString
    assert(!txt.contains("WindowExec"), "changelog apply must not window-sort")
    assert(txt.contains("max_by") || txt.contains("MaxBy"),
      "expected the max_by aggregation path")
  }
}
