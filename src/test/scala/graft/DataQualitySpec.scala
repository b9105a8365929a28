package graft

import graft.operators.DataQuality
import org.apache.spark.sql.functions._

/** Planted-violation gates for the constraint report: exact counts per
  * check kind, NULL-predicate-counts-as-violation semantics, and the
  * one-scan fusion shape of the rule pass.
  */
class DataQualitySpec extends SparkTestBase {
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select("check_name", "n_checked", "n_violations")
      .as[(String, Long, Long)].collect()
      .map { case (n, c, v) => n -> ((c, v)) }.toMap

  test("rule violations count exactly, including NULL predicate results") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (2L, "ok"), (null, "ok"), (3L, "bad"), (-5L, null))
      .toDF("amount", "status")
    val rep = asMap(DataQuality.checkRules(df, Seq(
      "amount_complete" -> col("amount").isNotNull,
      "amount_positive" -> (col("amount") > 0),   // NULL amount -> violation
      "status_domain" -> col("status").isin("ok", "bad"))))
    assert(rep("amount_complete") == ((5L, 1L)))
    assert(rep("amount_positive") == ((5L, 2L)))  // -5 and the NULL
    assert(rep("status_domain") == ((5L, 1L)))    // the NULL status
  }

  test("uniqueness counts keys with collisions, not extra rows") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val rep = asMap(DataQuality.checkUnique(df, "k_unique", Seq("k")))
    assert(rep("k_unique") == ((3L, 2L)))  // 3 distinct keys, 2 collide
  }

  test("referential integrity counts orphans and skips NULL fks") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (9L, "orphan"), (9L, "orphan2"), (null, "skip"))
      .toDF("fk", "x")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val rep = asMap(DataQuality.checkReferential(child, parent, "fk_ri",
      "fk", "pk"))
    assert(rep("fk_ri") == ((4L, 2L)))  // NULL fk excluded from base
  }

  test("the rule pass is one aggregation over one scan, not one per rule") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    val plan = DataQuality.checkRules(df, Seq(
      "r1" -> col("a").isNotNull, "r2" -> (col("a") > 0),
      "r3" -> col("b").isNotNull)).queryExecution.executedPlan.toString
    // string match: collect() can't see through the AQE wrapper node
    val scans = "(LocalTableScan|Scan parquet|BatchScan)".r
      .findAllIn(plan).size
    assert(scans == 1, s"expected one fused scan, got $scans:\n$plan")
  }

  test("q_dq_checks reports zero violations on the generated testdata") {
    val rep = asMap(queries.PipelineQueries.qDqChecks(spark,
      "/root/testdata/sf0.001"))
    assert(rep.size == 6)
    rep.foreach { case (name, (checked, violations)) =>
      assert(checked > 0, s"$name checked nothing")
      assert(violations == 0L, s"$name found $violations on clean data")
    }
  }

  test("drift flags RATE regressions only — not count growth, not first runs") {
    // planted history for one check across four runs:
    //   run 1: 1/100          (baseline — no prior, never flagged)
    //   run 2: 4/100          (rate 4× worse  → regressed)
    //   run 3: 8/400          (MORE violations but rate halved → clean)
    //   run 4: 2/100 vs 8/400 (same 2% rate — not strictly worse → clean)
    val history = Seq(
      (1, "c", 100L, 1L), (2, "c", 100L, 4L),
      (3, "c", 400L, 8L), (4, "c", 100L, 2L),
      // independent check: its own lag chain, its own baseline row
      (1, "d", 50L, 0L), (2, "d", 50L, 1L))
      .toDF("run_id", "check_name", "n_checked", "n_violations")
    val out = DataQuality.drift(history)
      .select(col("check_name"), col("run_id"), col("regressed"),
        col("prev_violations"))
      .as[(String, Int, Int, Option[Long])].collect().toSet
    assert(out == Set(
      ("c", 1, 0, None), ("c", 2, 1, Some(1L)),
      ("c", 3, 0, Some(4L)), ("c", 4, 0, Some(8L)),
      ("d", 1, 0, None), ("d", 2, 1, Some(0L))))
  }

  test("checkRulesByRun equals checkRules applied per run, in one scan") {
    val df = Seq((1, 10, "a"), (1, -5, "b"), (2, 3, "c"), (2, 7, null))
      .toDF("run", "v", "s")
    val grouped = DataQuality.checkRulesByRun(df, col("run"),
      Seq("v_pos" -> (col("v") > 0), "s_set" -> col("s").isNotNull))
      .select(col("run_id"), col("check_name"), col("n_checked"),
        col("n_violations"))
      .as[(Int, String, Long, Long)].collect().toSet
    assert(grouped == Set(
      (1, "v_pos", 2L, 1L), (1, "s_set", 2L, 0L),
      (2, "v_pos", 2L, 0L), (2, "s_set", 2L, 1L)))
    val plan = DataQuality.checkRulesByRun(df, col("run"),
      Seq("v_pos" -> (col("v") > 0), "s_set" -> col("s").isNotNull))
      .queryExecution.executedPlan.toString
    val scans = "(LocalTableScan|Scan parquet|BatchScan)".r.findAllIn(plan).size
    assert(scans == 1, s"expected one fused scan, got $scans:\n$plan")
  }
}
