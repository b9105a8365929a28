package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) = // (user, second, type)
    rows.zipWithIndex.map { case ((u, sec, t), i) => (i.toLong, u, sec, t) }
      .toDF("event_id", "user_id", "sec", "event_type")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)"))
      .repartition(4)

  private def run(df: org.apache.spark.sql.DataFrame) =
    Funnel.conversion(df, "user_id", "ts", "event_id", "event_type",
      Seq("view", "click", "purchase"))
      .select($"step", $"n_users", $"sum_lead_us")
      .as[(String, Long, Long)].collect().toSeq

  test("steps must happen IN ORDER — out-of-order occurrences don't count") {
    val out = run(ev(
      // user 1: perfect journey view(10) → click(20) → purchase(30)
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE any view, then view — click must not count
      (2L, 10L, "click"), (2L, 20L, "view"),
      // user 3: purchase before click: view(10) → purchase(20) → click(30)
      // reaches click, but no purchase AFTER the qualified click
      (3L, 10L, "view"), (3L, 20L, "purchase"), (3L, 30L, "click")))
    assert(out == Seq(
      ("view", 3L, 0L),
      ("click", 2L, 30000000L),      // user 1: 10 s, user 3: 20 s after view
      ("purchase", 1L, 20000000L)))  // only user 1, 20 s after view
  }

  test("journey time measures FIRST qualifying event of each step") {
    val out = run(ev(
      // repeat events: first view at 10, a later view at 50 must not
      // shift the lead; first in-order click at 40 (the click at 5 is
      // pre-view and ignored)
      (1L, 5L, "click"), (1L, 10L, "view"), (1L, 40L, "click"),
      (1L, 50L, "view"), (1L, 60L, "click")))
    assert(out == Seq(
      ("view", 1L, 0L),
      ("click", 1L, 30000000L), // 40 − 10, not 60 − 10 and not 40 − 50
      ("purchase", 0L, 0L)))
  }

  test("empty funnel tail yields zero rows, not missing rows") {
    val out = run(ev((1L, 10L, "view")))
    assert(out == Seq(("view", 1L, 0L), ("click", 0L, 0L), ("purchase", 0L, 0L)))
  }

  test("plan shape: one hash shuffle on the user key before the windows, no self-join") {
    val df = Funnel.conversion(Tables.events(spark, "/root/testdata/sf0.001"),
      "user_id", "ts", "event_id", "event_type",
      Seq("view", "click", "purchase"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"funnel must not self-join:\n$plan")
    val hashExchanges = plan.linesIterator
      .filter(_.contains("hashpartitioning")).toSeq
    assert(hashExchanges.nonEmpty && hashExchanges.forall(_.contains("user_id")),
      s"every hash exchange must be keyed on user_id:\n$hashExchanges")
  }

  private def runAttrib(df: org.apache.spark.sql.DataFrame) =
    Funnel.attribution(df, "user_id", "ts", "event_id", "event_type",
      Seq("view", "click"), "purchase")
      .as[(String, Long, Long)].collect().toSeq

  test("attribution credits first and last preceding touch within the session") {
    val out = runAttrib(ev(
      // user 1, one session: view(10) → click(20) → purchase(30)
      // first touch view, last touch click
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2, one session: click only → both credits to click
      (2L, 10L, "click"), (2L, 15L, "purchase")))
    assert(out == Seq(
      ("click", 1L, 2L),   // last-touch for u1, first+last for u2
      ("view", 1L, 0L)))
  }

  test("attribution resets at session boundaries; orphan conversions land in (none)") {
    val out = runAttrib(ev(
      // user 1: view at 10, then >30 min of silence — the purchase at
      // 10+2000 s opens a NEW session with no touch before it
      (1L, 10L, "view"), (1L, 2010L, "purchase"),
      // user 2: purchase with no touch at all
      (2L, 10L, "purchase"),
      // user 3: same-session touch 100 s before purchase still counts
      (3L, 10L, "click"), (3L, 110L, "purchase")))
    assert(out == Seq(
      ("(none)", 2L, 2L),
      ("click", 1L, 1L)))
  }

  test("attribution looks strictly BACKWARD — touches after the conversion don't count") {
    val out = runAttrib(ev(
      (1L, 10L, "purchase"), (1L, 20L, "view"), (1L, 30L, "purchase")))
    // first purchase unattributed; second credits the view both ways
    assert(out == Seq(("(none)", 1L, 1L), ("view", 1L, 1L)))
  }

  test("attribution credit totals always equal the conversion count") {
    val df = Funnel.attribution(Tables.events(spark, "/root/testdata/sf0.001"),
      "user_id", "ts", "event_id", "event_type", Seq("view", "click"), "purchase")
    val (f, l) = df.agg(sum($"n_first_touch"), sum($"n_last_touch"))
      .as[(Long, Long)].head()
    val purchases = Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type" === "purchase").count()
    assert(f == purchases && l == purchases)
  }

  test("attribution plan: windows re-use the single user_id exchange, no self-join") {
    val df = Funnel.attribution(Tables.events(spark, "/root/testdata/sf0.001"),
      "user_id", "ts", "event_id", "event_type", Seq("view", "click"), "purchase")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"attribution must not self-join:\n$plan")
    // the (user, session) windows must NOT add a second event-sized
    // exchange: hash(user_id) already satisfies the wider clustering,
    // so the only exchanges are the user one + the tiny channel rollup
    val userExchanges = plan.linesIterator
      .filter(_.contains("hashpartitioning"))
      .filter(_.contains("user_id")).toSeq
    assert(userExchanges.size == 1,
      s"expected exactly one user_id exchange:\n$plan")
  }

  test("generated oracle SQL chains one CTE per step link and casts HUGEINT sums") {
    val sql = Funnel.conversionSql("events", "user_id", "ts", "event_id",
      "event_type", Seq("view", "click", "purchase"))
    assert(sql.contains("e1 AS") && sql.contains("e2 AS") && !sql.contains("e3 AS"))
    assert(sql.contains("ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"))
    assert(sql.contains("AS BIGINT"), "journey sums must cast back from HUGEINT")
  }
}
