package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkTestBase {
  import spark.implicits._

  test("semiJoin equals the plain left-semi join on real tables") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomPrune.semiJoin(li, urgent, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(pruned.nonEmpty && (pruned.toSeq == plain.toSeq))
  }

  test("an empty key side yields zero rows, matching the plain semi join, not a crash") {
    val big = (0L until 100L).map(i => (i, s"row$i")).toDF("k", "payload")
    val none = Seq.empty[Long].toDF("j")
    val out = BloomPrune.semiJoin(big, none, "k", "j")
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("k", "payload"), "schema must survive the short-circuit")
  }

  test("a deliberately tiny sketch floods false positives; the verify join kills them all") {
    val big = (0L until 4000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val keys = (0L until 4000L by 40).map(Tuple1(_)).toDF("j")  // 100 true keys
    // 64 bits for 100 keys -> the sketch is saturated, nearly everything
    // "might contain": the pre-filter alone must overshoot...
    val sketch = BloomPrune.bloomOf(keys, "j", expectedItems = 100, numBits = 64)
    val flooded = big.filter(BloomPrune.mightContain(sketch, col("k"))).count()
    assert(flooded > 100, s"expected false positives from a 64-bit sketch, got $flooded")
    // ...and no false negatives: every true key passes the sketch
    val trueHits = big.filter(col("k") % 40 === 0)
      .filter(BloomPrune.mightContain(sketch, col("k"))).count()
    assert(trueHits == 100, "bloom filters must never drop a true key")
    // the full operator is still exact
    val exact = BloomPrune.semiJoin(big, keys, "k", "j", expectedItems = 100)
      .select("k").as[Long].collect().sorted
    assert(exact.toSeq == (0L until 4000L by 40).toSeq)
  }

  test("randomized: semiJoin equals the reference semi join on 25 seeded key universes") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 25).foreach { _ =>
      val n = 200 + rnd.nextInt(800)
      val bigKeys = Seq.fill(n)(rnd.nextInt(500).toLong)
      val smallKeys = Seq.fill(1 + rnd.nextInt(60))(rnd.nextInt(500).toLong)
      val big = bigKeys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row_id")
      val small = smallKeys.map(Tuple1(_)).toDF("j")
      val got = BloomPrune.semiJoin(big, small, "k", "j")
        .select("row_id").as[Long].collect().sorted.toSeq
      val want = bigKeys.zipWithIndex
        .collect { case (k, i) if smallKeys.contains(k) => i.toLong }.sorted
      assert(got == want)
    }
  }

  test("the probe is Spark's native might_contain, not a UDF, and runs before the join") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val df = BloomPrune.semiJoin(li, urgent, "l_orderkey", "o_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing from plan:\n$plan")
    assert(!plan.contains("UDF"), "probe must stay inside codegen, not a Scala UDF")
    // the probe must sit in the big side's scan stage (a Filter below the
    // join), not above it — i.e. the join's left input already mentions it
    val joinIdx = plan.indexOf("LeftSemi")
    val probeIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "might_contain must appear below the semi join in the plan tree")
  }
}
