package graft

import graft.operators.Percentiles
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkTestBase {
  import spark.implicits._

  test("hand case: type-7 interpolation on a known tiny group") {
    // group a: sorted [1, 2, 3, 10]; h(.5) = 1.5 -> 2 + (3-2)*0.5 = 2.5
    //          h(.9) = 2.7 -> 3 + (10-3)*0.7 = 7.9 (exact in doubles? 0.7
    //          is not exact — assert the same expression instead)
    val df = Seq(("a", 3.0), ("a", 1.0), ("a", 10.0), ("a", 2.0), ("b", 5.0))
      .toDF("g", "v")
    val out = Percentiles.exact(df, "g", "v", Seq(0.5 -> "p50", 0.9 -> "p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a")._1 == 2.5)
    val h = 3.0 * 0.9
    val frac = h - math.floor(h)
    assert(out("a")._2 == 3.0 + (10.0 - 3.0) * frac)
    assert(out("b") == ((5.0, 5.0)), "single-row group returns its value")
  }

  test("frac == 0 ranks and p = 0/1 extremes hit exact order statistics") {
    // 5 values: h(.5) = 2.0 exactly -> v[2], h(0) = v[0], h(1) = v[4]
    val df = (1 to 5).map(i => ("g", i * 1.0)).toDF("g", "v")
    val out = Percentiles.exact(df, "g", "v",
      Seq(0.0 -> "p0", 0.5 -> "p50", 1.0 -> "p100")).head()
    assert((out.getDouble(1), out.getDouble(2), out.getDouble(3)) == ((1.0, 3.0, 5.0)))
  }

  test("heavy duplicates (sub-ulp range stall path) still resolve the rank") {
    // 10k copies of 7.0 below, 10k of 9.0 above: median straddles the two
    // plateaus; tiny buckets force the distinct-walk resolution
    val df = ((1 to 10000).map(_ => 7.0) ++ (1 to 10000).map(_ => 9.0))
      .map(("g", _)).toDF("g", "v")
    val out = Percentiles.exact(df, "g", "v", Seq(0.5 -> "p50"),
      buckets = 4, collectThreshold = 16).head()
    // h = 19999*0.5 = 9999.5 -> v[9999]=7, v[10000]=9 -> 7 + 2*0.5 = 8
    assert(out.getDouble(1) == 8.0)
  }

  test("exactMulti fuses columns without changing any value") {
    val df = Seq(("a", 3.0, 30.0), ("a", 1.0, 10.0), ("a", 10.0, 100.0),
      ("a", 2.0, 20.0), ("b", 5.0, 50.0)).toDF("g", "x", "y")
    val fused = Percentiles.exactMulti(df, "g", Seq(
        "x" -> Seq(0.5 -> "x50", 0.9 -> "x90"), "y" -> Seq(0.5 -> "y50")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val x = Percentiles.exact(df, "g", "x", Seq(0.5 -> "x50", 0.9 -> "x90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val y = Percentiles.exact(df, "g", "y", Seq(0.5 -> "y50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    fused.foreach { case (g, (x50, x90, y50)) =>
      assert((x50, x90) == x(g) && y50 == y(g), s"fusion changed $g")
    }
  }

  test("ranksCore matches a sort-based oracle, incl. duplicate plateaus and the fast path") {
    // values with heavy duplicates; ranks = the q_group_percentile family
    val vals = Seq(5.0, 1.0, 3.0, 3.0, 3.0, 9.0, 7.0, 1.0, 3.0, 5.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val sorted = vals.sorted
    def want(r1: Long) = sorted((r1 - 1).toInt)
    for (thr <- Seq(2L, 16384L)) { // tiny thr forces refinement; big takes fast path
      val rs = Percentiles.ranksCore(df, "g", "v",
        n => Seq("p25" -> (n + 3) / 4, "med" -> (n + 1) / 2,
          "p75" -> (n * 3 + 3) / 4), buckets = 4, collectThreshold = thr)
      assert(rs.size == 1 && rs.head.n == 10)
      val got = rs.head.values
      val n = 10L
      assert(got("p25") == want((n + 3) / 4), s"thr=$thr p25")
      assert(got("med") == want((n + 1) / 2), s"thr=$thr med")
      assert(got("p75") == want((n * 3 + 3) / 4), s"thr=$thr p75")
    }
  }

  test("ranksCoreGivenStats (the MAD stage-2 shape) matches recomputed stats") {
    val vals = Seq(2.0, 4.0, 4.0, 6.0, 10.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val med = 4.0
    val dev = df.withColumn("_d", abs($"v" - med))
    val given = Seq(Percentiles.GroupStats("g", 5L, 0.0,
      math.max(10.0 - med, med - 2.0), 0L))
    val got = Percentiles.ranksCoreGivenStats(dev, "g", "_d", given,
      n => Seq("mad" -> (n + 1) / 2), buckets = 4, collectThreshold = 2)
    // devs sorted: [0, 0, 2, 2, 6] -> rank 3 (1-based) = 2.0
    assert(got.head.values("mad") == 2.0)
  }

  test("agrees with Spark's built-in exact percentile on lineitem at sf0.01") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val builtin = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val scalable = Percentiles.exact(li, "l_returnflag", "l_extendedprice",
      Seq(0.5 -> "p50", 0.99 -> "p99"), buckets = 64, collectThreshold = 256)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(scalable.keySet == builtin.keySet)
    // same v[k]/v[k+1] selection; interpolation may differ in the last ulp
    scalable.foreach { case (g, (p50, p99)) =>
      assert(math.abs(p50 - builtin(g)._1) <= 1e-9 * math.abs(p50), s"p50 $g")
      assert(math.abs(p99 - builtin(g)._2) <= 1e-9 * math.abs(p99), s"p99 $g")
    }
  }
}
