package graft

import graft.functions.ThetaSketchAgg
import org.apache.spark.sql.functions._

/** Gates for theta sketch set algebra: exact below k retained entries
  * (the regime the DuckDB oracle checks for `sketch_overlap`), bounded
  * relative error above it, and the union rollup identity.
  */
class ThetaSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("exact regime: intersection and difference equal exact set ops below k") {
    // two planted sets of 2000 longs (< k = 4096) overlapping in 500
    val rows = ((1L to 2000L).map(("a", _)) ++
      (1501L to 3500L).map(("b", _))).toDF("g", "v")
    val sk = rows.groupBy("g").agg(ThetaSketchAgg.thetaAgg(col("v")).as("sk"))
    val Seq(ska) = sk.filter(col("g") === "a").select("sk").as[Array[Byte]].collect().toSeq
    val Seq(skb) = sk.filter(col("g") === "b").select("sk").as[Array[Byte]].collect().toSeq
    val one = spark.range(1).select(lit(ska).as("ska"), lit(skb).as("skb"))
    val (inter, diff) = one.select(
      ThetaSketchAgg.intersectEstimate(col("ska"), col("skb")),
      ThetaSketchAgg.aNotBEstimate(col("ska"), col("skb")))
      .as[(Double, Double)].head()
    assert(inter == 500.0, s"exact-mode intersection drifted: $inter")
    assert(diff == 1500.0, s"exact-mode difference drifted: $diff")
  }

  test("estimation regime: 100k-element sets stay within 5x the 1/sqrt(k) bound") {
    // 100k >> k=4096: sampling active; rse ~ 1/sqrt(4096) ~ 1.6%
    val n = 100000L
    val overlap = 40000L
    val rows = ((1L to n).map(("a", _)) ++
      ((n - overlap + 1L) to (2 * n - overlap)).map(("b", _))).toDF("g", "v")
    val sk = rows.groupBy("g").agg(ThetaSketchAgg.thetaAgg(col("v")).as("sk"))
    val pair = sk.filter(col("g") === "a").select(col("sk").as("ska"))
      .crossJoin(sk.filter(col("g") === "b").select(col("sk").as("skb")))
    val inter = pair.select(
      ThetaSketchAgg.intersectEstimate(col("ska"), col("skb")))
      .as[Double].head()
    assert(math.abs(inter - overlap) <= overlap * 0.08,
      s"intersection estimate $inter vs exact $overlap drifted past 8%")
  }

  test("union rollup of per-group sketches matches exact distinct of the union") {
    val rows = ((1L to 1000L).map(("a", _)) ++ (501L to 1500L).map(("b", _)) ++
      (1L to 300L).map(("c", _))).toDF("g", "v")
    val sk = rows.groupBy("g").agg(ThetaSketchAgg.thetaAgg(col("v")).as("sk"))
    val est = sk.agg(ThetaSketchAgg.thetaUnion(col("sk")).as("u"))
      .select(ThetaSketchAgg.intersectEstimate(col("u"), col("u")))
      .as[Double].head()
    assert(est == 1500.0, s"union rollup drifted in exact mode: $est")
  }

  test("exact regime: jaccard estimate equals the true ratio, empty union gives 0") {
    val rows = ((1L to 2000L).map(("a", _)) ++
      (1501L to 3500L).map(("b", _))).toDF("g", "v")
    val sk = rows.groupBy("g").agg(ThetaSketchAgg.thetaAgg(col("v")).as("sk"))
    val pair = sk.filter(col("g") === "a").select(col("sk").as("ska"))
      .crossJoin(sk.filter(col("g") === "b").select(col("sk").as("skb")))
    val j = pair.select(
      ThetaSketchAgg.jaccardEstimate(col("ska"), col("skb")))
      .as[Double].head()
    assert(j == 500.0 / 3500.0, s"exact-mode jaccard drifted: $j")

    // empty-vs-empty: two sketches that saw no rows
    val es = Seq.empty[Long].toDF("v")
      .agg(ThetaSketchAgg.thetaAgg(col("v")).as("sk"))
      .select(col("sk").as("ska"), col("sk").as("skb"))
    val j0 = es.select(
      ThetaSketchAgg.jaccardEstimate(col("ska"), col("skb")))
      .as[Double].head()
    assert(j0 == 0.0, s"empty-union jaccard must be 0, got $j0")
  }

  test("sketch_overlap matches the exact pairwise overlap on events at sf0.001") {
    val got = queries.PipelineQueries.sketchOverlap(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long)].collect().toSeq
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_type", "user_id").distinct()
      .as[(String, Long)].collect()
    val byType = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      a <- byType.keys; b <- byType.keys if a < b
    } yield (a, b, (byType(a) & byType(b)).size.toLong,
        (byType(a) -- byType(b)).size.toLong)).toSeq.sorted
    assert(got.sorted == want)
  }
}
