package graft

import graft.operators.SketchRollup
import org.apache.spark.sql.functions._

/** Accuracy and roll-up-identity gates for the mergeable HLL rollup.
  * Like the other sketch ops (`q_approx_distinct`, `text_cms`), there is
  * no SQL oracle — the gates compare against exact answers computed on
  * the same data.
  */
class SketchRollupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val events = Tables.events(spark, "/root/testdata/sf0.01")

  test("per-group estimates stay within the HLL bound of exact distincts") {
    val sk = SketchRollup.sketchBy(events, "event_type", "user_id")
    val est = SketchRollup.estimates(sk, "event_type")
      .as[(String, Long)].collect().toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("d"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (g, d) =>
      val e = est(g)
      assert(math.abs(e - d) <= math.max(3, (d * 0.05).toLong),
        s"$g: estimate $e vs exact $d drifted past 5%")
    }
  }

  test("union of per-group sketches matches the global sketch and the exact global count") {
    val sk = SketchRollup.sketchBy(events, "event_type", "user_id")
    val rolled = SketchRollup.unionEstimate(sk).as[Long].head()
    val direct = events.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .as[Long].head()
    val exact = events.select(countDistinct("user_id")).as[Long].head()
    assert(rolled == direct,
      s"roll-up identity broke: union-of-parts $rolled != whole $direct")
    assert(math.abs(rolled - exact) <= math.max(3, (exact * 0.05).toLong),
      s"rolled estimate $rolled vs exact $exact drifted past 5%")
  }

  test("subset rollup: filtering sketch rows answers a cohort query without raw data") {
    val sk = SketchRollup.sketchBy(events, "event_type", "user_id").cache()
    val types = sk.select("event_type").as[String].collect().sorted.take(2)
    val subset = SketchRollup.unionEstimate(
      sk.filter(col("event_type").isin(types: _*))).as[Long].head()
    val exact = events.filter(col("event_type").isin(types: _*))
      .select(countDistinct("user_id")).as[Long].head()
    assert(math.abs(subset - exact) <= math.max(3, (exact * 0.05).toLong),
      s"subset estimate $subset vs exact $exact drifted past 5%")
    sk.unpersist()
  }
}
