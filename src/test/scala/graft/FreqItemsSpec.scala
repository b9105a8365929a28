package graft

import graft.functions.FreqItemsAgg
import org.apache.spark.sql.functions._

/** Gates for the Misra–Gries frequent-items aggregate: exact below
  * capacity (the DuckDB-oracle regime of `sketch_heavy_hitters`),
  * ε·N-bounded with no false negatives in the purge regime, and
  * merge-across-shards correctness.
  */
class FreqItemsSpec extends SparkTestBase {
  import spark.implicits._

  test("exact regime: counts and membership equal exact GROUP BY below capacity") {
    val items = Seq.tabulate(3000)(i => s"tok${i % 40}")  // 40 distinct << 1024
    val sk = items.toDF("t")
      .agg(FreqItemsAgg.freqItems(col("t"), 1024).as("sk"))
    val got = sk.select(explode(FreqItemsAgg.itemsAbove(col("sk"), lit(0.02))))
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, n) => n >= math.ceil(0.02 * items.size) }
    assert(got == exact)
  }

  test("purge regime: planted Zipf heavy hitters all surface with eps*N-bounded counts") {
    // 64-entry map over ~46k distinct items: purging is constant;
    // eps ~ 3.5/64 ~ 5.5% of N
    val n = 200000
    val rnd = new scala.util.Random(7)
    // 5 hot items at ~6% each, the rest a long uniform tail
    val items = Seq.tabulate(n) { _ =>
      val r = rnd.nextDouble()
      if (r < 0.30) s"hot${(r * 100).toInt % 5}"
      else s"cold${rnd.nextInt(1 << 20)}"
    }
    val df = items.toDF("t").repartition(8)
    val sk = df.agg(FreqItemsAgg.freqItems(col("t"), 64).as("sk"))
    val got = sk.select(explode(FreqItemsAgg.itemsAbove(col("sk"), lit(0.04))))
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val eps = 3.5 / 64
    // no false negatives: every item truly >= 4% must appear
    exact.filter(_._2 >= 0.04 * n).keys.foreach { k =>
      assert(got.contains(k), s"missed true heavy hitter $k") }
    // estimate sits in the sketch's [lb, ub] band around the truth;
    // band width is bounded by eps*N (merged sketches can overshoot
    // true slightly, unlike a single-pass sketch)
    got.foreach { case (k, est) =>
      val t = exact.getOrElse(k, 0L)
      assert(math.abs(est - t) <= (eps * n).toLong,
        s"$k estimate $est strayed past eps*N=${(eps * n).toLong} from $t")
    }
  }

  test("sharded merge equals single-pass sketch in the exact regime") {
    val items = Seq.tabulate(5000)(i => s"w${i % 25}")
    val merged = items.toDF("t").repartition(16)
      .agg(FreqItemsAgg.freqItems(col("t"), 1024).as("sk"))
      .select(explode(FreqItemsAgg.itemsAbove(col("sk"), lit(0.0))))
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(merged == exact)
  }
}
