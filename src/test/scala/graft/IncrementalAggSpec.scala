package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** Pins the monoid law that makes incremental refresh correct:
  * merge(state(a), state(b)) == state(a ∪ b) for any split, any merge
  * order, including groups absent from some batches.
  */
class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private def rows = Seq(
    ("a", 5L), ("a", -3L), ("a", 12L),
    ("b", 7L), ("b", 7L),
    ("c", 0L)).toDF("k", "m")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "n", "sum_m", "min_m", "max_m")
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq

  test("merged split states equal the one-shot state, for every 2-way split") {
    val oneShot = canon(IncrementalAgg.state(rows, "k", "m"))
    // all 2^6 subsets as (batch, complement) splits
    val data = rows.as[(String, Long)].collect()
    (0 until 64).foreach { mask =>
      val (a, b) = data.zipWithIndex.partition { case (_, i) => (mask & (1 << i)) != 0 }
      val sa = IncrementalAgg.state(a.map(_._1).toSeq.toDF("k", "m"), "k", "m")
      val sb = IncrementalAgg.state(b.map(_._1).toSeq.toDF("k", "m"), "k", "m")
      assert(canon(IncrementalAgg.merge(Seq(sa, sb), "k")) == oneShot,
        s"split mask $mask broke the monoid law")
    }
  }

  test("incremental refresh: folding a delta into stored state equals recompute") {
    val base = rows.filter(col("m") > 0)
    val delta = rows.filter(col("m") <= 0)
    val stored = IncrementalAgg.state(base, "k", "m")
    val refreshed = IncrementalAgg.merge(
      Seq(stored, IncrementalAgg.state(delta, "k", "m")), "k")
    assert(canon(refreshed) == canon(IncrementalAgg.state(rows, "k", "m")))
    // the refresh read the delta rows + state only — group "c" arrives
    // exclusively via the delta and must appear
    assert(canon(refreshed).exists(_._1 == "c"))
  }
}
