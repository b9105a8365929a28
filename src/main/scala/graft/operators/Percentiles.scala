package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact grouped percentiles with BOUNDED memory at any scale.
  *
  * Spark's built-in exact `percentile` aggregate buffers a value→count
  * map per group in executor memory with no spill — fine for three
  * groups at sf0.1, an OOM risk over 100 TB of high-cardinality doubles.
  * This operator computes the SAME linear-interpolated percentile
  * (classic type-7: rank h = (n-1)·p, result = v⌊h⌋ + (v⌊h⌋₊₁ − v⌊h⌋)·(h−⌊h⌋))
  * by iterative range refinement instead of materializing groups:
  *
  *  1. one scan: per-group count/min/max;
  *  2. per needed rank, repeat: histogram the group's values inside the
  *     rank's current [lo, hi] range into B fixed-width buckets (one
  *     `groupBy` scan for ALL ranks together, map-side combined), then
  *     narrow the range to the bucket containing the rank — each pass
  *     shrinks the candidate range ~B×, so ⌈log_B n⌉ ≈ 3–4 passes at
  *     10^12 rows with B = 1024;
  *  3. when a range holds ≤ `collectThreshold` rows (or its width
  *     underflows to sub-ulp: ≤ ~B distinct doubles left), resolve the
  *     rank with one `groupBy(value).count` over the range — bounded by
  *     construction — and a sorted walk of the distinct values.
  *
  * Executor memory is O(B) per aggregation task; driver state is
  * O(#groups · #ranks · B) bucket counts per pass — percentile-result
  * sized, not data sized. No shuffle ever carries raw values: every scan
  * reduces to (group, rank, bucket) → count.
  *
  * The interpolation `vk + (vk1 − vk) * frac` with
  * `frac = h − floor(h)`, `h = (n−1)·p` is evaluated in exactly this
  * IEEE operation order so an oracle writing the same expression over
  * the same doubles reproduces it bit-for-bit (DuckDB's `quantile_cont`
  * uses a different lerp form that diverges in the last ulp — observed
  * flipping a `round(x, 2)` at a .xx5 boundary).
  */
object Percentiles {

  private final case class RankState(group: Any, rank: Long,
      var lo: Double, var hi: Double, var below: Long, var inRange: Long,
      var value: Option[Double])

  /** Exact percentiles of `valueCol` per `groupCol`: one output row per
    * group, one column per requested percentile, named by `ps`. Nulls in
    * `valueCol` are ignored (SQL aggregate semantics); a group with a
    * single value returns it for every p; requires 0 ≤ p ≤ 1.
    */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(Double, String)], buckets: Int = 1024,
      collectThreshold: Long = 16384L): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (p, _) => p >= 0.0 && p <= 1.0 },
      "percentiles must be in [0, 1]")
    val spark = df.sparkSession
    val base = df.select(col(groupCol).as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)

    val stats = base.groupBy("g")
      .agg(count("v").as("n"), min("v").as("mn"), max("v").as("mx"))
      .collect() // O(#groups): percentile-result sized

    // h/k/frac per (group, p); ranks k and k+1 refine independently so a
    // bimodal straddle (rank k in the first bucket, k+1 in the last)
    // cannot stall the shared range
    val perGroupP = stats.flatMap { r =>
      val (g, n) = (r.get(0), r.getLong(1))
      val (mn, mx) = (r.getDouble(2), r.getDouble(3))
      ps.map { case (p, name) =>
        val h = (n - 1).toDouble * p
        val k = math.floor(h).toLong
        val frac = h - math.floor(h)
        (g, name, n, mn, mx, k, frac)
      }
    }
    val ranksNeeded = perGroupP.flatMap { case (g, _, n, mn, mx, k, frac) =>
      val need = if (frac == 0.0 || k + 1 >= n) Seq(k) else Seq(k, k + 1)
      need.map(r => ((g, r), (mn, mx, n)))
    }.toMap
    var states = ranksNeeded.map { case ((g, r), (mn, mx, n)) =>
      val st = RankState(g, r, mn, mx, 0L, n, None)
      if (mn == mx || n == 1) st.value = Some(mn)
      st
    }.toSeq

    var iter = 0
    while (states.exists(s => s.value.isEmpty && s.inRange > collectThreshold &&
        (s.hi - s.lo) / buckets > 0.0) && iter < 100) {
      iter += 1
      val pending = states.filter(s => s.value.isEmpty &&
        s.inRange > collectThreshold && (s.hi - s.lo) / buckets > 0.0)
      val targets = pending.zipWithIndex.map { case (s, i) =>
        Row(s.group, i, s.lo, s.hi)
      }
      val tSchema = new org.apache.spark.sql.types.StructType()
        .add("g", base.schema("g").dataType).add("tid", "int")
        .add("lo", "double").add("hi", "double")
      val tDf = spark.createDataFrame(
        spark.sparkContext.parallelize(targets.toList, 1), tSchema)
      val b = buckets
      // broadcast the tiny target table; bucket index is computed inline
      // so the scan reduces straight to (tid, bucket) → count
      val counts = base.join(broadcast(tDf), Seq("g"))
        .filter(col("v") >= col("lo") && col("v") <= col("hi"))
        .select(col("tid"),
          least(lit(b - 1), floor((col("v") - col("lo")) /
            ((col("hi") - col("lo")) / b)).cast("int")).as("bucket"))
        .groupBy("tid", "bucket").count()
        .collect() // O(#pending · B)
        .groupBy(_.getInt(0))
      pending.zipWithIndex.foreach { case (s, i) =>
        val byBucket = counts.getOrElse(i, Array.empty[Row])
          .map(r => r.getInt(1) -> r.getLong(2)).toMap
        val width = (s.hi - s.lo) / b
        val rLocal = s.rank - s.below
        var cum = 0L
        var bk = -1
        var idx = 0
        while (bk < 0 && idx < b) {
          cum += byBucket.getOrElse(idx, 0L)
          if (cum > rLocal) bk = idx else idx += 1
        }
        if (bk < 0) {
          // numeric edge: every in-range row consumed without reaching the
          // rank (can only happen via float boundary slop) — resolve small
          s.inRange = math.min(s.inRange, collectThreshold)
        } else {
          val newLo = s.lo + bk * width
          val newHi = if (bk == b - 1) s.hi else s.lo + (bk + 1) * width
          val inBucket = byBucket.getOrElse(bk, 0L)
          s.below += cum - inBucket
          s.inRange = inBucket
          s.lo = newLo
          s.hi = newHi
          if (s.lo == s.hi) s.value = Some(s.lo)
        }
      }
    }

    // final resolution: distinct-value counts inside each remaining range
    // (≤ collectThreshold rows or ≤ ~B distinct doubles by construction)
    val unresolved = states.filter(_.value.isEmpty)
    if (unresolved.nonEmpty) {
      val targets = unresolved.zipWithIndex.map { case (s, i) =>
        Row(s.group, i, s.lo, s.hi)
      }
      val tSchema = new org.apache.spark.sql.types.StructType()
        .add("g", base.schema("g").dataType).add("tid", "int")
        .add("lo", "double").add("hi", "double")
      val tDf = spark.createDataFrame(
        spark.sparkContext.parallelize(targets.toList, 1), tSchema)
      val distincts = base.join(broadcast(tDf), Seq("g"))
        .filter(col("v") >= col("lo") && col("v") <= col("hi"))
        .groupBy("tid", "v").count()
        .collect()
        .groupBy(_.getInt(0))
      unresolved.zipWithIndex.foreach { case (s, i) =>
        val sorted = distincts.getOrElse(i, Array.empty[Row])
          .map(r => r.getDouble(1) -> r.getLong(2)).sortBy(_._1)
        var cum = s.below
        var v = Double.NaN
        val it = sorted.iterator
        while (v.isNaN && it.hasNext) {
          val (value, c) = it.next()
          cum += c
          if (cum > s.rank) v = value
        }
        s.value = Some(v)
      }
    }

    val byRank = states.map(s => (s.group, s.rank) -> s.value.get).toMap
    val outRows = perGroupP.groupBy(_._1).toSeq.map { case (g, entries) =>
      val cells = ps.map { case (_, name) =>
        val (_, _, n, _, _, k, frac) = entries.find(_._2 == name).get
        val vk = byRank((g, k))
        val vk1 = if (frac == 0.0 || k + 1 >= n) vk else byRank((g, k + 1))
        vk + (vk1 - vk) * frac // EXACT oracle arithmetic — do not reorder
      }
      Row.fromSeq(g +: cells)
    }
    val outSchema = ps.foldLeft(new org.apache.spark.sql.types.StructType()
        .add("g", base.schema("g").dataType)) { case (sch, (_, name)) =>
      sch.add(name, "double")
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(outRows.toList, 1), outSchema)
      .withColumnRenamed("g", groupCol)
  }
}
