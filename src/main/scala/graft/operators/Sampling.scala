package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * `Dataset.sample`/`sampleBy` are seeded per PARTITION INDEX, so the
  * selected rows change with partitioning (cluster size, AQE coalescing) —
  * unacceptable for reproducible train/val splits. These operators derive
  * the decision from a content hash instead: stable across partitioning,
  * reruns, engines (md5 is universal), and appends (a document keeps its
  * split forever, the property dataset versioning needs).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id's MD5 (first 8 hex chars). */
  private def hashBucket(idCol: Column, buckets: Int): Column =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Adds a `split` column: "train" for trainPct% of rows, else "val". */
  def withSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(idCol), 100) < trainPct, "train").otherwise("val"))

  /** Deterministic pct% sample (keep-if-bucket-below). */
  def sampled(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < pct)

  /** Deterministic global training shuffle, sharded: every row gets a
    * `shard` in [0, nShards) (content-hash bucket of its id) and a `pos` —
    * its rank within the shard under (md5(id), id) order. This is the
    * layout training jobs actually consume — N output files, each
    * internally in a fixed pseudo-random order — and the scalable way to
    * "shuffle 100 TB": there is NO global sort / single-partition
    * row_number; the ranking is a hash-partitioned window, so the work is
    * nShards independent sorts (raise nShards to O(cluster cores) and
    * per-shard cost stays flat — the TeraSort shape). Same md5 contract as
    * [[withSplit]]/[[sampled]]: stable across partitioning, reruns, and
    * engines, and a doc keeps its (shard, pos-order) forever under
    * appends-with-new-ids.
    */
  def shardedShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_mdkey"), col(idCol))
    df.withColumn("_mdkey", md5(col(idCol).cast("string")))
      .withColumn("shard", hashBucket(col(idCol), nShards))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_mdkey")
  }

  /** Per-stratum QUOTA cap: keep at most `cap` rows per stratum, chosen
    * by (md5(id), id) order — the "max N documents per domain/host" rule
    * every crawl-derived corpus applies (a quota, not a rate: a 10M-page
    * host and a 100-page host both land at ≤ cap). Hash order makes the
    * kept set stable across partitioning/reruns and unbiased by id
    * assignment order; ranking is a hash-partitioned window, so the work
    * is one sort per stratum. Strata with pathological row counts at
    * 100 TB (one host = billions of rows) should pre-thin with
    * [[sampled]] before ranking — noted rather than built in, because
    * pre-thinning changes the kept SET and the quota contract is exact.
    */
  def cappedPerStratum(df: DataFrame, idCol: String, strataCol: String,
      cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("_mdkey"), col(idCol))
    df.withColumn("_mdkey", md5(col(idCol).cast("string")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_mdkey", "_rn")
  }

  /** Weight-proportional systematic sample, fully integer-exact: lay the
    * rows out on a number line by cumulative integer weight (ordered by
    * id) and keep every row whose weight interval covers a multiple of
    * `stride = total/k` — the classic PPS (probability-proportional-to-
    * size) systematic design, deterministic end to end because weights
    * are integers and the "random" points are the stride grid. Returns
    * ~k rows (heavy rows covering several grid points appear once).
    *
    * The prefix sum is TWO-LEVEL, never a global single-partition
    * window: ids are range-bucketed into `nBuckets` (order-preserving
    * integer arithmetic on the id span), within-bucket cumsums run as a
    * bucket-partitioned window (parallel), and the bucket base offsets
    * come from one window over `nBuckets` rows — driver-scale. Raise
    * `nBuckets` to O(cluster cores) at 100 TB and per-bucket sort cost
    * stays flat; this is the same shape [[shardedShuffle]] uses, applied
    * to a prefix sum.
    */
  def systematicWeighted(df: DataFrame, idCol: String, weightCol: String,
      k: Int, nBuckets: Int = 32): DataFrame = {
    val id = col(idCol)
    val stats = df.agg(min(id).as("_lo"), max(id).as("_hi"),
      sum(col(weightCol)).as("_total"))
    // order-preserving range bucket: (id - lo) * nBuckets DIV (span + 1)
    val bucketed = df.select(id, col(weightCol).as("_wt"))
      .join(broadcast(stats))
      .withColumn("_bkt",
        expr(s"CAST((${idCol} - _lo) * $nBuckets DIV (_hi - _lo + 1) AS BIGINT)"))
    val baseOffsets = bucketed.groupBy(col("_bkt"))
      .agg(sum(col("_wt")).as("_bsum"))
      .withColumn("_base",
        coalesce(sum(col("_bsum")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_bkt")).rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("_bkt"), col("_base"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_bkt")).orderBy(id)
    bucketed
      .join(broadcast(baseOffsets), "_bkt")
      .withColumn("_cum", col("_base") + sum(col("_wt")).over(wIn))
      .withColumn("_stride", expr(s"GREATEST(_total DIV $k, 1)"))
      .filter(expr("_cum DIV _stride") > expr("(_cum - _wt) DIV _stride"))
      .select(id, col("_wt").as("weight"))
      .orderBy(id)
  }

  /** Deterministic STRATIFIED sample: a per-stratum keep percentage
    * (downsample over-represented strata, keep the tail intact — the
    * standard rebalancing move for training corpora), decided by the same
    * content-hash bucket as [[sampled]], so membership is stable across
    * partitioning, reruns, and appends, unlike `Dataset.sampleBy`'s
    * partition-seeded draw. Pure narrow filter — no shuffle at any scale.
    */
  def stratifiedSampled(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (stratum, p)) =>
      when(col(strataCol) === stratum, p).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 100) < pct)
  }

  /** Temperature-scaled resampling: rebalance group mass (language,
    * domain, source) toward kept_g ∝ n_g^alpha, alpha ∈ (0, 1] — the
    * standard multilingual-corpus smoothing (alpha ≈ 0.3–0.7 in the
    * published multilingual-LM recipes) that lifts low-resource groups'
    * SHARE without ever upsampling rows. DOWNSAMPLE-ONLY by
    * construction: each group keeps rate_g = (n_min / n_g)^(1−alpha),
    * so the smallest group keeps everything (rate 1) and
    * kept_g = n_g · rate_g = n_min^(1−alpha) · n_g^alpha. Unlike
    * [[stratifiedSampled]], the rates are not caller-supplied constants
    * — they are DERIVED from the observed group sizes, so the operator
    * is one groupBy away from self-tuning on any corpus.
    *
    * Keep decision: the same md5-of-id uniform as [[sampled]] (here as
    * the exact binary fraction first-8-hex / 2^32), so for a FIXED
    * corpus membership is stable across partitioning, reruns, and
    * engines. The rates themselves are corpus-composition-dependent by
    * design — appending data moves every group's rate, which is the
    * semantics a share-rebalancer must have (callers wanting append-
    * stable membership freeze the rates from a reference snapshot and
    * use [[stratifiedSampled]]).
    *
    * Determinism across engines: alpha = 0.5 computes the rate as
    * sqrt(n_min / n_g) — long→double casts, one IEEE divide, one IEEE
    * sqrt, all correctly-rounded and bit-identical in any IEEE-754
    * engine (the registered oracle replays it in DuckDB exactly). Other
    * alphas go through pow(), which libm does NOT guarantee correctly
    * rounded — still deterministic within one JVM, but not the
    * cross-engine contract.
    *
    * Scale shape: one group-cardinality aggregation (map-side combined)
    * + a 1-row global min crossJoined into the group-sized rate relation
    * (the documented bounded-BNLJ pattern) + one broadcast hash join of
    * kilobyte rates into a narrow filter scan. The corpus itself is
    * never shuffled — at 100 TB this costs one pass.
    */
  def temperatureResample(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_group"))
    val nmin = counts.agg(min(col("n_group")).as("_nmin"))
    val ratio = col("_nmin").cast("double") / col("n_group").cast("double")
    val rates = counts.crossJoin(broadcast(nmin))
      .withColumn("rate",
        if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha))
      .select(col(groupCol), col("n_group"), col("rate"))
    // exact binary fraction in [0,1): 8 hex chars -> long < 2^32, both
    // exactly representable as double, so the divide is exact and the
    // `< rate` compare can never straddle an engine-specific rounding
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    df.join(broadcast(rates), groupCol)
      .filter(u < col("rate"))
  }

  /** UniMax token-budget allocation (Chung et al. 2023): split a total
    * training-token budget across groups (languages/domains) as UNIFORMLY
    * as possible, subject to a per-group repetition ceiling of
    * `maxEpochs` passes over its `n_tokens` unique tokens — the published
    * successor to temperature sampling ([[temperatureResample]]) that
    * removes the alpha knob: low-resource groups are capped at
    * cap_g = n_g · maxEpochs, and whatever budget their caps free up is
    * re-spread uniformly over the rest (a classic waterfill).
    *
    * The waterfill has a closed form that makes the per-group decision
    * ALL-INTEGER: sort groups ascending by cap, let csum_i include row i
    * and L be the group count; group i is capped iff
    * cap_i · (L − i) ≤ B − csum_i (equivalent to cap_i ≤ fair share at
    * its turn, and self-consistent for every row because caps ascend —
    * once one group goes uncapped the fair share is constant and all
    * larger caps stay uncapped). Every uncapped group then receives the
    * SAME allocation (B − Σ capped caps) / (L − k), the one IEEE division
    * in the operator — both operands exact longs, so the double is
    * correctly rounded and bit-identical in any IEEE-754 engine, which is
    * what lets the registered oracle replay the whole allocation in
    * DuckDB hash-exactly. `epochs` = alloc / n_g is a second correctly-
    * rounded division; for capped rows it returns maxEpochs EXACTLY
    * (true quotient of n·c / n is representable).
    *
    * `budgetPerTotal` sets B = budgetPerTotal × Σ n_g — budgets are
    * naturally stated as corpus multiples ("train for ~3 epochs worth"),
    * and the integer multiple keeps B exact. Callers with an absolute
    * budget pass their own 1-row relation through the same shape.
    *
    * Scale shape: one corpus scan into a map-side-combined group-sum;
    * everything downstream (the ascending-cap window, the two 1-row
    * broadcast crossJoins for budget and capped-mass) runs over the
    * GROUP-scale relation — kilobytes for any real language/domain
    * inventory, so the single-partition window is a driver-sized sort,
    * the same vocabulary-scale-window discipline as `text_vocab`. At
    * 100 TB this operator costs exactly one pass over the corpus.
    */
  def unimaxAllocation(df: DataFrame, groupCol: String, tokensCol: String,
      maxEpochs: Int, budgetPerTotal: Int): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1: $maxEpochs")
    require(budgetPerTotal >= 1, s"budgetPerTotal must be >= 1: $budgetPerTotal")
    val g = df.groupBy(col(groupCol))
      .agg(sum(col(tokensCol)).cast("long").as("n_tokens"))
    val totals = g.agg(
      (sum(col("n_tokens")) * lit(budgetPerTotal.toLong)).cast("long")
        .as("_budget"),
      count(lit(1)).as("_nl"))
    val byCap = org.apache.spark.sql.expressions.Window
      .orderBy(col("cap"), col(groupCol))
    val ranked = g.withColumn("cap", col("n_tokens") * lit(maxEpochs.toLong))
      .crossJoin(broadcast(totals))
      .withColumn("_csum", sum(col("cap")).over(
        byCap.rowsBetween(Long.MinValue, 0)))
      .withColumn("_i", row_number().over(byCap).cast("long"))
      .withColumn("capped",
        col("cap") * (col("_nl") - col("_i")) <= col("_budget") - col("_csum"))
    val cappedMass = ranked.agg(
      coalesce(sum(when(col("capped"), col("cap"))), lit(0L)).as("_capsum"),
      coalesce(sum(when(col("capped"), lit(1L))), lit(0L)).as("_k"))
    val alloc = when(col("capped"), col("cap").cast("double"))
      .otherwise((col("_budget") - col("_capsum")).cast("double") /
        (col("_nl") - col("_k")).cast("double"))
    ranked.crossJoin(broadcast(cappedMass))
      .withColumn("alloc_tokens", alloc)
      .withColumn("epochs", col("alloc_tokens") / col("n_tokens").cast("double"))
      .select(col(groupCol), col("n_tokens"), col("cap"), col("capped"),
        col("alloc_tokens"), col("epochs"))
  }

  /** Realize a [[unimaxAllocation]] as a per-document REPETITION PLAN —
    * the table a dataloader actually consumes: every doc gets
    * `n_copies` = ⌊e⌋ + Bernoulli(e − ⌊e⌋) under its group's epoch
    * allocation e, so each group's expected realized token mass equals
    * its allocation exactly while every decision stays row-local. The
    * Bernoulli draw is the same md5-of-id exact binary fraction as
    * [[temperatureResample]] — membership is stable across
    * partitioning, reruns, and engines, and the oracle replays every
    * copy count bit-exactly (e is a correctly-rounded IEEE double on
    * both engines; ⌊e⌋ and the one subtract e − ⌊e⌋ are exact; the
    * compare against the exact fraction cannot straddle rounding).
    * Capped groups get exactly `maxEpochs` copies per doc (their e is
    * integral). Docs with n_copies = 0 are KEPT in the output — the
    * plan doubles as the drop inventory.
    *
    * Scale shape: [[unimaxAllocation]]'s one corpus pass + group-scale
    * waterfill, then ONE broadcast of the kilobyte (group, epochs)
    * relation into a narrow second scan. No corpus shuffle, no row
    * explosion (copies are a count column, not materialized rows).
    */
  def unimaxRealize(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, maxEpochs: Int, budgetPerTotal: Int): DataFrame = {
    val alloc = unimaxAllocation(df, groupCol, tokensCol, maxEpochs,
      budgetPerTotal).select(col(groupCol), col("epochs"))
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    df.join(broadcast(alloc), groupCol)
      .withColumn("n_copies",
        (floor(col("epochs")) +
          when(u < col("epochs") - floor(col("epochs")), 1L).otherwise(0L))
          .cast("long"))
      .select(col(idCol), col(groupCol), col(tokensCol), col("n_copies"))
  }
}
