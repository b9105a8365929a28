package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis: how many users progress through a
  * sequence of event types IN ORDER (view → click → purchase), and how
  * long the journey to each step takes.
  *
  * Sequencing semantics: a row qualifies for step i when some row that
  * QUALIFIED for step i−1 strictly precedes it in the user's
  * (time, id) order. That is the standard funnel contract — later steps
  * must happen after the earlier ones, unordered occurrences don't
  * count — and it is exactly expressible as a chain of
  * `min(qualifying time) OVER (… ROWS UNBOUNDED PRECEDING TO 1
  * PRECEDING)` windows, one per step.
  *
  * Scale shape: ONE hash shuffle on the user key; the per-step window
  * passes share that partitioning and sort (Catalyst stacks the Window
  * operators without re-exchanging), the per-user reduction is a
  * map-side-combined groupBy on the same key, and the final per-step
  * explode acts on a single global-agg row. No self-joins — the naive
  * funnel (join events to events per consecutive step pair) shuffles
  * the event table `steps−1` times and skew-bombs on hot users; this
  * shape scans it once.
  *
  * Numeric contract: all times are integer microseconds
  * (`unix_micros` / DuckDB `epoch_us`), so counts and journey-time sums
  * are exact BIGINTs and the generated oracle hash-matches bit for bit.
  */
object Funnel {

  /** Per-step conversion counts + total journey time.
    *
    * Output: one row per step — `step_idx` (0-based BIGINT), `step`
    * (the event type), `n_users` (users whose journey reached this
    * step in order), `sum_lead_us` (total µs from each such user's
    * FIRST step-0 qualifying event to their first step-i qualifying
    * event; 0 for step 0 by construction).
    */
  def conversion(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val us = unix_micros(col(tsCol))
    val wPrior = Window.partitionBy(col(userCol)).orderBy(us, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // chain of strictly-preceding first-qualifying-time columns;
    // _qb_i = min time of a step-i-QUALIFIED row before this row
    val flagged = steps.indices.init.foldLeft(events) { (df, i) =>
      val qualifies =
        if (i == 0) col(typeCol) === steps(0)
        else col(typeCol) === steps(i) && col(s"_qb_${i - 1}").isNotNull
      df.withColumn(s"_qb_$i", min(when(qualifies, us)).over(wPrior))
    }
    // per-user first qualifying time for every step
    val perUser = flagged.groupBy(col(userCol)).agg(
      min(when(col(typeCol) === steps(0), us)).as("_first_0"),
      steps.indices.tail.map { i =>
        min(when(col(typeCol) === steps(i) && col(s"_qb_${i - 1}").isNotNull,
          us)).as(s"_first_$i")
      }: _*)
    // one global-agg row holding all per-step aggregates, exploded into
    // the per-step result rows (the explode touches ONE row)
    val aggs = steps.indices.flatMap { i =>
      Seq(count(col(s"_first_$i")).as(s"_n_$i"),
        coalesce(sum(when(col(s"_first_$i").isNotNull,
          col(s"_first_$i") - col("_first_0"))), lit(0L)).as(s"_t_$i"))
    }
    val g = perUser.agg(aggs.head, aggs.tail: _*)
    g.select(explode(array(steps.indices.map { i =>
        struct(lit(i.toLong).as("step_idx"), lit(steps(i)).as("step"),
          col(s"_n_$i").as("n_users"), col(s"_t_$i").as("sum_lead_us"))
      }: _*)).as("_e"))
      .select(col("_e.step_idx"), col("_e.step"), col("_e.n_users"),
        col("_e.sum_lead_us"))
      .orderBy(col("step_idx"))
  }

  /** Matching ANSI SQL, generated from the same step list. Window-over-
    * window needs one CTE level per step chain link; DuckDB's
    * `sum(BIGINT)` widens to HUGEINT, so journey sums are cast back.
    */
  def conversionSql(table: String, userCol: String, tsCol: String,
      idCol: String, typeCol: String, steps: Seq[String]): String = {
    val win = s"(PARTITION BY $userCol ORDER BY us, $idCol " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    val base = s"e0 AS (SELECT $userCol, $idCol, $typeCol, " +
      s"epoch_us($tsCol) AS us FROM $table)"
    val chain = steps.indices.init.map { i =>
      val qualifies =
        if (i == 0) s"$typeCol = '${steps(0)}'"
        else s"$typeCol = '${steps(i)}' AND _qb_${i - 1} IS NOT NULL"
      s"e${i + 1} AS (SELECT *, min(CASE WHEN $qualifies THEN us END) " +
        s"OVER $win AS _qb_$i FROM e$i)"
    }
    val firsts = (s"min(CASE WHEN $typeCol = '${steps(0)}' THEN us END) AS _first_0" +:
      steps.indices.tail.map { i =>
        s"min(CASE WHEN $typeCol = '${steps(i)}' AND _qb_${i - 1} IS NOT NULL " +
          s"THEN us END) AS _first_$i"
      }).mkString(", ")
    val perUser = s"per_user AS (SELECT $userCol, $firsts " +
      s"FROM e${steps.size - 1} GROUP BY $userCol)"
    val rows = steps.indices.map { i =>
      s"SELECT CAST($i AS BIGINT) AS step_idx, '${steps(i)}' AS step, " +
        s"count(_first_$i) AS n_users, " +
        s"CAST(coalesce(sum(CASE WHEN _first_$i IS NOT NULL " +
        s"THEN _first_$i - _first_0 END), 0) AS BIGINT) AS sum_lead_us " +
        "FROM per_user"
    }.mkString(" UNION ALL ")
    s"WITH ${(base +: chain :+ perUser).mkString(", ")} " +
      s"SELECT * FROM ($rows) ORDER BY step_idx"
  }
}
