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

  /** Session-scoped first/last-touch attribution: every conversion event
    * is credited to the FIRST and the LAST touch-channel event that
    * strictly precedes it inside the same activity session (gap
    * sessionization, `gapUs` of inactivity closes a session — the same
    * session contract as `q_events_sessions`). Conversions with no
    * preceding touch in their session land in the `(none)` channel, so
    * credit totals always equal the conversion count.
    *
    * Output: one row per channel — `channel`, `n_first_touch`,
    * `n_last_touch` (BIGINT conversion counts), ordered by channel.
    *
    * Scale shape: ONE hash shuffle on the user key does all the work.
    * The sessionization windows partition by user; the attribution
    * windows partition by (user, session) — `HashPartitioning(user)`
    * already satisfies the clustered distribution on the wider key, so
    * Catalyst inserts only a re-sort, never a second exchange. The
    * session-local first/last touch is a running `first/last(…, ignore
    * nulls)` over the strictly-preceding frame — no event×event
    * self-join, no per-conversion lookup join, so hot users cost one
    * sort-merge pass instead of a skewed O(touches × conversions)
    * blow-up. The final channel rollup aggregates a handful of rows.
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, touches: Seq[String],
      conversion: String, gapUs: Long = 1800000000L): DataFrame = {
    require(touches.nonEmpty, "attribution needs at least one touch channel")
    val us = unix_micros(col(tsCol))
    val wUser = Window.partitionBy(col(userCol)).orderBy(us, col(idCol))
    val wRun = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touchType = when(col(typeCol).isin(touches: _*), col(typeCol))
    val sess = events
      .withColumn("_prev_us", lag(us, 1).over(wUser))
      .withColumn("_sess",
        sum(when(col("_prev_us").isNull || us - col("_prev_us") > lit(gapUs),
          1L).otherwise(0L)).over(wRun))
    val wPrior = Window.partitionBy(col(userCol), col("_sess"))
      .orderBy(us, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    sess
      .withColumn("_ft", first(touchType, ignoreNulls = true).over(wPrior))
      .withColumn("_lt", last(touchType, ignoreNulls = true).over(wPrior))
      .filter(col(typeCol) === conversion)
      .select(explode(array(
        struct(coalesce(col("_ft"), lit("(none)")).as("channel"),
          lit(1L).as("f"), lit(0L).as("l")),
        struct(coalesce(col("_lt"), lit("(none)")).as("channel"),
          lit(0L).as("f"), lit(1L).as("l")))).as("_e"))
      .groupBy(col("_e.channel").as("channel"))
      .agg(sum(col("_e.f")).as("n_first_touch"),
        sum(col("_e.l")).as("n_last_touch"))
      .orderBy(col("channel"))
  }

  /** Matching ANSI SQL for [[attribution]], generated from the same
    * channel list (DuckDB spells ignore-nulls as `first_value(x IGNORE
    * NULLS)`; BIGINT sums are cast back from HUGEINT).
    */
  def attributionSql(table: String, userCol: String, tsCol: String,
      idCol: String, typeCol: String, touches: Seq[String],
      conversion: String, gapUs: Long = 1800000000L): String = {
    val touchList = touches.map(t => s"'$t'").mkString(", ")
    val touchCase = s"CASE WHEN $typeCol IN ($touchList) THEN $typeCol END"
    val wPrior = s"(PARTITION BY $userCol, sess ORDER BY us, $idCol " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    s"""WITH g AS (
       |  SELECT $userCol, $idCol, $typeCol, epoch_us($tsCol) AS us,
       |    lag(epoch_us($tsCol)) OVER (PARTITION BY $userCol
       |      ORDER BY epoch_us($tsCol), $idCol) AS prev_us
       |  FROM $table),
       |s AS (
       |  SELECT *, sum(CASE WHEN prev_us IS NULL OR us - prev_us > $gapUs
       |                     THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY $userCol ORDER BY us, $idCol
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
       |  FROM g),
       |a AS (
       |  SELECT $typeCol,
       |    first_value($touchCase IGNORE NULLS) OVER $wPrior AS ft,
       |    last_value($touchCase IGNORE NULLS) OVER $wPrior AS lt
       |  FROM s),
       |p AS (SELECT coalesce(ft, '(none)') AS ft, coalesce(lt, '(none)') AS lt
       |      FROM a WHERE $typeCol = '$conversion'),
       |u AS (SELECT ft AS channel, 1 AS f, 0 AS l FROM p
       |      UNION ALL SELECT lt, 0, 1 FROM p)
       |SELECT channel, CAST(sum(f) AS BIGINT) AS n_first_touch,
       |  CAST(sum(l) AS BIGINT) AS n_last_touch
       |FROM u GROUP BY channel ORDER BY channel""".stripMargin
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
