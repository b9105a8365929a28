package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/
  * great-expectations pattern): evaluate a set of named constraints —
  * completeness (non-null fraction), uniqueness (key collision count),
  * range conformance, referential integrity — and emit ONE small report
  * row per constraint: (check_name, n_checked, n_violations).
  *
  * Shape for 100 TB: every single-table constraint over one relation is
  * fused into ONE conditional-count aggregation (a single scan, no
  * shuffle beyond the 1-row agg), uniqueness is one groups-sized count,
  * and each referential check is a left-anti join that can
  * bloom/broadcast-prune. Constraints never fail the job — violations
  * are DATA, so thresholds live downstream (gate a publish on
  * `n_violations == 0`, alert on a fraction), which is what makes the
  * report joinable with history for drift tracking.
  */
object DataQuality {

  /** One scan, many constraints: each (name, predicate) pair becomes a
    * violation count over `df`; the n_checked base is the row count.
    * Predicates state what a GOOD row satisfies.
    */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("_total") +:
      rules.map { case (name, ok) =>
        // a NULL predicate result is a violation (ok IS NOT TRUE)
        count(when(!coalesce(ok, lit(false)), 1)).as(s"_v_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // pivot the one-row wide result into a row per rule via a map
    // explode — NOT a union of per-rule selects, which would plant the
    // aggregation (and its scan) once per rule in the plan
    val entries = rules.flatMap { case (name, _) =>
      Seq(lit(name), col(s"_v_$name")) }
    one.select(col("_total"), explode(map(entries: _*)))
      .select(col("key").as("check_name"), col("_total").as("n_checked"),
        col("value").as("n_violations"))
  }

  /** Uniqueness of a candidate key: n_checked = distinct key values,
    * n_violations = keys owning more than one row.
    */
  def checkUnique(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).count()
      .agg(count(lit(1)).as("n_checked"),
        count(when(col("count") > 1, 1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_checked"),
        col("n_violations"))

  /** [[checkRules]] grouped by a run column — the report-HISTORY
    * producer: one scan yields a (run_id, check_name, n_checked,
    * n_violations) row per run × rule, the append-only table that
    * [[drift]] consumes. Same fused single-aggregation shape as
    * [[checkRules]], just keyed: all runs of all rules cost one
    * map-side-combined pass, never a scan per run.
    */
  def checkRulesByRun(df: DataFrame, runCol: Column,
      rules: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("_total") +:
      rules.map { case (name, ok) =>
        count(when(!coalesce(ok, lit(false)), 1)).as(s"_v_$name")
      }
    val wide = df.groupBy(runCol.as("run_id")).agg(aggs.head, aggs.tail: _*)
    val entries = rules.flatMap { case (name, _) =>
      Seq(lit(name), col(s"_v_$name")) }
    wide.select(col("run_id"), col("_total"), explode(map(entries: _*)))
      .select(col("run_id"), col("key").as("check_name"),
        col("_total").as("n_checked"), col("value").as("n_violations"))
  }

  /** Quality drift over a report history: each (check, run) row is
    * compared with the SAME check's previous run and flagged when its
    * violation RATE worsened. The rate comparison is done by integer
    * cross-multiplication (`v·prev_n > prev_v·n` ⇔ `v/n > prev_v/prev_n`
    * for positive counts) — no division, so the flag is exact and the
    * SQL oracle hashes bit-for-bit. First runs have no baseline: NULL
    * prev columns, never flagged.
    *
    * Scale shape: the history table is (runs × rules) rows — kilobytes
    * regardless of data volume — so the lag window is a formality; the
    * expensive part, producing the history, is [[checkRulesByRun]]'s
    * single scan, run incrementally per batch in production.
    */
  def drift(history: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("check_name")).orderBy(col("run_id"))
    history
      .withColumn("prev_checked", lag(col("n_checked"), 1).over(w))
      .withColumn("prev_violations", lag(col("n_violations"), 1).over(w))
      .withColumn("regressed",
        when(col("prev_checked").isNotNull &&
          col("n_violations") * col("prev_checked") >
            col("prev_violations") * col("n_checked"), 1).otherwise(0))
  }

  /** Referential integrity: child rows whose `fkCol` has no match in
    * `parent.pkCol` (NULL fks are completeness's concern, not RI's).
    */
  def checkReferential(child: DataFrame, parent: DataFrame, name: String,
      fkCol: String, pkCol: String): DataFrame = {
    // alias the parent key: when fkCol and pkCol share a name (the common
    // FK case, order_id = order_id) bare col() is ambiguous across the
    // two frames and fails analysis
    val orphans = child.filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as("_graft_pk")),
        col(fkCol) === col("_graft_pk"), "left_anti")
    child.filter(col(fkCol).isNotNull).agg(count(lit(1)).as("n_checked"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
      .select(lit(name).as("check_name"), col("n_checked"),
        col("n_violations"))
  }
}
