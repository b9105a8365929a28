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

  /** Referential integrity: child rows whose `fkCol` has no match in
    * `parent.pkCol` (NULL fks are completeness's concern, not RI's).
    */
  def checkReferential(child: DataFrame, parent: DataFrame, name: String,
      fkCol: String, pkCol: String): DataFrame = {
    val orphans = child.filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol)), col(fkCol) === col(pkCol),
        "left_anti")
    child.filter(col(fkCol).isNotNull).agg(count(lit(1)).as("n_checked"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
      .select(lit(name).as("check_name"), col("n_checked"),
        col("n_violations"))
  }
}
