package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Registry-wide physical join-shape survey: for every registered query,
  * counts the scale-killer node types (cartesian product, broadcast
  * nested-loop join) in the pre-AQE physical plan, plus shuffle/broadcast
  * exchange totals for context. Feeds `PlanGuardSpec`'s allowlist — run
  * when adding queries to see exactly which plans carry which shapes.
  *
  * Run: runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {

  /** Every physical node in `plan` plus (recursively) its PHYSICAL
    * subquery plans. Not `collectWithSubqueries`: at the pre-AQE
    * `sparkPlan` stage subquery expressions may still hold LOGICAL
    * plans (they are planned later, in prepareForExecution — and which
    * subqueries exist there is session-state-dependent, e.g.
    * MergeScalarSubqueries decides differently against cached branches),
    * and `collectWithSubqueries` blind-casts those to SparkPlan and
    * throws. A logical subquery plan can't contain a physical join node,
    * so skipping it loses nothing here; `PLANSHAPE.tsv` audits the fully
    * planned executedPlan separately.
    */
  private def physicalNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val here = plan.collect { case p => p }
    val subPlans = here.flatMap(_.expressions).flatMap(_.collect {
      case e: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
        e.plan
    }).collect { case sp: SparkPlan => sp }
    here ++ subPlans.flatMap(physicalNodes)
  }

  /** (cartesians, bnl joins, shuffles, broadcasts) in plan + subqueries. */
  def shapeCounts(plan: SparkPlan): (Int, Int, Int, Int) = {
    val nodes = physicalNodes(plan)
    (nodes.count(_.isInstanceOf[CartesianProductExec]),
      nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      nodes.count(_.getClass.getSimpleName == "ShuffleExchangeExec"),
      nodes.count(_.getClass.getSimpleName == "BroadcastExchangeExec"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("query\tcartesian\tbnlj\tshuffle\tbroadcast")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, mk) =>
      try {
        val (c, b, s, br) = shapeCounts(mk(spark, dir).queryExecution.sparkPlan)
        println(s"$name\t$c\t$b\t$s\t$br")
      } catch {
        case e: Throwable => println(s"$name\tERR\t${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
