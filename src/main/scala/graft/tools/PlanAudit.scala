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

  /** (cartesians, bnl joins, shuffles, broadcasts) in plan + subqueries. */
  def shapeCounts(plan: SparkPlan): (Int, Int, Int, Int) = {
    val nodes = plan.collectWithSubqueries { case p => p }
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
