package graft

import graft.queries.Relational
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** q_topk_per_group's whole point is the PLAN: a bounded-heap aggregate
  * with map-side partials instead of a per-group window sort. The oracle
  * proves value equality to the window formulation; this spec pins the
  * plan shape so a refactor cannot silently regress to the sort.
  */
class TopKPerGroupSpec extends SparkTestBase {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: inner.flatMap(flatten)
  }

  test("plan aggregates with partial top-k heaps; no window sort anywhere") {
    val df = Relational.qTopkPerGroup(spark, "/root/testdata/sf0.001")
    df.collect() // settle AQE
    val nodes = flatten(df.queryExecution.executedPlan).distinct
    assert(nodes.collect { case w: WindowExec => w }.isEmpty,
      "grouped top-k must not fall back to a window sort")
    val aggs = nodes.collect { case a: BaseAggregateExec
      if a.aggregateExpressions.exists(_.aggregateFunction.prettyName == "topk_by_score") => a }
    assert(aggs.size >= 2,
      s"expected partial + final topk_by_score aggregate stages, got ${aggs.size}")
  }

  test("matches the window formulation row-for-row, including sub-k groups") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val windowed = ord
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rk")
      .collect()
    val agged = Relational.qTopkPerGroup(spark, "/root/testdata/sf0.001").collect()
    assert(agged.toSeq == windowed.toSeq)
  }
}
