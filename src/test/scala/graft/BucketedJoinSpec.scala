package graft

import graft.operators.Bucketing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: inner.flatMap(flatten)
    }
    flatten(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }.distinct.size
  }

  test("same-key same-count bucketed tables join with zero exchanges") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)
    // force the shuffle question to matter: no broadcast escape hatch
    withBroadcastOff {
      // assert on the bare join: a global agg would add its own
      // single-partition exchange and muddy the count
      val plain = li.join(ord, $"l_orderkey" === $"o_orderkey")
      assert(shuffles(plain) >= 2, "plain fact-to-fact join must shuffle both sides")
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      assert(shuffles(bucketed) == 0,
        "co-bucketed join must elide every exchange (write-once shuffle amortization)")
      // and the answers agree
      def sums(df: DataFrame): (Double, Double) = {
        // sort before summing so row-order ulps can't differ
        val rows = df.select($"l_quantity", $"o_totalprice").collect()
          .map(r => (r.getDouble(0), r.getDouble(1))).sorted
        (rows.map(_._1).sum, rows.map(_._2).sum)
      }
      assert(sums(plain) == sums(bucketed))
    }
  }

  private def withBroadcastOff[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, prev)
  }
}
