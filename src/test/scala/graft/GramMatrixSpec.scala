package graft

import graft.functions.GramMatrixAgg
import org.apache.spark.sql.functions._

class GramMatrixSpec extends SparkTestBase {
  import spark.implicits._

  test("gram buffer equals the hand-computed X'X upper triangle") {
    // X = [[1,2,3],[4,5,6]]: X'X = [[17,22,27],[22,29,36],[27,36,45]]
    // upper triangle row-major: 17,22,27,29,36,45
    val vecs = Seq(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)).toDF("v")
    val out = vecs.agg(GramMatrixAgg.gram(col("v"), 3).as("g"))
      .select(explode(col("g")).as("x")).as[Double].collect().toSeq
    assert(out == Seq(17.0, 22.0, 27.0, 29.0, 36.0, 45.0), s"got $out")
  }

  test("partial-merge invariance: partitioning does not change the sums") {
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 400).map(_ => Seq.fill(8)(rnd.nextFloat()))
    val a = vecs.toDF("v").repartition(1)
      .agg(GramMatrixAgg.gram(col("v"), 8).as("g"))
      .select(explode(col("g")).as("x")).as[Double].collect()
    val b = vecs.toDF("v").repartition(13)
      .agg(GramMatrixAgg.gram(col("v"), 8).as("g"))
      .select(explode(col("g")).as("x")).as[Double].collect()
    assert(a.length == 36 && b.length == 36)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)),
        s"merge order moved a sum beyond ulp noise: $x vs $y")
    }
  }

  test("grouped gram matrices compose with GROUP BY") {
    val vecs = Seq((0L, Seq(1f, 0f)), (0L, Seq(1f, 0f)), (1L, Seq(0f, 2f)))
      .toDF("grp", "v")
    val out = vecs.groupBy(col("grp"))
      .agg(GramMatrixAgg.gram(col("v"), 2).as("g"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(0L) == Seq(2.0, 0.0, 0.0)) // [[2,0],[0,0]] upper tri
    assert(out(1L) == Seq(0.0, 0.0, 4.0))
  }

  test("gram aggregation is two-phase: vectors never cross the shuffle") {
    // map-side partial ObjectHashAggregate reduces each task to ONE
    // serialized buffer; the exchange carries binary buffers, not the
    // input vectors — the property that makes X'X feasible at 100 TB
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // 5-partition input WITHOUT an exchange (repartition would itself
    // shuffle the vectors and trip the assertion)
    val vecs = spark.range(0, 100, 1, 5)
      .select(transform(sequence(lit(1), lit(4)),
        j => (col("id") + j).cast("float")).as("v"))
    val df = vecs.agg(GramMatrixAgg.gram(col("v"), 4).as("g"))
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: inner.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    val aggs = nodes.collect { case a: ObjectHashAggregateExec => a }
    assert(aggs.size >= 2, s"expected partial+final ObjectHashAggregate, got ${aggs.size}")
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }.distinct
    val vectorCarrying = shuffles.filter(_.output.exists(
      _.dataType == ArrayType(FloatType, containsNull = false)))
    assert(vectorCarrying.isEmpty,
      s"input vectors crossed a shuffle: ${vectorCarrying.map(_.output.map(_.name))}")
  }

  test("dimension mismatch fails loudly, not silently") {
    val vecs = Seq(Seq(1f, 2f)).toDF("v")
    val e = intercept[Exception] {
      vecs.agg(GramMatrixAgg.gram(col("v"), 3).as("g")).collect()
    }
    assert(e.getMessage != null)
  }
}
