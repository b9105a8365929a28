package graft

import graft.plans.Lineage
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class LineageSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def lineageOf(df: org.apache.spark.sql.DataFrame) =
    Lineage.report(df).as[(String, String, String)].collect().toSet

  test("3-way join + aggregate: each output traces to exactly its physical inputs") {
    val q = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_name"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    assert(lineageOf(q) == Set(
      ("c_name", "customer", "c_name"),
      ("revenue", "lineitem", "l_extendedprice"),
      ("revenue", "lineitem", "l_discount")))
  }

  test("window: partition and order keys count as sources of the windowed value") {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val q = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), sum(col("l_extendedprice")).over(w).as("running"))
    assert(lineageOf(q) == Set(
      ("l_orderkey", "lineitem", "l_orderkey"),
      ("running", "lineitem", "l_extendedprice"),
      ("running", "lineitem", "l_suppkey"),
      ("running", "lineitem", "l_shipdate")))
  }

  test("union merges source columns positionally across branches") {
    val q = Tables.customer(spark, dir).select(col("c_name").as("name"))
      .union(Tables.orders(spark, dir).select(col("o_orderstatus").as("name")))
    assert(lineageOf(q) == Set(
      ("name", "customer", "c_name"),
      ("name", "orders", "o_orderstatus")))
  }

  test("rollup (Expand) keeps grouping-column lineage through the null projections") {
    val q = Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
    assert(lineageOf(q) == Set(
      ("l_returnflag", "lineitem", "l_returnflag"),
      ("qty", "lineitem", "l_quantity"),
      // count(*) has no column refs but still depends on the row set —
      // it must surface as a table-level dependency, not vanish
      ("n", "lineitem", "*")))
  }

  test("explode (Generate) maps generator output to the generator's input column") {
    val q = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.Text.tokens(col("text"))).as("tok"))
    assert(lineageOf(q) == Set(
      ("doc_id", "documents", "doc_id"),
      ("tok", "documents", "text")))
  }

  test("every registered relational query yields a fully-traced lineage over known tables") {
    val known = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (name <- Seq("q3_topk_join", "q_window_running", "q_rollup",
        "q_funnel_attrib", "q_scalar_subquery")) {
      val rows = lineageOf(SparkEntry.queries(name)(spark, dir))
      assert(rows.nonEmpty, s"$name produced no lineage")
      val tables = rows.map(_._2)
      assert(tables.subsetOf(known),
        s"$name traced to unexpected sources: ${tables -- known}")
    }
  }
}
