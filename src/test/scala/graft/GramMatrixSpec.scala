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

  test("dimension mismatch fails loudly, not silently") {
    val vecs = Seq(Seq(1f, 2f)).toDF("v")
    val e = intercept[Exception] {
      vecs.agg(GramMatrixAgg.gram(col("v"), 3).as("g")).collect()
    }
    assert(e.getMessage != null)
  }
}
