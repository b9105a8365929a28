package graft

import graft.functions.CountMinAgg
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private val Width = 64

  private def sketch(tokens: Seq[String], parts: Int = 1): Array[Long] =
    tokens.toDF("tk").repartition(parts)
      .agg(CountMinAgg.countMin(col("tk"), Width).as("sk"))
      .as[Seq[Long]].head().toArray

  test("point estimates never underestimate and total mass per row is N") {
    val rnd = new scala.util.Random(3)
    val vocab = (1 to 40).map(i => s"tok$i")
    val stream = Seq.fill(2000)(vocab(rnd.nextInt(vocab.size)))
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = sketch(stream)
    // CMS invariants: estimate >= truth for every token; each of the 4
    // rows holds exactly N increments
    truth.foreach { case (t, n) =>
      val est = CountMinAgg.estimate(sk, Width, t)
      assert(est >= n, s"$t: est $est < true $n — CMS must never underestimate")
      assert(est <= n + 2L * stream.size / Width,
        s"$t: est $est way past the eps*N bound")
    }
    (0 until 4).foreach { r =>
      assert(sk.slice(r * Width, (r + 1) * Width).sum == stream.size.toLong)
    }
  }

  /** The distributed estimator must agree with the client-side one on
    * every token — same md5 rows, same min — and answer from SQL via
    * the registered `cms_estimate`.
    */
  test("CountMinEstimate matches the client-side estimate and is SQL-callable") {
    val tokens = (1 to 300).map(i => s"v${i % 23}")
    val sk = sketch(tokens)
    val est = tokens.distinct.toDF("tk")
      .crossJoin(tokens.toDF("tk0")
        .agg(CountMinAgg.countMin(col("tk0"), Width).as("sk")))
      .select(col("tk"), CountMinAgg.cmsEstimate(col("sk"), col("tk"), Width).as("e"))
      .as[(String, Long)].collect().toMap
    tokens.distinct.foreach { t =>
      assert(est(t) == CountMinAgg.estimate(sk, Width, t), s"mismatch at $t")
    }
    GraftExtensions.register(spark)
    tokens.toDF("tk").createOrReplaceTempView("cms_toks")
    val viaSql = spark.sql(
      s"""SELECT cms_estimate(sk, 'v1', $Width) FROM
         |  (SELECT count_min_agg(tk, $Width) AS sk FROM cms_toks)""".stripMargin)
      .as[Long].head()
    assert(viaSql == CountMinAgg.estimate(sk, Width, "v1"))
  }

  test("sketch is exactly mergeable: partitioning never changes a cell") {
    val tokens = (1 to 500).map(i => s"w${i % 37}")
    assert(sketch(tokens, parts = 1).toSeq == sketch(tokens, parts = 13).toSeq)
  }

  test("estimate is exact when a token's cells carry no collisions") {
    val sk = sketch(Seq("solo", "solo", "solo"))
    assert(CountMinAgg.estimate(sk, Width, "solo") == 3L)
    assert(CountMinAgg.estimate(sk, Width, "absent") == 0L)
  }
}
