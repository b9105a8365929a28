package graft

import graft.functions.TopKByScore
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("topkBy keeps the k best (score desc, id asc) across partitions") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 1000L).map(i => (i % 3, rnd.nextInt(100).toDouble, i))
    val df = rows.toDF("g", "s", "id").repartition(7)
    val got = df.groupBy($"g")
      .agg(TopKByScore.topkBy($"s", $"id", 5).as("topk"))
      .select($"g", explode($"topk").as("e"))
      .select($"g", $"e.score", $"e.id")
      .as[(Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3)).sortBy(t => (-t._1, t._2)).take(5).toSeq).toMap
    assert(got == expected)
  }

  test("dot_product of mismatched-length arrays is NULL, not a partial sum") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D)) AS d")
    assert(r.head().isNullAt(0))
  }

  test("bruteTopK ranks an obvious nearest neighbor first") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 0L)
    val top = Similarity.bruteTopK(q, corpus, "vec_id", "embedding", 2)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(top == Seq((1L, 1L), (2L, 2L)))
  }

  test("ivfTopK recall vs brute force on real embeddings is usable") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs(Similarity.bruteTopK(queries, emb, "vec_id", "embedding", 5))
    val ivf = pairs(Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 5))
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall@5 = $recall below floor (near-random data, " +
      "nprobe/nlist = 4/16 probes a quarter of the corpus)")
  }

  test("lshTopK recall vs brute force on real embeddings is usable") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs(Similarity.bruteTopK(queries, emb, "vec_id", "embedding", 5))
    val lsh = pairs(Similarity.lshTopK(queries, emb, "vec_id", "embedding", 5, 64))
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@5 = $recall below floor (data is near-random; " +
      "0.5 is the honest floor for L=8 b=4 at ~60-degree neighbor angles)")
  }
}
