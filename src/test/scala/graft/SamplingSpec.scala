package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = (1L to 400L).map(i =>
    (i, if (i % 2 == 0) "en" else "fr")).toDF("doc_id", "lang")

  test("stratifiedSampled applies per-stratum rates off the same content hash") {
    val out = Sampling.stratifiedSampled(docs, "doc_id", "lang",
      Map("en" -> 25), defaultPct = 75)
    val counts = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // 200 docs per stratum: ~25% of en, ~75% of fr (hash-binomial spread)
    assert(counts("en") > 20 && counts("en") < 80, s"en kept ${counts("en")}")
    assert(counts("fr") > 110 && counts("fr") < 190, s"fr kept ${counts("fr")}")
    // membership must be the uniform sampler's at the same rate — the
    // stratification only switches the threshold, never the hash
    val uniform25 = Sampling.sampled(docs.filter($"lang" === "en"), "doc_id", 25)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val strat = out.filter($"lang" === "en")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(strat == uniform25)
  }

  test("stratified membership is partitioning-independent") {
    val a = Sampling.stratifiedSampled(docs.repartition(17), "doc_id", "lang",
      Map("en" -> 25), 75).select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedSampled(docs.coalesce(1), "doc_id", "lang",
      Map("en" -> 25), 75).select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }
}
