package graft

import graft.operators.{Dedup, Sampling}
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

  test("temperatureResample keeps n^alpha mass per group with derived sqrt rates") {
    // skewed 3-language corpus: 3200 / 800 / 200 docs
    val skewed = ((1L to 3200L).map(i => (i, "en")) ++
      (4001L to 4800L).map(i => (i, "fr")) ++
      (9001L to 9200L).map(i => (i, "zh"))).toDF("doc_id", "lang")
    val out = Sampling.temperatureResample(skewed, "doc_id", "lang", alpha = 0.5)
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // rates: en sqrt(200/3200)=0.25, fr sqrt(200/800)=0.5, zh 1.0
    assert(kept("zh") == 200L, s"smallest group must keep everything: ${kept("zh")}")
    // expected 800 / 400 with binomial spread (sd ~24 / ~14); 5-sigma bands
    assert(kept("en") > 680 && kept("en") < 920, s"en kept ${kept("en")}")
    assert(kept("fr") > 330 && kept("fr") < 470, s"fr kept ${kept("fr")}")
    // the point of the operator: the dominant group's SHARE flattens
    // toward sqrt-proportional (0.76 of rows before, ~0.57 after)
    val enShare = kept("en").toDouble / kept.values.sum
    assert(enShare < 0.65, f"en share after smoothing $enShare%.2f")
    // rate column is the derived sqrt, exact
    val rates = out.select($"lang", $"rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates("en") == 0.25 && rates("fr") == 0.5 && rates("zh") == 1.0)
    // membership is the md5-fraction contract: client-side replica
    def uOf(id: Long): Double =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16).toDouble / 4294967296.0
    val keptFr = out.filter($"lang" === "fr")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val expectFr = (4001L to 4800L).filter(uOf(_) < 0.5)
    assert(keptFr == expectFr)
    // alpha = 1 is the identity: every rate 1, nothing dropped
    assert(Sampling.temperatureResample(skewed, "doc_id", "lang", 1.0)
      .count() == 4200L)
  }

  test("unimaxAllocation waterfills the budget under per-group epoch caps") {
    // doc-level corpus -> group token sums a=100, b=200, c=700 (T=1000)
    val docs = (Seq.fill(2)(("a", 50L)) ++ Seq.fill(4)(("b", 50L)) ++
      Seq.fill(7)(("c", 100L))).toDF("lang", "n_tok")
    // B = 1*T = 1000, caps at 2 epochs: a 200, b 400, c 1400
    val out = Sampling.unimaxAllocation(docs, "lang", "n_tok", 2, 1)
      .orderBy("lang")
      .as[(String, Long, Long, Boolean, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq(("a", 100L, 200L, true), ("b", 200L, 400L, true),
          ("c", 700L, 1400L, false)))
    // a and b hit their caps (b exactly at the tie: fair share == cap);
    // c absorbs the remaining budget — and the allocs sum to B exactly
    assert(out.map(_._5).toSeq == Seq(200.0, 400.0, 400.0))
    assert(out.map(_._5).sum == 1000.0)
    // capped rows' epochs are EXACTLY maxEpochs (n*c/n is a
    // representable true quotient); the uncapped row one IEEE division
    assert(out(0)._6 == 2.0 && out(1)._6 == 2.0 && out(2)._6 == 400.0 / 700.0)
    // budget >= total caps: everything capped at maxEpochs, budget underspent
    val all = Sampling.unimaxAllocation(docs, "lang", "n_tok", 2, 10)
      .as[(String, Long, Long, Boolean, Double, Double)].collect()
    assert(all.forall(r => r._4 && r._6 == 2.0) && all.map(_._5).sum == 2000.0)
    // equal groups under a tight budget: nothing capped, uniform thirds
    val eq = (Seq.fill(3)(("x", 100L)) ++ Seq.fill(3)(("y", 100L)) ++
      Seq.fill(3)(("z", 100L))).toDF("lang", "n_tok")
    val none = Sampling.unimaxAllocation(eq, "lang", "n_tok", 4, 1)
      .as[(String, Long, Long, Boolean, Double, Double)].collect()
    assert(none.forall(r => !r._4 && r._5 == 300.0 && r._6 == 1.0))
  }

  test("unimaxRealize emits exact copy counts: integral epochs, Bernoulli fraction") {
    // same corpus as the allocation test, now with doc ids:
    // a=100 (capped, e=2), b=200 (capped, e=2), c=700 (uncapped, e=4/7)
    val docs = ((1L to 2L).map((_, "a", 50L)) ++ (11L to 14L).map((_, "b", 50L)) ++
      (21L to 27L).map((_, "c", 100L))).toDF("doc_id", "lang", "n_tok")
    val out = Sampling.unimaxRealize(docs, "doc_id", "lang", "n_tok", 2, 1)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._4)).toMap
    assert(out.size == 13, "every doc keeps a row, including n_copies = 0")
    // capped groups: e is integral -> exactly maxEpochs copies per doc
    assert(out.filter(_._2._1 != "c").values.forall(_._2 == 2L))
    // uncapped group: floor(e)=0, copy iff u < 400/700 — replicate the
    // md5-fraction draw client-side, bit for bit
    def uOf(id: Long): Double =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16).toDouble / 4294967296.0
    val e = 400.0 / 700.0
    (21L to 27L).foreach { id =>
      val expect = if (uOf(id) < e) 1L else 0L
      assert(out(id)._2 == expect, s"doc $id: ${out(id)._2} != $expect")
    }
  }

  /** The leakage-safe split contract: near-duplicate documents land in
    * ONE split because membership hashes the cluster id — while the
    * planted pair's own doc ids hash to DIFFERENT per-doc buckets, i.e.
    * a naive per-doc split would have separated them.
    */
  test("cluster-keyed split keeps near-duplicates together where a per-doc split separates them") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    // find two ids whose PER-DOC 50% buckets differ, to make the
    // counterfactual (naive split separates them) part of the pin —
    // client-side replica of Sampling's md5-first-8-hex-chars bucket
    def bucketOf(id: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16) % 100
    val ids = (1L to 50L).map(i => i -> bucketOf(i.toString))
    val (idA, idB) = {
      val a = ids.find(_._2 < 50).get._1
      val b = ids.find(_._2 >= 50).get._1
      (a, b)
    }
    val near = base + " tail"
    val docs = Seq(
      (idA, base), (idB, near), // planted near-dup pair, J >= 0.7
      (100L, "completely different content about shipping manifests"),
      (101L, "unrelated text concerning maritime insurance claims"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.7,
      ordered = false)
    assert(pairs.filter(
      (col("doc_a") === idA && col("doc_b") === idB) ||
      (col("doc_a") === idB && col("doc_b") === idA)).count() >= 1,
      "planted pair must be a near-dup")
    val split = Sampling.withSplit(
      Dedup.clusterIds(docs, "doc_id", pairs), "cluster_id", 50)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    assert(split(idA) == split(idB),
      s"near-dups split apart: ${split(idA)} vs ${split(idB)}")
  }

  test("shardedShuffle: in-range shards, contiguous per-shard ranks, stable, permuting") {
    val out = Sampling.shardedShuffle(docs, "doc_id", 16)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.length == 400)
    assert(out.forall { case (_, sh, _) => sh >= 0 && sh < 16 })
    out.groupBy(_._2).foreach { case (sh, g) =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq,
        s"shard $sh ranks must be exactly 1..n")
    }
    // deterministic under repartitioning (the property Dataset.sample lacks)
    val b = Sampling.shardedShuffle(docs.repartition(17), "doc_id", 16)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // and it actually shuffles: within-shard order is not id order
    val biggest = out.groupBy(_._2).maxBy(_._2.length)._2
    val inPosOrder = biggest.sortBy(_._3).map(_._1).toSeq
    assert(inPosOrder != inPosOrder.sorted, "md5 rank must permute ids")
  }

  test("cappedPerStratum keeps exactly cap rows per stratum, hash-chosen, stable") {
    val out = Sampling.cappedPerStratum(docs, "doc_id", "lang", 30)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = out.groupBy(_._2)
    assert(byLang("en").length == 30 && byLang("fr").length == 30)
    // a stratum under the cap passes through whole
    val small = docs.filter($"doc_id" <= 10)
    assert(Sampling.cappedPerStratum(small, "doc_id", "lang", 30).count() == 10)
    // kept set is partitioning-independent and NOT the lowest ids
    val b = Sampling.cappedPerStratum(docs.repartition(17), "doc_id", "lang", 30)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(out.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    assert(byLang("en").map(_._1).sorted.toSeq !=
      docs.filter($"lang" === "en").orderBy($"doc_id").limit(30)
        .select("doc_id").as[Long].collect().toSeq,
      "hash order must not degenerate to id order")
  }

  test("stratified membership is partitioning-independent") {
    val a = Sampling.stratifiedSampled(docs.repartition(17), "doc_id", "lang",
      Map("en" -> 25), 75).select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedSampled(docs.coalesce(1), "doc_id", "lang",
      Map("en" -> 25), 75).select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("systematicWeighted equals the sequential PPS reference and keeps every heavy row") {
    // non-contiguous ids + varied weights, one heavy row that must always
    // be hit (weight >= stride covers at least one grid point)
    val rows = (1L to 200L).map(i => (i * 3 + 7, 1L + (i % 7))) :+ (1000L, 300L)
    val df = rows.toDF("id", "wt")
    val k = 20
    val got = Sampling.systematicWeighted(df, "id", "wt", k)
      .as[(Long, Long)].collect().toSeq
    // sequential reference: cumulative sum in id order, keep stride-crossers
    val total = rows.map(_._2).sum
    val stride = math.max(total / k, 1L)
    var cum = 0L
    val expect = rows.sortBy(_._1).flatMap { case (id, w) =>
      val prev = cum; cum += w
      if (cum / stride > prev / stride) Some((id, w)) else None
    }
    assert(got == expect, s"got ${got.size} rows, expected ${expect.size}")
    assert(got.contains((1000L, 300L)), "heavy row must always be selected")
  }

  test("systematicWeighted is bucket-count and partitioning invariant") {
    val df = (1L to 300L).map(i => (i, 1L + i % 5)).toDF("id", "wt")
    val a = Sampling.systematicWeighted(df.repartition(13), "id", "wt", 25,
      nBuckets = 32).as[(Long, Long)].collect().toSeq
    val b = Sampling.systematicWeighted(df.coalesce(1), "id", "wt", 25,
      nBuckets = 1).as[(Long, Long)].collect().toSeq
    assert(a == b, "two-level prefix sum must not depend on layout")
  }
}
