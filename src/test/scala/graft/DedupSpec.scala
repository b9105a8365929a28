package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Planted corpus: 0/1 near-identical, 2 shares a prefix, 3 disjoint. */
  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
    (2L, "the quick brown fox sleeps under a warm sun with no worries at all"),
    (3L, "completely unrelated text about spark catalyst optimizer internals here"))
    .toDF("doc_id", "text")

  test("exactByHash keeps the lowest tie-break row per duplicate content") {
    val dup = docs.union(Seq((10L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text"))
    val kept = Dedup.exactByHash(dup, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 1L, 2L, 3L), "doc 10 is a duplicate of doc 0 and must lose")
  }

  test("clusterIds computes connected components with min-id labels") {
    // graph: chain 1-2, 2-3 (one component, min 1); pair 5-6; isolates 4, 7
    val universe = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterIds(universe, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    // transitivity the pair-based policy can't express: 3 reaches 1 only
    // through 2 — label propagation must carry it across the chain
    assert(out(3L) == 1L)
  }

  test("clusterIds converges on a long chain (diameter > 1 iterations)") {
    val n = 12
    val universe = (1 to n).map(_.toLong).toDF("doc_id")
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterIds(universe, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet == Set(1L), "whole chain collapses to min id 1")
  }

  test("clusterIdsStar equals min-label on a planted 50-deep chain, in far fewer rounds") {
    // worst case for propagation: a 51-node chain (diameter 50), plus a
    // separate triangle component and two isolates
    val n = 51
    val universe = ((1 to n).map(_.toLong) ++ Seq(100L, 101L, 102L, 200L, 201L))
      .toDF("doc_id")
    val pairs = ((1 until n).map(i => (i.toLong, (i + 1).toLong)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L))).toDF("doc_a", "doc_b")
    val (minLabel, minRounds) =
      Dedup.clusterIdsCounted(universe, "doc_id", pairs, maxIters = 60)
    val (star, starRounds) =
      Dedup.clusterIdsStarCounted(universe, "doc_id", pairs)
    val expected = ((1 to n).map(i => i.toLong -> 1L) ++
      Seq(100L -> 100L, 101L -> 100L, 102L -> 100L, 200L -> 200L, 201L -> 201L)).toMap
    assert(minLabel.as[(Long, Long)].collect().toMap == expected)
    assert(star.as[(Long, Long)].collect().toMap == expected)
    // min-label needs ~diameter rounds; star contraction collapses the
    // same chain logarithmically
    assert(minRounds >= 50, s"min-label should take ~diameter rounds, took $minRounds")
    assert(starRounds <= 10, s"star contraction should be O(log n), took $starRounds")
  }

  test("clusterIdsStar maxIters exhaustion still yields one min-aggregated row per doc") {
    // same 51-node chain as above; 2 rounds cannot reach the star fixpoint,
    // so the loop must exit via maxIters, warn on stderr, and min-aggregate
    // the pre-fixpoint edge multiset — a bare left join here would emit
    // duplicate rows per doc with non-minimal roots (the round-5 fix at
    // Dedup.scala:379)
    val n = 51
    val universe = (1 to n).map(_.toLong).toDF("doc_id")
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val errBuf = new java.io.ByteArrayOutputStream()
    val (out, rounds) = Console.withErr(new java.io.PrintStream(errBuf, true, "UTF-8")) {
      Dedup.clusterIdsStarCounted(universe, "doc_id", pairs, maxIters = 2)
    }
    val rows = out.as[(Long, Long)].collect()
    assert(rounds == 2, s"loop must exit via maxIters, ran $rounds rounds")
    assert(rows.length == n, "exactly one row per document even pre-fixpoint")
    assert(rows.map(_._1).toSet == (1 to n).map(_.toLong).toSet)
    // pre-fixpoint labels are still valid downward contractions: every
    // doc's label is its SMALLEST candidate root, never above its own id
    assert(rows.forall { case (id, root) => root <= id })
    assert(errBuf.toString.contains("maxIters=2 exhausted"),
      s"expected the exhaustion warning on stderr, got: ${errBuf.toString.take(200)}")
  }

  test("clusterIdsStar matches clusterIds on the small mixed graph") {
    val universe = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterIdsStar(universe, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("clusterIdsStar handles an empty pair set (all isolates)") {
    val universe = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val (out, rounds) = Dedup.clusterIdsStarCounted(universe, "doc_id", pairs)
    assert(out.as[(Long, Long)].collect().toMap == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(rounds == 0)
  }

  test("positivePairs emits a linear ring per cluster, skipping singletons") {
    // clusters: {1,3,7} -> ring (1,3),(3,7); {2,9} -> (2,9); {5} -> none
    val cl = Seq((1L, 1L), (3L, 1L), (7L, 1L), (2L, 2L), (9L, 2L), (5L, 5L))
      .toDF("doc_id", "cluster_id")
    val out = Dedup.positivePairs(cl, "doc_id", "cluster_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 3L), (1L, 3L, 7L), (2L, 2L, 9L)))
    // |C|-1 pairs per component, never quadratic
    assert(out.size == (3 - 1) + (2 - 1))
  }

  test("ngramJaccardPairs finds exactly the planted near-dup pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("minhashLshPairs agrees with the exact operator on the planted corpus") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .collect().map(_.toSeq).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.7)
      .collect().map(_.toSeq).toSet
    assert(lsh == exact)
  }

  test("nearDedupIncremental drops exact and near corpus twins, keeps batch-internal dups") {
    val corpus = docs // ids 0-3
    val batch = Seq(
      // exact copy of corpus doc 0 -> dropped by the md5 gate
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      // near-dup of corpus doc 1 (one word changed) -> dropped by Jaccard
      (11L, "the quick brown fox jumps over the lazy dog again and again yesterday"),
      // novel content -> survives
      (12L, "fresh never before seen writing about streaming watermark semantics"),
      // exact copy of 12 WITHIN the batch -> survives (increment semantics:
      // batch-internal dups are a separate within-batch pass)
      (13L, "fresh never before seen writing about streaming watermark semantics"))
      .toDF("doc_id", "text")
    val kept = Dedup.nearDedupIncremental(corpus, batch, "doc_id", "text", 3, 0.7)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(12L, 13L), s"got ${kept.toSeq}")
  }

  test("nearDedupIncremental plan: batch bands broadcast, semi gates, no text in shuffles") {
    // pins the scale shape documented on the operator: the corpus side
    // must never shuffle document text (hashes only), the band join must
    // be a broadcast (batch side), and both corpus gates are semi joins
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val df = Dedup.nearDedupIncremental(
      docs.filter($"doc_id" % 10 =!= 0), docs.filter($"doc_id" % 10 === 0),
      "doc_id", "text", 3, 0.7)
    df.collect() // materialize so AQE settles on the final plan
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: inner.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan).distinct
    assert(nodes.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "the band join must broadcast the batch side")
    val semis = nodes.collect { case j: BaseJoinExec
      if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j }
    assert(semis.size >= 2,
      s"expected the md5 gate and the candidate-id semi join, got ${semis.size}")
    val textShuffles = nodes.collect { case s: ShuffleExchangeLike
      if s.output.exists(_.name == "text") => s }
    assert(textShuffles.isEmpty,
      "document text must never cross a shuffle — hashes only")
  }

  test("simhash of identical content is identical; near-dups are close") {
    val fps = Dedup.simhash(docs.union(
        Seq((10L, "the quick brown fox jumps over the lazy dog again and again today"))
          .toDF("doc_id", "text")),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) == fps(10L), "identical text must produce identical simhash")
    assert(java.lang.Long.bitCount(fps(0L) ^ fps(1L)) <
      java.lang.Long.bitCount(fps(0L) ^ fps(3L)),
      "near-dup must be closer in hamming distance than unrelated text")
  }

  test("simhashPairs is exact for hamming <= 3 (banding recall 1)") {
    val all = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (ida, fa) <- all; (idb, fb) <- all if ida < idb
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ida, idb)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("embedCosinePairs finds parallel vectors and rejects orthogonal ones") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 0.001f, 0.0f)),  // ~parallel to 0
      (2L, Array(0.0f, 1.0f, 0.0f)))    // orthogonal
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embedCosinePairs(emb, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }
}
