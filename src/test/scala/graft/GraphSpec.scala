package graft

import graft.operators.{Graph, TextAnalysis}
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  /** Undirected path graph 1-2-3: node 2 has degree 2, ends degree 1.
    * By symmetry pr(1) == pr(3) and pr(2) > pr(1); total mass stays 1
    * (no dangling nodes in an undirected edge set).
    */
  test("pageRank on a 3-node path: symmetry, center dominance, unit mass") {
    val e0 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
    val pr = Graph.pageRank(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet == Set(1L, 2L, 3L))
    assert(pr(1L) == pr(3L), "symmetric ends must tie exactly")
    assert(pr(2L) > pr(1L), "the center must outrank the ends")
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, s"mass ${pr.values.sum} != 1")
  }

  test("pageRank matches the hand-unrolled iteration on a star graph") {
    // star: center 0 connected to 1,2,3 (undirected). deg(0)=3, deg(i)=1.
    // With teleport t=(1-d)/4: leaf' = t + d*pr0/3; center' = t + d*(3*leaf)
    val e0 = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
    val got = Graph.pageRank(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def rnd(x: Double): Double = BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t = 0.15 / 4
    var center = 0.25; var leaf = 0.25
    for (_ <- 1 to 3) {
      val c2 = rnd(t + 0.85 * 3 * (leaf / 1))
      val l2 = rnd(t + 0.85 * (center / 3))
      center = c2; leaf = l2
    }
    assert(got(0L) == center, s"center ${got(0L)} != $center")
    assert(Seq(1L, 2L, 3L).forall(i => got(i) == leaf))
  }

  test("bipartiteEdges interleaves key spaces and emits both directions") {
    val rel = Seq((10L, 1L), (10L, 2L), (20L, 1L), (10L, 1L)).toDF("pk", "sk")
    val e = Graph.bipartiteEdges(rel, "pk", "sk")
      .as[(Long, Long)].collect().toSet
    val fwd = Set((20L, 3L), (20L, 5L), (40L, 3L))
    assert(e == fwd ++ fwd.map(_.swap), "distinct, interleaved, symmetric")
  }

  test("triangles: K4 + pendant edge — every K4 node closes 3, the pendant none") {
    // K4 on {1,2,3,4} has 4 triangles, each crediting 3 of its corners;
    // the pendant edge 4-5 closes nothing, so node 5 is absent.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("src", "dst")
    val got = Graph.triangles(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles canonicalizes direction and duplicates before counting") {
    // the same single triangle fed as reversed + duplicated edges
    val e = Seq((2L, 1L), (1L, 3L), (3L, 2L), (1L, 2L), (2L, 3L))
      .toDF("src", "dst")
    val got = Graph.triangles(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles plan probes the edge bloom sketch before the closing semi join") {
    // pin the lazy plan (the public triangles() materializes its result
    // eagerly so it can release the persisted edge set before returning)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct()
    val plan = Graph.trianglesPlan(e, 4L).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"wedge stream must be bloom-pruned map-side before the shuffle:\n$plan")
  }

  test("triangle orientation auto-dispatch: skewed graphs pick degree order, regular graphs stay id-ordered") {
    // the dispatch statistic is max_degree/√m with threshold 2: every
    // regular graph sits at √(2d/n) ≤ √2 (the complete graph's exact
    // value), a hub star at √m
    // planted hub graph from the test below: m = 13, maxDeg = 9 → 2.50
    assert(Graph.useDegreeOrder(maxDeg = 9L, edgeCnt = 13L),
      "hub graph (ratio 2.50) must dispatch to degree order")
    // K4 + pendant: m = 7, maxDeg = 4 → 1.51 — regular-ish, id order
    assert(!Graph.useDegreeOrder(maxDeg = 4L, edgeCnt = 7L),
      "near-regular K4 must stay id-ordered")
    // a complete graph is the regular-family maximum: K1000 —
    // maxDeg = 999, m = 499500 → ratio √2 = 1.414, id order (where the
    // orientation joins were measured +30% pure overhead on round 7's
    // complete co-supplier graph). The current registered part
    // co-occurrence graph measures ratio 0.20 at sf0.1 — same branch.
    assert(!Graph.useDegreeOrder(maxDeg = 999L, edgeCnt = 499500L),
      "complete graphs (ratio √2) must stay id-ordered")
    assert(!Graph.useDegreeOrder(maxDeg = 222L, edgeCnt = 1196000L),
      "the registered part co-occurrence graph (ratio 0.20) must stay id-ordered")
    // a CommonCrawl-shaped hub: degree 10^5 in a 10^8-edge graph → 10.0
    assert(Graph.useDegreeOrder(maxDeg = 100000L, edgeCnt = 100000000L),
      "power-law hub must dispatch to degree order")
  }

  test("trianglesDegreeOrdered equals triangles on a skewed hub graph and caps hub out-degree") {
    // hub 1 touches everyone (degree 9); triangles live on hub+pairs and
    // one hub-free triangle 6-7-8. A low-ID hub is id-ordering's worst
    // case: all its neighbors are higher-id, so every neighbor pair forms
    // a wedge at the hub.
    val pairs = (2L to 9L).map(v => (1L, v)) ++
      Seq((2L, 3L), (4L, 5L), (6L, 7L), (7L, 8L), (6L, 8L))
    val e = pairs.toDF("src", "dst")
    val a = Graph.trianglesIdOrdered(e).as[(Long, Long)].collect().toMap
    val b = Graph.trianglesDegreeOrdered(e).as[(Long, Long)].collect().toMap
    assert(a == b, s"orientation must not change counts: $a vs $b")
    // the auto-dispatching entry point must agree with both manual paths
    val auto = Graph.triangles(e).as[(Long, Long)].collect().toMap
    assert(auto == a, s"auto-dispatch changed counts: $auto vs $a")
    // hub triangles: (1,2,3),(1,4,5),(1,6,7),(1,7,8),(1,6,8); hub-free: (6,7,8)
    assert(a(1L) == 5L && a(6L) == 3L, s"sanity: hub closes 5, node 6 closes 3: $a")
    // the wedge bound the orientation buys: under (deg, id) order the
    // hub's out-neighbors are only its (rare) higher-degree peers
    val canon = e.select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b")).distinct()
    val idOrderHubOut = canon.filter($"a" === 1L).count()
    assert(idOrderHubOut == 8L, "id order: the hub pairs all 8 neighbors")
    val deg = canon.select(explode(array($"a", $"b")).as("id"))
      .groupBy($"id").agg(count(lit(1)).as("deg"))
      .as[(Long, Long)].collect().toMap
    val ord = Ordering.Tuple2[Long, Long]
    val degOrderHubOut = pairs.map { case (u, v) =>
      if (ord.lt((deg(u), u), (deg(v), v))) (u, v) else (v, u)
    }.count(_._1 == 1L)
    assert(degOrderHubOut == 0L,
      "degree order: the max-degree hub has NO out-neighbors — its wedges vanish")
  }

  test("coOccurrenceEdges links entities sharing a group, canonical and distinct") {
    val rel = Seq((10L, 1L), (10L, 2L), (10L, 3L), // group 10: triangle 1-2-3
      (20L, 2L), (20L, 1L), // group 20: repeats 1-2 — still one edge
      (30L, 7L)) // singleton group: no edges
      .toDF("g", "e")
    val got = Graph.coOccurrenceEdges(rel, "g", "e")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("dupSpans flags exactly the shingles shared across documents") {
    // doc 1 and 2 share the single 3-gram "a b c"; doc 3 is disjoint
    val docs = Seq(
      (1L, "a b c x y z"),   // shingles: "a b c","b c x","c x y","x y z"
      (2L, "q a b c"),       // shingles: "q a b","a b c"
      (3L, "m n o p")).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpans(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 4L, 1L), (2L, 2L, 1L), (3L, 2L, 0L)))
  }

  test("ngramLm conditional probabilities sum to 1 per prefix and match counts") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b d"), (4L, "x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLm(docs, "text", 50).collect()
    val byTri = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byTri("a b c") == ((2L, 3L, 0.666667)))
    assert(byTri("a b d") == ((1L, 3L, 0.333333)))
    assert(byTri("x y z") == ((1L, 1L, 1.0)))
    // rank is total-ordered: count desc then trigram asc
    assert(out.sortBy(_.getLong(4)).map(_.getString(0)).toSeq ==
      Seq("a b c", "a b d", "x y z"))
  }

  test("qLatestByKey max_by struct comparator breaks ts ties by event_id") {
    val ev = Seq(
      (1L, 100L, "click", 1.0, 7L),
      (2L, 200L, "error", 2.0, 7L),   // same ts as event 3, lower id
      (3L, 200L, "purchase", 3.0, 7L),
      (4L, 50L, "click", 4.0, 8L)).toDF("event_id", "tsl", "event_type", "value", "user_id")
      .withColumn("ts", expr("timestamp_micros(tsl * 1000)")).drop("tsl")
    import org.apache.spark.sql.functions.{col, count, lit, max_by, struct}
    val out = ev.groupBy(col("user_id"))
      .agg(max_by(struct(col("event_id"), col("event_type")),
        struct(col("ts"), col("event_id"))).as("last"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("last.event_id"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((7L, 3L, 3L), (8L, 4L, 1L)))
  }

  private def undirected(pairs: Seq[(Long, Long)]) = {
    val e0 = pairs.toDF("src", "dst")
    e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
  }

  test("labelPropagation resolves two disjoint cliques to their min labels") {
    val clique1 = for (a <- 0L to 3L; b <- a + 1 to 3L) yield (a, b)
    val clique2 = for (a <- 10L to 13L; b <- a + 1 to 13L) yield (a, b)
    val got = Graph.labelPropagation(undirected(clique1 ++ clique2), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 3L).map(_ -> 0L).toMap ++ (10L to 13L).map(_ -> 10L).toMap)
  }

  test("labelPropagation matches a client-side synchronous replication") {
    val rnd = new scala.util.Random(31)
    val nodes = 0L until 40L
    val pairs = (for (a <- nodes; b <- nodes if a < b && rnd.nextDouble() < 0.12)
      yield (a, b)) ++ nodes.sliding(2).map(w => (w(0), w(1))) // connect all
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    pairs.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    var lab: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lab = adj.map { case (v, ns) =>
        val c = ns.groupBy(lab).toSeq.map { case (l, us) => (-us.size.toLong, l) }
        v -> c.min._2
      }.toMap
    }
    val got = Graph.labelPropagation(undirected(pairs.toSeq), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == lab)
    // and partitioning must not move a single label
    val got7 = Graph.labelPropagation(undirected(pairs.toSeq).repartition(7), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got7 == lab)
  }
}
