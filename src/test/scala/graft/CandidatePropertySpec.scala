package graft

import graft.operators.{Dedup, FuzzyJoin}
import org.apache.spark.sql.functions._

/** Randomized brute-force equivalence for the round-6 candidate
  * generators (seeded, deterministic): candidate filtering must lose NO
  * true pair on corpora with real overlap structure — the completeness
  * property the fixed planted specs only sample.
  */
class CandidatePropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813)

  test("containmentPairs equals client-side brute force on random overlapping docs") {
    // small vocab + splice-based construction => real containment pairs
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(): String = Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (1 to 30).map(i => (i.toLong, doc()))
    // splice ten docs wholly into longer wrappers -> guaranteed containments
    val wrapped = (1 to 10).map { i =>
      val inner = bases(rnd.nextInt(bases.size))._2
      (100L + i, s"${doc()} $inner ${doc()}")
    }
    val all = bases ++ wrapped
    val docs = all.toDF("doc_id", "text")

    def shingleSet(text: String): Set[String] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sets = all.map { case (id, t) => id -> shingleSet(t) }.toMap
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      c = r4(sa.intersect(sb).size.toDouble / sa.size) if c >= 0.7
    } yield (a, b, c)).toSet

    val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.7)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(expected.size >= 10, s"sanity: splices must create containments (${expected.size})")
  }

  test("ngramJaccardPairs equals brute force on a saturated-vocab corpus, incl. exact-boundary pairs") {
    // The adversarial shape that motivated the round-8 length+positional
    // filters: a tiny vocabulary saturates the shingle space, so prefix
    // collisions alone approach all-pairs and the added filters do the
    // real pruning — they must still lose NO true pair.
    val vocab = Vector("spark", "sort", "batch", "join", "scan", "agg",
      "row", "key", "col", "map")
    def doc(len: Int): String =
      Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val noise = (1 to 60).map(i => (i.toLong, doc(8 + rnd.nextInt(20))))
    // Exact-boundary construction: 8 shared prefix tokens + 3 unique
    // suffix tokens per side gives |a|=|b|=9 shingles, 6 shared, union 12
    // — Jaccard exactly 1/2, sitting ON tau = 0.5. The candidate filters
    // compare tau-scaled sizes in doubles; the 1e-9 slack must keep these.
    val boundary = (0 until 5).flatMap { i =>
      // 8 DISTINCT tokens -> all 6 interior 3-grams distinct, so the
      // shared shingle count is exactly 6 and J is exactly 1/2
      val shared = rnd.shuffle(vocab).take(8).mkString(" ")
      // unique suffixes from a disjoint token universe per side
      val ua = (0 until 3).map(j => s"ua${i}x$j").mkString(" ")
      val ub = (0 until 3).map(j => s"ub${i}x$j").mkString(" ")
      Seq((1000L + 2 * i, s"$shared $ua"), (1001L + 2 * i, s"$shared $ub"))
    }
    val all = noise ++ boundary
    val docs = all.toDF("doc_id", "text")

    def shingleSet(text: String): Set[String] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sets = all.map { case (id, t) => id -> shingleSet(t) }.toMap

    for (tau <- Seq(0.4, 0.5)) {
      val expected = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = sa.intersect(sb).size
        j = r4(inter.toDouble / (sa.size + sb.size - inter)) if j >= tau
      } yield (a, b, j)).toSet
      val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, tau)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected,
        s"tau=$tau missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      if (tau == 0.5)
        assert((1000L until 1010L by 2).forall(a => expected.exists(p => p._1 == a)),
          "sanity: every planted boundary pair must sit at exactly tau")
    }
  }

  test("fuzzy selfJoin d=1 and d=2 equal brute levenshtein on random typo'd strings") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def mutate(s: String, edits: Int): String = {
      var cur = s
      for (_ <- 1 to edits if cur.nonEmpty) {
        val p = rnd.nextInt(cur.length)
        cur = rnd.nextInt(3) match {
          case 0 => cur.updated(p, ('a' + rnd.nextInt(26)).toChar) // substitute
          case 1 => cur.take(p) + cur.drop(p + 1)                  // delete
          case _ => cur.take(p) + ('a' + rnd.nextInt(26)).toChar + cur.drop(p) // insert
        }
      }
      cur
    }
    val bases = (1 to 25).map(_ => Seq.fill(10 + rnd.nextInt(8))(('a' + rnd.nextInt(6)).toChar).mkString)
    val strs = (bases ++ bases.map(mutate(_, 1)) ++ bases.map(mutate(_, 2)) ++
      bases.map(mutate(_, 3))).zipWithIndex.map { case (s, i) => ((i + 1).toLong, s) }
    val df = strs.toDF("id", "name")
    for (d <- Seq(1, 2)) {
      val minLen = 3 * (d + 1)
      val eligible = strs.filter(_._2.length >= minLen)
      val expected = (for {
        (ia, sa) <- eligible; (ib, sb) <- eligible if ia < ib
        dist = lev(sa, sb) if dist <= d
      } yield (ia, ib, dist.toLong)).toSet
      val got = FuzzyJoin.selfJoin(df, "id", "name", maxDist = d)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected,
        s"d=$d missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      assert(expected.size >= 20, s"sanity at d=$d: planted typos must pair (${expected.size})")
    }
  }
}
