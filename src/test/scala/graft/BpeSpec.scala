package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(3)

  private def mergeTuples(df: org.apache.spark.sql.DataFrame) =
    df.select($"merge_idx", $"lhs", $"rhs", $"merged", $"n_pairs")
      .as[(Long, String, String, String, Long)].collect().toSeq

  test("learns the hand-computed merge sequence, frequency-weighted") {
    // words: "aaab" ×3, "ab" ×2, "a" ×1
    // pairs round 0: (a,a) = 2×3 = 6 (overlap counts), (a,b) = 3+2 = 5
    //   → merge (a,a); greedy: aaab → [aa, a, b]
    // pairs round 1: (aa,a) = 3, (a,b) = 3+2 = 5 → merge (a,b)
    val out = mergeTuples(Bpe.train(
      docs("aaab aaab aaab ab ab a"), "text", 2))
    assert(out == Seq(
      (0L, "a", "a", "aa", 6L),
      (1L, "a", "b", "ab", 5L)))
  }

  test("greedy left-to-right: a run of k matches merges at odd positions") {
    // "aaaa" under (a,a) must become [aa, aa] — not [aa, a, a]
    val seg = docs("aaaa")
      .select(Bpe.applyMerge(split(lit("a,a,a,a"), ","), "a", "a").as("s"))
      .as[Seq[String]].head()
    assert(seg == Seq("aa", "aa"))
    // odd-length run: "aaaaa" → [aa, aa, a]
    val seg5 = docs("x")
      .select(Bpe.applyMerge(split(lit("a,a,a,a,a"), ","), "a", "a").as("s"))
      .as[Seq[String]].head()
    assert(seg5 == Seq("aa", "aa", "a"))
  }

  test("merged tokens re-merge with neighbors in later rounds") {
    // "abab" ×4: round 0 picks (a,b) cnt 8 (over (b,a) cnt 4 — count tie-
    // break is desc, then lexicographic) → [ab, ab]; round 1 merges
    // (ab, ab) → the 4-char token "abab"
    val out = mergeTuples(Bpe.train(docs("abab abab abab abab"), "text", 2))
    assert(out == Seq(
      (0L, "a", "b", "ab", 8L),
      (1L, "ab", "ab", "abab", 4L)))
  }

  test("tie-break at equal counts is lexicographic on (lhs, rhs)") {
    // "ba" and "ab": pairs (a,b) and (b,a) both count 1 → (a,b) wins
    val out = mergeTuples(Bpe.train(docs("ba ab"), "text", 1))
    assert(out == Seq((0L, "a", "b", "ab", 1L)))
  }

  test("fertility emits exact per-group counts and the tokens-per-word ratio") {
    // group g1: "aaab ab" (2 words, 4+2=6 chars); group g2: "cd cd cd"
    // merges=2 on the combined corpus: (a,a) cnt 1... compute instead by
    // checking invariants against trainAndEncode on the same corpus
    val df = Seq((1L, "g1", "aaab ab aaab"), (2L, "g1", "ab ab"),
      (3L, "g2", "cd cd cd")).toDF("doc_id", "grp", "text")
    val fert = Bpe.fertility(df, "grp", "text", 2)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val enc = Bpe.trainAndEncode(df, "doc_id", "text", 2)
      .as[(Long, Long, Long)].collect()
    // group sums must equal the per-doc encode sums re-grouped
    Map("g1" -> Seq(1L, 2L), "g2" -> Seq(3L)).foreach { case (g, ids) =>
      val rows = enc.filter(r => ids.contains(r._1))
      val (words, toks) = (rows.map(_._2).sum, rows.map(_._3).sum)
      // fertility is the single IEEE division of the exact longs
      assert(fert(g) == ((words, toks, toks.toDouble / words.toDouble)),
        s"$g: ${fert(g)} vs ($words, $toks)")
    }
    // sanity: fertility >= 1 (a word is at least one token)
    fert.values.foreach { case (_, _, f) => assert(f >= 1.0) }
  }

  test("exhaustion before nMerges stops cleanly with fewer rows") {
    // all words single-character → no adjacent pairs at all
    val none = Bpe.train(docs("a b c", "a c"), "text", 5)
    assert(none.count() == 0)
    // one merge possible, then every word is a single symbol
    val one = mergeTuples(Bpe.train(docs("ab ab"), "text", 5))
    assert(one == Seq((0L, "a", "b", "ab", 2L)))
  }

  test("encode: word counts exact, token counts shrink as merges apply") {
    val d = docs("aaab aaab ab", "aaab a", "")
    val enc = Bpe.trainAndEncode(d, "doc_id", "text", 2)
      .as[(Long, Long, Long)].collect().toSeq
    // merges learned: (a,a) then (a,b) [word freqs: aaab×3, ab×1, a×1]
    // segmentations: aaab → [aa, ab]; ab → [ab]; a → [a]
    // doc 0: 3 words, 2+2+1 = 5 tokens; doc 1: 2 words, 2+1 = 3 tokens;
    // doc 2: empty text → NO row (explode of empty token array)
    assert(enc == Seq((0L, 3L, 5L), (1L, 2L, 3L)))
  }

  test("vocab: surviving symbols with weighted occurrence and position counts") {
    // words: aaab×3 → [aa, ab], ab×2 → [ab], a×1 → [a] after 2 merges
    val v = Bpe.vocab(docs("aaab aaab aaab ab ab a"), "text", 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(v == Seq(("a", 1L, 1L), ("aa", 3L, 1L), ("ab", 5L, 2L)))
  }

  test("fold-apply is equivalent to a driver-side greedy reference on random inputs") {
    def refGreedy(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val rng = new scala.util.Random(7)
    val alphabet = Seq("a", "b", "ab", "ba")
    val cases = Seq.fill(200) {
      val syms = Seq.fill(rng.nextInt(9) + 1)(alphabet(rng.nextInt(4)))
      val (a, b) = (alphabet(rng.nextInt(4)), alphabet(rng.nextInt(4)))
      (syms, a, b)
    }
    cases.groupBy { case (_, a, b) => (a, b) }.foreach { case ((a, b), cs) =>
      val got = cs.map(_._1).toDF("syms")
        .select(col("syms"), Bpe.applyMerge(col("syms"), a, b).as("out"))
        .as[(Seq[String], Seq[String])].collect().toMap
      cs.foreach { case (syms, _, _) =>
        assert(got(syms) == refGreedy(syms, a, b),
          s"pair ($a,$b) on $syms")
      }
    }
  }

  test("round-trip invariant on the real corpus: segmentations concatenate back to their words") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val (merges, words) = Bpe.trainWithSegments(corpus, "text", 8)
    try {
      assert(merges.size == 8, "sf0.001 corpus must support 8 merges")
      val broken = words
        .filter(array_join(col("syms"), "") =!= col("word")).count()
      assert(broken == 0, "every word must re-assemble from its symbols")
      // merges strictly ordered by priority with non-increasing counts
      // is NOT required (a merged pair can create a new frequent pair),
      // but counts must all be positive and indexes contiguous
      assert(merges.map(_.idx) == (0L until 8L) && merges.forall(_.cnt > 0))
    } finally Bpe.unpersistSegments(words)
  }

  test("training plan: pair counting is a map-side-combined agg, no joins") {
    val words = Bpe.wordCounts(docs("aa ab aa b"), "text")
    val plan = words.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Join"), s"word counting must not join:\n$plan")
  }

  test("generated oracle SQL unrolls N materialized iterations") {
    val sql = Bpe.trainSql("documents", "text", 3)
    assert(sql.contains("m0 AS MATERIALIZED") && sql.contains("m2 AS MATERIALIZED")
      && !sql.contains("m3 AS"))
    assert(sql.contains("w3 AS MATERIALIZED"), "final segment table must exist")
    val enc = Bpe.encodeSql("documents", "doc_id", "text", 3)
    assert(enc.contains("JOIN w3 w USING (word)"))
  }
}
