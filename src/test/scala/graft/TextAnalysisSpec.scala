package graft

import graft.functions.PolyHash
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  /** DSIR importance selection on a planted two-distribution corpus:
    * the target-looking docs' trigrams top the target LM but are too
    * rare for the source (full-corpus) top-k, so only they get
    * tgt_hits > src_hits and keep = 1; the majority-distribution docs
    * hit the source LM only. Also pins the <3-token exclusion and the
    * integer identities between the emitted columns.
    */
  test("dsirScores keeps target-looking docs, drops source-typical and short docs") {
    val bText = "common one two three common one two three common one two three"
    val aText = "special alpha beta gamma special alpha beta gamma"
    val rows = (0L until 8L).map(i => (i, bText)) ++
      Seq((8L, aText), (9L, aText), (10L, "too short"))
    val docs = rows.toDF("doc_id", "text")
    val target = docs.filter($"doc_id" >= 8L && $"doc_id" <= 9L)
    val out = TextAnalysis.dsirScores(docs, target, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(!out.contains(10L), "a 2-token doc carries no trigram evidence")
    (0L until 8L).foreach { i =>
      val (tri, tgt, src, score, keep) = out(i)
      assert(tgt == 0L && src > 0L && score < 0L && keep == 0L,
        s"source-typical doc $i: $tri/$tgt/$src")
    }
    Seq(8L, 9L).foreach { i =>
      val (tri, tgt, src, score, keep) = out(i)
      assert(tgt > 0L && src == 0L && score == tgt - src && keep == 1L,
        s"target doc $i: $tri/$tgt/$src")
    }
  }

  test("poly_hash matches the reference definition (codegen + interpreted)") {
    // h = fold over codepoints of (h*31 + cp) % (2^31-1); "hello world" = 1835087470
    val df = Seq("hello world").toDF("s")
    val codegen = df.select(PolyHash.polyHash($"s")).as[Long].head()
    assert(codegen == 1835087470L)
    // interpreted path (eval): force by building the expression row-wise
    val expr = graft.functions.PolyHash(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
    assert(expr.eval(null) == 1835087470L)
  }

  test("stats produces exact counts and ratios on a known sentence") {
    val df = Seq((1L, "The quick brown fox, it jumps!")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_tokens") == 6L)       // the quick brown fox it jumps
    assert(r.getAs[Long]("n_ws_tokens") == 6L)
    assert(r.getAs[Long]("n_bpe_tokens") == 8L)   // 6 words + ',' + '!'
    assert(r.getAs[Double]("punct_ratio") == math.rint(2.0 / 30 * 1e6) / 1e6)
    assert(r.getAs[Double]("stop_ratio") == math.rint(1.0 / 6 * 1e6) / 1e6)
  }

  test("langId applies marker precedence and CJK short-circuit") {
    val df = Seq(
      (1L, "en", "the cat and the dog is here"),
      (2L, "es", "el gato y la casa de que"),
      (3L, "de", "der hund und das haus ist"),
      (4L, "fr", "le chat et les maisons des un"),
      (5L, "zh", "你好世界"),
      (6L, "en", "xyzzy plugh")) // no markers anywhere -> en fallback
      .toDF("doc_id", "lang", "text")
    val preds = TextAnalysis.langId(df, "doc_id", "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(preds == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr",
      5L -> "zh", 6L -> "en"))
  }

  test("termSalience ranks rare terms above common ones, exact arithmetic") {
    val docs = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "alpha epsilon")).toDF("doc_id", "text")
    val out = TextAnalysis.termSalience(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val doc1 = out.filter(_._1 == 1L).map(_._2).toSet
    // alpha appears in all 3 docs (df=3, score 1*3/3=1); beta tf=2 df=2
    // (score 3), gamma tf=1 df=1 (score 3) — the two salient terms win
    assert(doc1 == Set("beta", "gamma"))
    val gamma = out.find(t => t._1 == 1L && t._2 == "gamma").get
    assert(gamma._5 == 1.0 * 3 / 1, "score is the exact rational tf*N/df")
    // doc 3: epsilon (df=1) beats alpha (df=3)
    assert(out.filter(_._1 == 3L).map(_._2).toSet == Set("alpha", "epsilon"))
  }

  test("fingerprints are stable and edit-local (min-8-gram survives a suffix edit)") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(fps(1L) != fps(2L))
    // min-gram fingerprint often survives local edits (shared prefix grams)
    assert(fps(1L)._2 == fps(2L)._2,
      "min 8-gram fingerprint should match for texts differing only at the tail " +
        "(if this fails the min gram happened to cover the edit; pick different texts)")
  }

  test("contaminationFlags flags exactly the doc sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "the secret benchmark question about spark internals today"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // shares the 8-gram (whole benchmark sentence) verbatim mid-document
      (1L, "intro words then the secret benchmark question about spark internals today and more"),
      // shares words but never 8 consecutive ones
      (2L, "spark internals question about the benchmark but scrambled secret today"),
      (3L, "completely unrelated content with nothing shared at all here"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .contaminationFlags(corpus, bench, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L), s"only doc 1 shares an 8-gram, got $out")
    assert(out(1L) >= 1L)
  }

  test("vocabulary ranks by count then token, with cumulative coverage counts") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabulary(docs, "text", 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    // counts: a=4 b=3 c=1 d=1; tie c-vs-d breaks by token asc; top-3 cuts d
    assert(out == Seq(("a", 4L, 1L, 4L), ("b", 3L, 2L, 7L), ("c", 1L, 3L, 8L)))
  }

  test("piiRedact replaces emails, IPs, phones; counts are from the original text") {
    val docs = Seq(
      (1L, "reach jane.doe@example.com or +1 415-555-0134 now"),
      (2L, "hosts 10.0.0.1 and 192.168.10.20 plus root@host.org"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("reach <EMAIL> or <PHONE> now", 1L, 0L, 1L)))
    assert(out(2L) == (("hosts <IP> and <IP> plus <EMAIL>", 1L, 2L, 0L)))
    assert(out(3L) == (("no pii here at all", 0L, 0L, 0L)))
  }

  test("repetitionSignals: uniform doc scores 1.0, diverse doc scores low") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((6L, 1.0, 1.0)), "all-same doc: every token and bigram repeats")
    assert(out(2L)._2 == math.rint(1.0 / 6 * 1e6) / 1e6 || out(2L)._2 == 0.166667)
    assert(out(2L)._3 == 0.2, "5 distinct bigrams of 5: max 1 -> 1/5")
    assert(out(3L) == ((1L, 1.0, 0.0)), "single-token doc has no bigrams")
  }

  test("lmCoverage: exact trigram totals and top-k hits; short docs drop out") {
    // corpus trigram counts: "x y z" ×2 (doc 1), everything else ×1.
    // k=2 LM = {"x y z"} + the n=1 tie broken alphabetically -> "p q r".
    val docs = Seq(
      (1L, "x y z x y z"),  // trigrams: x y z / y z x / z x y / x y z
      (2L, "p q r s"),      // trigrams: p q r / q r s
      (3L, "too short"))    // 2 tokens: no trigram row at all
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmCoverage(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      1L -> ((4L, 2L)), // both "x y z" occurrences hit, the rotations miss
      2L -> ((2L, 1L))), // "p q r" made the LM on the alphabetical tie-break
      s"got $out")
  }

  test("diversity: exact distinct-n counts and ratios per group, cross-document") {
    // s1: "a b a b" (uni 4/2, bi "a b","b a","a b" -> 3/2) + "c" (uni +1/+1, no bi)
    // s2: "x y z" (uni 3/3, bi 2/2)
    val docs = Seq((1L, "s1", "a b a b"), (2L, "s1", "c"), (3L, "s2", "x y z"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.diversity(docs, "source", "text")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("s1", 5L, 3L, 3L, 2L, 3.0 / 5.0, 2.0 / 3.0),
      ("s2", 3L, 3L, 2L, 2L, 1.0, 1.0)), s"got $out")
  }

  test("diversity: a group whose every doc has < 2 tokens stays in the report (n_bi = 0, NULL dist2)") {
    // round-11 verdict nit: the bigram side used to inner-join, silently
    // dropping such a group instead of reporting its bigram-free state
    val docs = Seq((1L, "s1", "a b"), (2L, "s2", "x"), (3L, "s2", "y"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.diversity(docs, "source", "text").collect()
    assert(out.length == 2, s"got ${out.toSeq}")
    val s2 = out.find(_.getString(0) == "s2").get
    assert(s2.getLong(1) == 2L && s2.getLong(2) == 2L, s"uni counts: $s2")
    assert(s2.getLong(3) == 0L && s2.getLong(4) == 0L, s"bi counts: $s2")
    assert(s2.getDouble(5) == 1.0, s"dist1: $s2")
    assert(s2.isNullAt(6), s"dist2 must be NULL for a bigram-free group: $s2")
  }
}
