package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("packByBudget assigns concat-then-chunk pack ids per shard") {
    // single shard (nShards = 1): token counts 3,3,3,3 with budget 8 lay
    // out at offsets 0,3,6,9 -> packs 0,0,0,1
    val docs = Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)).toDF("doc_id", "n_tok")
    val out = Packing.packByBudget(docs, "doc_id", "n_tok", 1, 8L)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("pack assignment is partitioning-independent") {
    val docs = (1L to 300L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_tok")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packByBudget(df, "doc_id", "n_tok", 4, 128L)
        .select("doc_id", "shard", "pack_id")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(docs.repartition(13)) == run(docs.coalesce(1)))
  }

  test("interleaveByWeight emits the heavy source ~weight times as densely") {
    val docs = (1L to 100L).map(i =>
      (i, if (i <= 50) "heavy" else "light")).toDF("doc_id", "source")
    val out = Packing.interleaveByWeight(docs, "doc_id", "source",
      Map("heavy" -> 4.0), 1.0, limit = 25)
      .select("mix_rank", "source").as[(Long, String)].collect().toSeq
    assert(out.map(_._1) == (1L to 25L), "ranks are dense from 1")
    val heavy = out.count(_._2 == "heavy")
    // 4:1 weights -> ~4/5 of the prefix comes from the heavy source
    assert(heavy >= 18 && heavy <= 22, s"heavy docs in first 25: $heavy")
    // density check: heavy's k-th doc sits at position k/4 -> the first
    // 4 merged entries before light's first (pos 1.0, ties to heavy)
    assert(out.take(4).forall(_._2 == "heavy"))
  }

  test("chunkTokens windows cover every token with the declared overlap") {
    val docs = Seq(
      (1L, (1 to 70).map(i => s"t$i").mkString(" ")), // 70 tokens: 3 chunks at 32/8
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, "solo")).toDF("doc_id", "text")
    val out = graft.operators.Packing
      .chunkTokens(docs, "doc_id", "text", 32, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val d1 = out.filter(_._1 == 1L).toSeq
    assert(d1.map(c => (c._2, c._3, c._4)) ==
      Seq((0L, 1L, 32L), (1L, 25L, 32L), (2L, 49L, 22L)),
      s"chunk grid must advance by 24 with a 22-token tail, got $d1")
    assert(d1.map(_._5) == Seq("t1", "t25", "t49"))
    // consecutive chunks overlap by exactly 8 tokens
    assert(d1(0)._3 + 32 - 8 == d1(1)._3)
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 1L, 3L, "a")))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, 1L, 1L, "solo")))
  }
}
