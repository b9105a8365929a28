package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  /** Two tight planted blobs; seeds 0 and 1 land one in each blob, so
    * two Lloyd iterations must recover the planted partition exactly.
    */
  test("recovers two planted blobs from one seed in each") {
    val blobA = Seq.tabulate(20)(i => (i * 2L, Array(0.9f + 0.01f * (i % 5), 1.1f)))
    val blobB = Seq.tabulate(20)(i => (i * 2L + 1, Array(9.0f + 0.01f * (i % 5), -4.0f)))
    // ids 0 (blob A) and 1 (blob B) are the seeds
    val df = (blobA ++ blobB).toDF("vec_id", "embedding")
    val got = KMeans.assign(df, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 40)
    assert(blobA.forall { case (id, _) => got(id) == 0L }, "blob A -> cluster 0")
    assert(blobB.forall { case (id, _) => got(id) == 1L }, "blob B -> cluster 1")
  }

  test("matches a client-side replication of the rounded Lloyd iterations") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(60)(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val k = 4
    def r(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d2(v: Array[Float], c: Array[Double]): Double =
      // left fold in index order, then round — the operator's contract
      r(v.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
        acc + (a.toDouble - b) * (a.toDouble - b) }, 4)
    var cent: Map[Int, Array[Double]] = vecs.filter(_._1 < k)
      .map { case (id, v) => id.toInt -> v.map(_.toDouble) }.toMap
    def assignAll(): Map[Long, Int] = vecs.map { case (id, v) =>
      id -> (0 until k).minBy(j => (d2(v, cent(j)), j))
    }.toMap
    for (_ <- 1 to 2) {
      val asg = assignAll()
      val upd = vecs.groupBy(t => asg(t._1)).map { case (cl, members) =>
        cl -> Array.tabulate(8)(d =>
          r(members.map(_._2(d).toDouble).sum / members.size, 6))
      }
      cent = (0 until k).map(j => j -> upd.getOrElse(j, cent(j))).toMap
    }
    val expected = assignAll()
    val got = KMeans.assign(df, "vec_id", "embedding", k, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == expected.map { case (id, c) => id -> c.toLong },
      s"diff=${got.filter { case (id, c) => expected(id).toLong != c }.take(5)}")
  }

  test("assignment plan is a pure projection — no join or aggregate before the rows emerge") {
    // the 100 TB claim: per-iteration assignment broadcasts k×d centroid
    // LITERALS into one codegen'd projection; nothing vector-sized ever
    // shuffles and no join materializes. Pin the physical plan.
    val rnd = new scala.util.Random(3)
    val df = Seq.tabulate(30)(i => (i.toLong, Array.fill(4)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val plan = KMeans.assign(df, "vec_id", "embedding", 2, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"the final assignment pass must not aggregate:\n$plan")
  }

  test("assignment is deterministic across runs") {
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(50)(i => (i.toLong, Array.fill(6)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val a = KMeans.assign(df, "vec_id", "embedding", 3, 2).as[(Long, Long)].collect().toMap
    val b = KMeans.assign(df, "vec_id", "embedding", 3, 2).as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
