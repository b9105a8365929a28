package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("jacobiEigen solves a known 2x2 exactly") {
    // [[2,1],[1,2]] -> eigenvalues 3 (along [1,1]) and 1 (along [1,-1])
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    val hi = vals.indexOf(vals.max)
    val v = Array(vecs(0)(hi), vecs(1)(hi))
    assert(math.abs(math.abs(v(0)) - math.abs(v(1))) < 1e-12, "top vector is [1,1]/sqrt2")
  }

  test("first component recovers a planted dominant direction") {
    val rnd = new scala.util.Random(7)
    val dir = Array(0.6, 0.8, 0.0)
    // x = t*dir + small isotropic noise + constant offset (tests centering)
    val rows = (1 to 400).map { _ =>
      val t = rnd.nextGaussian() * 5
      Array.tabulate(3)(i => (t * dir(i) + rnd.nextGaussian() * 0.1 + 2.0).toFloat).toSeq
    }
    val df = rows.toDF("v")
    val m = Pca.fit(df, "v", 3, 3)
    val top = m.components(0)
    val cos = top.zip(dir).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.995, s"top component ${top.toSeq} vs planted ${dir.toSeq}")
    assert(m.eigenvalues(0) > 10 * m.eigenvalues(1),
      "planted variance must dominate the noise eigenvalues")
    assert(m.eigenvalues.sameElements(m.eigenvalues.sorted.reverse))
  }

  test("components are orthonormal; full-rank projection preserves pairwise distance") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(200)
    val d = 64
    val m = Pca.fit(emb, "embedding", d, d)
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<c$i, c$j> = $dot")
    }
    // a full-rank orthonormal projection is an isometry of the centered
    // data: pairwise distances survive exactly (up to fp noise)
    val projected = Pca.project(emb, "embedding", m, "p")
      .select(col("vec_id"), col("p")).as[(Long, Seq[Double])].collect().toMap
    val raw = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val ids = raw.keys.toSeq.sorted.take(12)
    for (a <- ids; b <- ids if a < b) {
      val dRaw = math.sqrt(raw(a).zip(raw(b)).map { case (x, y) => val z = x - y; z.toDouble * z }.sum)
      val dPrj = math.sqrt(projected(a).zip(projected(b)).map { case (x, y) => val z = x - y; z * z }.sum)
      assert(math.abs(dRaw - dPrj) < 1e-6, s"distance($a,$b): $dRaw vs $dPrj")
    }
  }

  test("distributed projection equals the driver-side formula") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val m = Pca.fit(emb, "embedding", 64, 4)
    val got = Pca.project(emb, "embedding", m, "p")
      .select(col("vec_id"), col("p")).as[(Long, Seq[Double])].collect().toMap
    emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .foreach { case (id, v) =>
        val want = m.components.map { p =>
          p.indices.map(i => p(i) * (v(i).toDouble - m.mean(i))).sum
        }
        want.zip(got(id)).foreach { case (w, g) =>
          assert(math.abs(w - g) < 1e-9, s"vec $id: $w vs $g")
        }
      }
  }
}
