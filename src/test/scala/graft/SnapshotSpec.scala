package graft

import graft.operators.Snapshot

/** Planted-data semantics for the content-hash snapshot diff (the
  * registered `q_snapshot_diff` runs the same operator over a derived v2
  * of the documents table, oracle-checked).
  */
class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  test("diff classifies added / removed / modified and drops unchanged") {
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("id", "body")
    val v2 = Seq((1L, "alpha"), // unchanged — absent from output
      (2L, "beta prime"), // modified
      (4L, "delta"), // unchanged
      (5L, "epsilon")) // added
      .toDF("id", "body") // id 3 removed
    val got = Snapshot.diff(v1, v2, "id", "body")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "modified"), (3L, "removed"), (5L, "added")))
  }

  test("diff of identical snapshots is empty; of disjoint snapshots is total") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "body")
    val b = Seq((3L, "x"), (4L, "y")).toDF("id", "body")
    assert(Snapshot.diff(a, a, "id", "body").isEmpty)
    val got = Snapshot.diff(a, b, "id", "body")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "removed"), (2L, "removed"),
      (3L, "added"), (4L, "added")))
  }
}
