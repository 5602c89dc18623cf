package graft

import graft.reconcile.Reconcile

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def src = Seq(
    (1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)
  ).toDF("id", "name", "amt")

  test("diff of identical frames is empty everywhere") {
    val d = Reconcile.diff(src, src, Seq("id"))
    assert(d.cellMismatches.isEmpty && d.sourceOnly.isEmpty &&
      d.targetOnly.isEmpty && d.columnSummary.isEmpty)
  }

  test("cell-level mismatch carries column name and both values") {
    val tgt = Seq((1, "alice", 10.0), (2, "bobby", 20.0), (3, "carol", 33.0))
      .toDF("id", "name", "amt")
    val d = Reconcile.diff(src, tgt, Seq("id"))
    val cells = d.cellMismatches.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(cells == Set((2, "name", "bob", "bobby"), (3, "amt", "30.0", "33.0")))
    val summary = d.columnSummary.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary == Map("name" -> 1L, "amt" -> 1L))
  }

  test("row-count summary matches the diff surfaces") {
    val tgt = Seq((1, "alice", 10.0), (2, "bobby", 20.0), (4, "dave", 40.0))
      .toDF("id", "name", "amt")
    val counts = Reconcile.diff(src, tgt, Seq("id")).rowCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(
      "source_rows" -> 3L, "target_rows" -> 3L, "common_keys" -> 2L,
      "source_only" -> 1L, "target_only" -> 1L, "mismatched_rows" -> 1L))
  }

  test("anti-join extras: keys only on one side") {
    val tgt = Seq((2, "bob", 20.0), (4, "dave", 40.0)).toDF("id", "name", "amt")
    val d = Reconcile.diff(src, tgt, Seq("id"))
    assert(d.sourceOnly.collect().map(_.getInt(0)).toSet == Set(1, 3))
    assert(d.targetOnly.collect().map(_.getInt(0)).toSet == Set(4))
  }

  test("null and empty string compare equal (reference normalization)") {
    val a = Seq((1, Option.empty[String])).toDF("id", "v")
    val b = Seq((1, Some(""))).toDF("id", "v")
    assert(Reconcile.diff(a, b, Seq("id")).cellMismatches.isEmpty)
  }

  test("columns missing on one side are ignored, not mismatched") {
    val tgt = Seq((1, "alice"), (2, "bob"), (3, "carol")).toDF("id", "name")
    val d = Reconcile.diff(src, tgt, Seq("id"))
    assert(d.cellMismatches.isEmpty)
  }
}
