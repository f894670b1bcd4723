package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packing: offsets, straddling docs, zero-token docs") {
    // capacity 10: doc 1 (4 toks) [0,4), doc 2 (0 toks) at 4, doc 3
    // (8 toks) [4,12) straddles seqs 0->1, doc 5 (9 toks) [12,21)
    val df = Seq((1L, 4L), (2L, 0L), (3L, 8L), (5L, 9L)).toDF("id", "n")
    val out = Packing.assign(df, "id", "n", capacity = 10L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "tok_offset", "seq_id", "seq_offset", "seq_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 0L, 0L, 0L, 0L),
      (2L, 0L, 4L, 0L, 4L, 0L),  // zero-token doc: seq_last == seq_id
      (3L, 8L, 4L, 0L, 4L, 1L),  // straddles the seq 0 / seq 1 boundary
      (5L, 9L, 12L, 1L, 2L, 2L)))
  }

  test("two-phase prefix sum is exact: any bucket width matches the global cumsum") {
    val rnd = new scala.util.Random(7)
    // sparse, shuffled ids; skewed counts
    val rows = rnd.shuffle((0 until 500).map(i => (i * 7L + (i % 3), rnd.nextInt(400).toLong)).toList)
    val df = rows.toDF("id", "n")
    val sorted = rows.sortBy(_._1)
    val expected = sorted.map(_._1)
      .zip(sorted.map(_._2).scanLeft(0L)(_ + _).init)
    for (width <- Seq(1L, 13L, 1000L, 0L)) { // 0 = auto-derived
      val got = Packing.assign(df, "id", "n", capacity = 777L, bucketWidth = width)
        .select("doc_id", "tok_offset").as[(Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == expected, s"width=$width")
    }
  }

  test("slices: sequences fill to capacity, docs partition exactly, straddles split correctly") {
    val rnd = new scala.util.Random(11)
    val docs = (1 to 300).map(i => (i.toLong, rnd.nextInt(200).toLong)).toList
    val df = docs.toDF("id", "n")
    val cap = 128L
    val out = Packing.slices(
        Packing.assign(df, "id", "n", capacity = cap), cap)
      .select("seq_id", "doc_id", "doc_start", "doc_end", "seq_pos", "n")
      .as[(Long, Long, Long, Long, Long, Long)].collect()

    val total = docs.map(_._2).sum
    // every sequence except the last holds exactly `cap` tokens,
    // contiguously (sorted slices chain seq_pos -> seq_pos + n)
    val bySeq = out.groupBy(_._1)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (sid, rows) =>
      val sorted = rows.sortBy(_._5)
      sorted.foldLeft(0L) { case (pos, r) =>
        assert(r._5 == pos, s"seq $sid gap at ${r._5}, expected $pos"); pos + r._6
      }
      val filled = sorted.map(_._6).sum
      if (sid < lastSeq) assert(filled == cap, s"seq $sid holds $filled")
      else assert(filled == total - lastSeq * cap)
    }
    // every non-empty document's slices partition [0, n) in order
    out.groupBy(_._2).foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_._3)
      sorted.foldLeft(0L) { case (pos, r) =>
        assert(r._3 == pos, s"doc $doc slice gap"); r._4
      } match { case end => assert(end == docs.find(_._1 == doc).get._2) }
    }
    assert(out.map(_._6).sum == total, "slices must cover every token exactly once")
  }

  test("assignPerGroup: per-group streams equal independent assigns; null groups dropped") {
    val rnd = new scala.util.Random(13)
    val docs = (1 to 400).map { i =>
      (i.toLong,
        if (i % 7 == 0) null else s"g${i % 3}",
        rnd.nextInt(300).toLong)
    }
    val df = docs.toDF("id", "grp", "n")
    val out = Packing.assignPerGroup(df, "grp", "id", "n", capacity = 256L,
        bucketWidth = 13L)
      .select("grp", "doc_id", "n_tokens", "tok_offset", "seq_id", "seq_offset", "seq_last")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.forall(_._1 != null), "null groups must be dropped")
    // each group must match assign() run on that group alone
    for (g <- Seq("g0", "g1", "g2")) {
      val alone = Packing.assign(
          df.filter(col("grp") === g), "id", "n", capacity = 256L, bucketWidth = 13L)
        .select("doc_id", "n_tokens", "tok_offset", "seq_id", "seq_offset", "seq_last")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val grouped = out.filter(_._1 == g)
        .map(r => (r._2, r._3, r._4, r._5, r._6, r._7)).toSet
      assert(grouped == alone, s"group $g diverges from the solo assign")
    }
  }

  test("corpus-side window is bucket-partitioned and the offset join broadcasts") {
    val df = (1L to 100L).map(i => (i, i % 5)).toDF("id", "n")
    val plan = Packing.assign(df, "id", "n", capacity = 50L, bucketWidth = 10L)
      .queryExecution.executedPlan.toString
    // the within-bucket running sum must be partitioned by bkt (the only
    // unpartitioned window runs over the 10 bucket-total rows), and the
    // bucket-offset table must come back via broadcast, not shuffle
    assert(plan.contains("windowspecdefinition(bkt"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
}
