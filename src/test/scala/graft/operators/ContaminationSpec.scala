package graft.operators

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val passage =
    "the quick brown fox jumps over the lazy dog while seventeen astronauts watch"

  test("planted passage overlap is detected; unrelated test docs are clean") {
    val docs = Seq(
      (1L, s"training document one contains $passage inside its body text", "train"),
      (2L, "another training document with completely independent material here", "train"),
      (10L, s"evaluation item quoting $passage almost verbatim for the probe", "test"),
      (11L, "a genuinely clean evaluation document with original phrasing only", "test"))
      .toDF("doc_id", "text", "split")
    // minShared=5: incidental single-word gram overlaps (e.g. 'document')
    // between unrelated docs stay below the threshold; the planted
    // passage shares dozens of fingerprints
    val out = Contamination.detect(docs, "doc_id", "text", "split",
        minShared = 5)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out.map(_._1) == List(10L), s"only doc 10 is contaminated: $out")
    val (_, nTrain, maxShared, sumShared) = out.head
    assert(nTrain == 1L && maxShared >= 20L && sumShared == maxShared)
  }

  test("boilerplate fingerprints shared by too many docs are df-pruned") {
    val boiler = "standard license header appears identically everywhere in corpus"
    // boilerplate present in ALL docs; with maxDf below the corpus size the
    // shared header alone must NOT flag the clean test doc
    val docs = (1L to 6L).map(i => (i, s"$boiler unique body $i $i $i", "train")) :+
      ((10L, s"$boiler but fresh evaluation content distinct from training", "test"))
    val out = Contamination.detect(docs.toDF("doc_id", "text", "split"),
      "doc_id", "text", "split", maxDf = 3)
    assert(out.isEmpty,
      "df-pruned boilerplate must not produce contamination hits")
  }

  test("semantic: paraphrase-leaked train vec flagged, eval never self-joins train") {
    // fixed two-cell codebook on the axes; train 101 is a near-copy of
    // eval 1 (cos ≈ 1, same cell), train 102 is same-cell but far,
    // train 103 lives in the other cell
    val book = Seq(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
    val eval = Seq((1L, Array(1.0f, 0.05f))).toDF("vec_id", "embedding")
    val train = Seq(
      (101L, Array(1.0f, 0.06f)),
      (102L, Array(1.0f, 0.9f)),
      (103L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Contamination.semantic(train, eval, "vec_id", "embedding",
        book, threshold = 0.99)
      .select("corpus_id", "kept").as[(Long, Int)].collect().toMap
    assert(out == Map(101L -> 0, 102L -> 1, 103L -> 1),
      s"only the paraphrase-distance leak is contaminated: $out")
    // an over-cap eval cell skips comparison — guard, not detonate
    val capped = Contamination.semantic(train, eval, "vec_id", "embedding",
        book, threshold = 0.99, maxCellSize = 0)
      .select("corpus_id", "kept").as[(Long, Int)].collect().toMap
    assert(capped.values.forall(_ == 1))
  }
}
