package graft

import graft.llm.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges reproduces the canonical BPE merge sequence with deterministic ties") {
    // the Sennrich et al. example corpus: low×5 lower×2 newest×6 widest×3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    // expected sequence computed by an independent Python implementation
    val got = Bpe.learnMerges(docs, 8).map(m => (m.merge_rank, m.left, m.right, m.pair_freq))
    assert(got == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L), (4, "lo", "w", 7L),
      (5, "e", "w", 6L), (6, "ew", "est", 6L), (7, "n", "ewest", 6L), (8, "d", "est", 3L)))
  }

  test("learnMerges stops early when no pairs remain") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(docs, 10).isEmpty) // all words single-char: no pairs
  }
}
