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

  test("encodeWord reconstructs the word and follows the merge ranks") {
    // with no merges, encoding is the character sequence
    assert(Bpe.encodeWord("lowest", Nil) == Seq("l", "o", "w", "e", "s", "t"))
    // canonical merges from the Sennrich corpus (test above)
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est"), ("n", "ewest"), ("d", "est"))
    assert(Bpe.encodeWord("lowest", merges) == Seq("low", "est"))
    assert(Bpe.encodeWord("newest", merges) == Seq("newest"))
    assert(Bpe.encodeWord("widest", merges) == Seq("w", "i", "dest"))
    // unseen word: only applicable merges fire, concatenation reconstructs
    val enc = Bpe.encodeWord("lowering", merges)
    assert(enc.mkString == "lowering")
    assert(enc.head == "low")
  }

  test("encode counts are vocab-consistent and shrink as merges apply") {
    val docs = Seq(
      (1L, "low lower newest"),
      (2L, "widest widest low")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, 8)
    val rows = Bpe.encode(docs, merges).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // chars: doc1 = 3+5+6 = 14, doc2 = 6+6+3 = 15
    assert(rows.map(t => (t._1, t._2, t._4)).toSeq ==
      Seq((1L, 3L, 14L), (2L, 3L, 15L)))
    rows.foreach { case (_, nWords, nSub, nChars) =>
      assert(nSub >= nWords && nSub <= nChars)
    }
    // zero merges degenerate to character counts
    val noMerge = Bpe.encode(docs, Nil).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(noMerge.toSeq == Seq((1L, 14L), (2L, 15L)))
    // a doc whose text normalizes to nothing still reports a (0,0,0) row
    val withEmpty = docs.union(Seq((3L, "!!! ???")).toDF("doc_id", "text"))
    val e = Bpe.encode(withEmpty, merges).orderBy("doc_id").collect()
    assert(e.length == 3 &&
      (e(2).getLong(1), e(2).getLong(2), e(2).getLong(3)) == ((0L, 0L, 0L)))
  }
}
