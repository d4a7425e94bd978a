package graft

import graft.operators.Bpe

/** BPE vocabulary induction: hand-computed merge sequences (including
  * the greedy-overlap run case the corpus never exercises), loud
  * exhaustion, and structural properties on the real corpus. */
class BpeSpec extends SparkSpec {

  test("BPE merges match the hand computation, incl. greedy a-a runs") {
    // word types: aaaa (freq 3) exercises the l==r overlap semantics
    // (4 a's -> greedy merges positions 1 and 3 -> [aa, aa]); the
    // alphabet word feeds rounds 3..12 with count-1 ties resolved
    // lexicographically (the merged prefix starts with 'a', so it wins
    // every round)
    val dir = writeDocsFixture(Seq(
      (1L, "aaaa aaaa aaaa zabcdefghijklmnop", "en")))
    val merges = rowsOf(Bpe.queries("text_bpe_merges")(spark, dir))
      .sortBy(_("merge_rank").asInstanceOf[Long])
    val got = merges.map(m => (m("lft"), m("rgt"), m("pair_count")))
    assert(got == Seq(
      ("a", "a", 9L),          // 3 naive positions per aaaa, 3 words
      ("aa", "aa", 3L),        // the run-merge result pairs up
      ("a", "b", 1L),
      ("ab", "c", 1L),
      ("abc", "d", 1L),
      ("abcd", "e", 1L),
      ("abcde", "f", 1L),
      ("abcdef", "g", 1L),
      ("abcdefg", "h", 1L),
      ("abcdefgh", "i", 1L),
      ("abcdefghi", "j", 1L),
      ("abcdefghij", "k", 1L)))
    merges.foreach(m => assert(m("merged") ==
      m("lft").asInstanceOf[String] + m("rgt").asInstanceOf[String]))
    // encode against the learned vocab: aaaa -> 1 subtoken; the
    // alphabet word ends as [z, abcdefghijk, l, m, n, o, p] -> 7
    val e = rowsOf(Bpe.queries("text_bpe_encode")(spark, dir))
    assert(e.size == 1)
    assert(e.head("n_tokens") == 4L)
    assert(e.head("n_subtokens") == 10L)
    // positions 0..2 hold aaaa (1 sub each), position 3 the alphabet:
    // 1*1 + 2*1 + 3*1 + 4*7
    assert(e.head("sub_checksum") == 34L)
  }

  test("BPE training fails loudly when the corpus exhausts before N merges") {
    val dir = writeDocsFixture(Seq((1L, "ab ab", "en")))
    val ex = intercept[IllegalStateException] {
      Bpe.queries("text_bpe_merges")(spark, dir).collect()
    }
    assert(ex.getMessage.contains("fully merged"))
  }

  test("BPE on the corpus: counts non-increasing, merges chain") {
    val dir = sfDir("sf0.001")
    val m = rowsOf(Bpe.queries("text_bpe_merges")(spark, dir))
      .sortBy(_("merge_rank").asInstanceOf[Long])
    assert(m.size == Bpe.BpeMergesN)
    val counts = m.map(_("pair_count").asInstanceOf[Long])
    assert(counts.forall(_ > 0))
    // a merge can only create pairs no more frequent than its winner,
    // so the winning counts are non-increasing in rank
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // the chain is real: some later merge consumes an earlier product
    assert(m.exists(r => r("lft").asInstanceOf[String].length > 1 ||
      r("rgt").asInstanceOf[String].length > 1))
    val enc = rowsOf(Bpe.queries("text_bpe_encode")(spark, dir))
    assert(enc.nonEmpty)
    // merging never splits: per doc, token count <= subtoken count
    enc.foreach { r =>
      assert(r("n_subtokens").asInstanceOf[Long] >=
        r("n_tokens").asInstanceOf[Long])
    }
  }
}
