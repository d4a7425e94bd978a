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
    // the learned vocabulary is exactly the surviving symbols
    val v = rowsOf(Bpe.queries("text_bpe_vocab")(spark, dir))
      .map(m => m("sym") -> (m("occurrences"), m("n_word_types"))).toMap
    assert(v == Map(
      "aaaa" -> (3L, 1L), "z" -> (1L, 1L), "abcdefghijk" -> (1L, 1L),
      "l" -> (1L, 1L), "m" -> (1L, 1L), "n" -> (1L, 1L),
      "o" -> (1L, 1L), "p" -> (1L, 1L)))
  }

  /** Independent plain-Scala BPE (naive counts, greedy rewrite,
    * lexicographic ties) — no Spark, no SQL; the third implementation
    * the engine and the oracle must both agree with. */
  private def refBpe(words: Map[String, Long], n: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var segs = words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var exhausted = false
    while (out.size < n && !exhausted) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.toSeq
          .minBy { case ((a, b), cnt) => (-cnt, a, b) }
        out += ((l, r, c))
        segs = segs.map { case (w, syms) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += l + r; i += 2
            } else { b += syms(i); i += 1 }
          }
          w -> b.result()
        }
      }
    }
    (out.toSeq, segs)
  }

  test("BPE engine matches the independent reference on random run-heavy corpora") {
    var ran = 0
    (1 to 3).foreach { seed =>
      // 3-letter alphabet makes repeated-letter runs and re-merged
      // symbols common — the overlap arithmetic gets hammered
      val rnd = new scala.util.Random(1000 + seed)
      val pool = (0 until 30).map(_ =>
        (1 to 1 + rnd.nextInt(7)).map(_ => "abc"(rnd.nextInt(3))).mkString)
        .distinct
      val docs = (0 until 40).map { i =>
        val ws = (0 until 3 + rnd.nextInt(10)).map(_ => pool(rnd.nextInt(pool.size)))
        (i.toLong, ws.mkString(" "), "en")
      }
      val freq = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val (refMerges, refSegs) = refBpe(freq, Bpe.BpeMergesN)
      if (refMerges.size == Bpe.BpeMergesN) { // else the engine throws by design
        ran += 1
        val dir = writeDocsFixture(docs)
        val got = rowsOf(Bpe.queries("text_bpe_merges")(spark, dir))
          .sortBy(_("merge_rank").asInstanceOf[Long])
          .map(m => (m("lft").asInstanceOf[String],
            m("rgt").asInstanceOf[String],
            m("pair_count").asInstanceOf[Long]))
        assert(got == refMerges, s"merge sequence diverged at seed $seed")
        val gotVocab = rowsOf(Bpe.queries("text_bpe_vocab")(spark, dir))
          .map(m => m("sym") -> (m("occurrences").asInstanceOf[Long],
            m("n_word_types").asInstanceOf[Long])).toMap
        val refVocab = refSegs.toSeq
          .flatMap { case (w, syms) => syms.map(s => (s, w, freq(w))) }
          .groupBy(_._1)
          .map { case (s, xs) =>
            s -> (xs.map(x => x._3).sum, xs.map(_._2).distinct.size.toLong) }
        assert(gotVocab == refVocab, s"vocab diverged at seed $seed")
      }
    }
    assert(ran >= 2, s"only $ran random corpora sustained all merges")
  }

  // heavy: the full-recount engine re-aggregates every pair every
  // round — ~2 min of its own. The in-loop local-vs-Spark rung below
  // covers the incremental path's deep behavior each run; this rung
  // re-proves incremental ≡ quadratic-recount and runs with
  // SPARK_GRAFT_HEAVY=1 (required whenever Bpe.scala changes).
  heavyTest("incremental pair-count training equals a full recount at N=200") {
    import org.apache.spark.sql.DataFrame
    val seed = 7001
    val rnd = new scala.util.Random(seed)
    // a pool wide/long enough that ≥200 merge rounds exist before the
    // corpus fully merges (each round shrinks the summed word-type
    // symbol count by at least one)
    val pool = (0 until 90).map(_ =>
      (1 to 3 + rnd.nextInt(10)).map(_ => "abcdef"(rnd.nextInt(6))).mkString)
      .distinct
    val docs = (0 until 60).map { i =>
      (i.toLong,
        (0 until 4 + rnd.nextInt(10)).map(_ => pool(rnd.nextInt(pool.size)))
          .mkString(" "), "en")
    }
    val dir = writeDocsFixture(docs)
    // the shipped incremental engine vs the in-engine full recount,
    // far past the oracle horizon (200 rounds vs BpeMergesN = 12):
    // identical merge sequences, counts, and final segmentations
    val (mi, wi) = Bpe.trainOn(spark, Bpe.wordTypes(spark, dir), 200,
      incremental = true, strict = false)
    val (mr, wr) = Bpe.trainOn(spark, Bpe.wordTypes(spark, dir), 200,
      incremental = false, strict = false)
    assert(mi == mr, s"seed $seed: merge sequences diverged")
    assert(mi.size >= 200, s"seed $seed: want a deep chain, got ${mi.size}")
    def segs(df: DataFrame) = {
      import spark.implicits._
      df.select($"tok", $"syms").as[(String, Seq[String])].collect().toMap
    }
    assert(segs(wi) == segs(wr), s"seed $seed: segmentations diverged")
  }

  // heavy: batchK=1 degenerates to one Spark round per merge — 200
  // rounds × 2 seeds. The batched ≡ sequential property itself is
  // unchanged since round 10; run with SPARK_GRAFT_HEAVY=1 whenever
  // acceptBatch or the rewrite fold changes.
  heavyTest("batched training equals strictly-sequential training at N=200") {
    import org.apache.spark.sql.DataFrame
    def segs(df: DataFrame) = {
      import spark.implicits._
      df.select($"tok", $"syms").as[(String, Seq[String])].collect().toMap
    }
    (1 to 2).foreach { seed =>
      val rnd = new scala.util.Random(8000 + seed)
      val pool = (0 until 90).map(_ =>
        (1 to 3 + rnd.nextInt(10)).map(_ => "abcdef"(rnd.nextInt(6))).mkString)
        .distinct
      val docs = (0 until 60).map { i =>
        (i.toLong,
          (0 until 4 + rnd.nextInt(10)).map(_ => pool(rnd.nextInt(pool.size)))
            .mkString(" "), "en")
      }
      val dir = writeDocsFixture(docs)
      // batchK=64 (the shipped default) vs batchK=1 (one merge per
      // round — the definitionally-sequential reference): identical
      // merge sequences, counts, and final segmentations, proving the
      // acceptBatch compatibility rules preserve exact BPE semantics
      // while cutting the job count ~k-fold
      val (mb, wb) = Bpe.trainOn(spark, Bpe.wordTypes(spark, dir), 200,
        incremental = true, strict = false)
      val (ms, ws) = Bpe.trainOn(spark, Bpe.wordTypes(spark, dir), 200,
        incremental = true, strict = false, batchK = 1)
      assert(mb == ms, s"seed $seed: batched merge sequence diverged")
      assert(mb.size >= 200, s"seed $seed: want a deep chain, got ${mb.size}")
      assert(segs(wb) == segs(ws), s"seed $seed: segmentations diverged")
    }
  }

  test("local trainer equals the Spark loop at N=200 (merges + segmentation)") {
    import org.apache.spark.sql.DataFrame
    def segs(df: DataFrame) = {
      import spark.implicits._
      df.select($"tok", $"syms").as[(String, Seq[String])].collect().toMap
    }
    // one seed in the default loop (the second is negligible marginal
    // coverage for another ~2 min of batched-loop wall; the heavy set
    // runs the sibling properties at two seeds)
    (1 to 1).foreach { seed =>
      val rnd = new scala.util.Random(9100 + seed)
      val pool = (0 until 90).map(_ =>
        (1 to 3 + rnd.nextInt(10)).map(_ => "abcdef"(rnd.nextInt(6))).mkString)
        .distinct
      val docs = (0 until 60).map { i =>
        (i.toLong,
          (0 until 4 + rnd.nextInt(10)).map(_ => pool(rnd.nextInt(pool.size)))
            .mkString(" "), "en")
      }
      val dir = writeDocsFixture(docs)
      // the round-14 production trainer (heap + inverted index on the
      // driver) vs the distributed batched loop, far past the oracle
      // horizon: identical merge sequences, counts, and segmentations
      val (ml, wl) = Bpe.trainOnLocal(spark, Bpe.wordTypes(spark, dir), 200,
        strict = false)
      val (ms, ws) = Bpe.trainOn(spark, Bpe.wordTypes(spark, dir), 200,
        incremental = true, strict = false)
      assert(ml == ms, s"seed $seed: local merge sequence diverged")
      assert(ml.size >= 200, s"seed $seed: want a deep chain, got ${ml.size}")
      assert(segs(wl) == segs(ws), s"seed $seed: segmentations diverged")
    }
  }

  test("local trainer segments supplementary characters like the Spark loop") {
    import org.apache.spark.sql.DataFrame
    def segs(df: DataFrame) = {
      import spark.implicits._
      df.select($"tok", $"syms").as[(String, Seq[String])].collect().toMap
    }
    // 𝕏 (U+1D54F) and 😀 (U+1F600) are supplementary: one code point,
    // TWO UTF-16 chars. A per-char segmentation would split them into
    // lone surrogates and diverge from wordTypes' code-point substr.
    val docs = Seq(
      (1L, "a𝕏b a𝕏b 😀😀x 😀😀x a𝕏b ab ab ab", "en"),
      (2L, "𝕏😀 𝕏😀 b😀x ab a𝕏b", "en"))
    val dir = writeDocsFixture(docs)
    val (ml, wl) = Bpe.trainOnLocal(spark, Bpe.wordTypes(spark, dir), 6,
      strict = false)
    val (ms, ws) = Bpe.trainOn(spark, Bpe.wordTypes(spark, dir), 6,
      incremental = true, strict = false)
    assert(ml == ms, "merge sequences diverged on supplementary input")
    assert(segs(wl) == segs(ws),
      "segmentations diverged on supplementary input")
    // no lone surrogates anywhere: every sym must survive a UTF-8
    // round-trip unchanged (a lone surrogate decays to U+FFFD)
    segs(wl).values.flatten.foreach { s =>
      val rt = new String(s.getBytes("UTF-8"), "UTF-8")
      assert(rt == s, s"sym '$s' is not well-formed UTF-16")
    }
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
