package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Phash}

/** Perceptual-hash media dedup: the dHash is computed from DECODED
  * pixels and matches an independent formula reference; the posterized
  * twin lands a few bits away (near-dup, not exact-dup, geometry); the
  * banded pair census recovers the planted twins; and the hot-band
  * guard neutralizes a degenerate all-identical corpus. */
class PhashSpec extends SparkSpec {

  /** Plain-Scala reference: luma grid straight from the generating
    * formulas, no container round-trip — catches a decoder that
    * mis-slices rows as well as a hash that samples the wrong pixel. */
  private def refDhash(text: String, variant: Int): Long = {
    val seed = Multimodal.hex32Jvm(text)
    val w = (Multimodal.hex32Jvm(text + "dw") % 24 + 8).toInt
    val h = (Multimodal.hex32Jvm(text + "dh") % 18 + 6).toInt
    def luma(gx: Int, gy: Int): Long = {
      val sx = gx.toLong * w / (Phash.Gx + 1)
      val sy = gy.toLong * h / Phash.Gy
      val base = (sy * w + sx) * 3
      Phash.Wr.toLong * Phash.essenceByte(seed, base, variant) +
        Phash.Wg.toLong * Phash.essenceByte(seed, base + 1, variant) +
        Phash.Wb.toLong * Phash.essenceByte(seed, base + 2, variant)
    }
    var hash = 0L
    for (gy <- 0 until Phash.Gy) {
      var prev = luma(0, gy)
      for (gx <- 0 until Phash.Gx) {
        val cur = luma(gx + 1, gy)
        if (cur > prev) hash |= 1L << (gy * Phash.Gx + gx)
        prev = cur
      }
    }
    hash
  }

  test("decode-path dHash equals the formula reference for both variants") {
    (0 until 20).foreach { i =>
      val text = s"phash-doc-$i"
      (0 to 1).foreach { v =>
        val d = Multimodal.decode(Phash.synthesize(text, v))
        assert(d.kind == "image")
        val (hash, _) = Phash.dhash(d.data, d.width, d.height)
        assert(hash == refDhash(text, v), s"doc $i variant $v")
      }
    }
  }

  test("posterized twin is a NEAR duplicate: close but not always identical") {
    val dists = (0 until 100).map { i =>
      val text = s"twin-$i"
      java.lang.Long.bitCount(refDhash(text, 0) ^ refDhash(text, 1))
    }
    // measured geometry (sf0.01: mean 1.9, max 10): generous determinstic
    // bounds that still pin the near-dup shape
    assert(dists.max <= 14, s"max twin hamming ${dists.max}")
    assert(dists.sum.toDouble / dists.size <= 4.0)
    assert(dists.exists(_ > 0), "posterize never flipped a bit — twin is exact")
    assert(dists.count(_ == 0) > 0, "posterize always flips — map too coarse")
  }

  test("media_phash emits two signatures per doc, checksum included") {
    val df = Phash.queries("media_phash")(spark, sfDir())
    val nDocs = graft.sources.Tables.documents(spark, sfDir()).count()
    assert(df.count() == 2 * nDocs)
    assert(df.columns.toSeq ==
      Seq("media_id", "variant", "phash", "grid_sum"))
    assert(df.filter(col("phash") < 0).count() == 0, "56-bit hash is positive")
  }

  test("pair census recovers most planted twins within the pigeonhole bound") {
    val rows = rowsOf(Phash.queries("media_phash_pairs")(spark, sfDir()))
    val nDocs = graft.sources.Tables.documents(spark, sfDir()).count()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r("hamming").asInstanceOf[Long] <= Phash.HamMax))
    val twins = rows.map(_("n_twin").asInstanceOf[Long]).sum
    assert(twins >= (nDocs * 0.85).toLong,
      s"only $twins of $nDocs twins recovered")
    // and the census is not all-exact: some twins sit at distance > 0
    val nearTwins = rows.filter(_("hamming").asInstanceOf[Long] > 0)
      .map(_("n_twin").asInstanceOf[Long]).sum
    assert(nearTwins > 0, "every recovered twin was hamming 0")
  }

  test("media contamination flags benchmark-image leaks, clean rows carry no matches") {
    val dir = writeDocsFixture(Seq(
      (17L, "leaked eval image text", "en"), // benchmark (17 % 17 == 0)
      (1L, "leaked eval image text", "en"),  // corpus: the planted leak
      (2L, "completely different words here", "en")))
    val rows = rowsOf(Phash.queries("media_contamination")(spark, dir))
      .map(r => r("media_id").asInstanceOf[Long] -> r).toMap
    assert(rows.keySet == Set(1L, 2L)) // benchmark rows are not screened
    assert(rows(1L)("verdict") == "exact")
    assert(rows(1L)("best_hamming") == 0L && rows(1L)("n_matches") == 1L)
    assert(rows(2L)("verdict") != "exact")
    // corpus run: verdict, best distance, and match count stay consistent
    val corpus = rowsOf(Phash.queries("media_contamination")(spark, sfDir()))
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val clean = r("verdict") == "clean"
      assert(clean == (r("n_matches") == 0L))
      assert(clean == (r("best_hamming") == -1L))
      if (r("verdict") == "exact") assert(r("best_hamming") == 0L)
    }
  }

  test("pair census plans a banded equi-join, never a cartesian pixel pass") {
    val plan = Phash.queries("media_phash_pairs")(spark, sfDir())
      .queryExecution.executedPlan.toString
    // candidates must meet on (band, band_key) — a CartesianProduct or a
    // BroadcastNestedLoopJoin would mean the banding degenerated to
    // all-pairs (PLANS.md "media_phash_pairs")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in:\n$plan")
    assert(plan.contains("band"), s"no band key in:\n$plan")
  }

  test("media_keep: exact min-id survivorship, banded plan, full coverage") {
    // every document gets a verdict row — the corpus gate cannot
    // silently drop anyone
    val keep = rowsOf(Phash.queries("media_keep")(spark, sfDir()))
      .map(m => m("doc_id").asInstanceOf[Long] ->
        m("media_keep").asInstanceOf[Boolean]).toMap
    val nDocs = graft.sources.Tables.documents(spark, sfDir()).count()
    assert(keep.size == nDocs)
    // keeper rule, checked exhaustively on the exact hashes: a doc is
    // dropped iff some SMALLER doc_id's variant-0 hash sits within
    // HamMax (banding recall is pigeonhole-perfect below the bound, and
    // no band is hot on this corpus)
    val sig = rowsOf(Phash.queries("media_phash")(spark, sfDir()))
      .filter(_("variant") == 0L)
      .map(m => m("media_id").asInstanceOf[Long] ->
        m("phash").asInstanceOf[Long]).toMap
    var dropped = 0
    keep.foreach { case (id, k) =>
      val expected = !sig.exists { case (j, h) =>
        j < id && java.lang.Long.bitCount(h ^ sig(id)) <= Phash.HamMax }
      assert(k == expected, s"doc $id")
      if (!k) dropped += 1
    }
    // the min-id member of every near-dup pair keeps by construction
    assert(keep.count(_._2) == nDocs - dropped)
    // plan: candidates meet on (band, band_key) — never all-pairs
    val plan = Phash.queries("media_keep")(spark, sfDir())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join in:\n$plan")
  }

  test("media_incremental screens the delta against the base, exactly") {
    val D = graft.operators.Dedup.IncrementalDeltaMod
    val rows = rowsOf(Phash.queries("media_incremental")(spark, sfDir()))
      .map(m => m("media_id").asInstanceOf[Long] -> m).toMap
    val sig = rowsOf(Phash.queries("media_phash")(spark, sfDir()))
      .filter(_("variant") == 0L)
      .map(m => m("media_id").asInstanceOf[Long] ->
        m("phash").asInstanceOf[Long]).toMap
    // one verdict per delta doc, none silently dropped
    assert(rows.keySet == sig.keySet.filter(_ % D == 0))
    // exhaustive cross-check on the exact hashes (pigeonhole recall is
    // perfect within HamMax, so banding cannot have missed a match)
    val base = sig.filter(_._1 % D != 0)
    rows.foreach { case (id, m) =>
      val nExact = base.count(_._2 == sig(id))
      val nNear = base.count { case (_, h) =>
        java.lang.Long.bitCount(h ^ sig(id)) <= Phash.HamMax }
      assert(m("n_exact") == nExact.toLong, s"doc $id exact")
      assert(m("n_near") == nNear.toLong, s"doc $id near")
      val expect = if (nExact > 0) "exact_dup"
        else if (nNear > 0) "near_dup" else "novel"
      assert(m("verdict") == expect, s"doc $id verdict")
    }
    // the screen is doing real work on this corpus: all three verdicts
    val vs = rows.values.map(_("verdict")).toSet
    assert(vs == Set("exact_dup", "near_dup", "novel"), s"got $vs")
    // plan: delta and base meet on (band, band_key) — never all-pairs
    val plan = Phash.queries("media_incremental")(spark, sfDir())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join in:\n$plan")
  }

  test("hot-band guard: an all-identical corpus yields no quadratic pair mass") {
    // 300 docs with identical text -> identical images -> every band key
    // holds 600 members > HotBandCap -> the guard drops them all
    val dir = writeDocsFixture((0L until 300L).map(i => (i, "same text", "en")))
    val out = Phash.queries("media_phash_pairs")(spark, dir)
    assert(out.count() == 0)
    // sanity: without the guard this corpus would emit C(600,2) pairs;
    // the signatures really are identical (ruling out a trivially-empty
    // join instead of a firing guard)
    val sigs = Phash.queries("media_phash")(spark, dir)
      .select("phash").distinct().count()
    assert(sigs >= 1 && sigs <= 2) // at most one per variant
  }
}
