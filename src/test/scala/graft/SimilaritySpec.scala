package graft

import graft.operators.Similarity

/** Similarity-search semantics on a constructed embedding space. */
class SimilaritySpec extends SparkSpec {

  // vec 0 is a query (0 % 25 == 0); vec 50 likewise. 64-dim vectors.
  private def vec(f: Int => Float): Seq[Float] = (0 until 64).map(f)

  private lazy val dir = writeEmbFixture(Seq(
    (0L, vec(i => if (i == 0) 1f else 0f), 0),
    (1L, vec(i => if (i == 0) 1f else 0f), 0),   // identical to query 0
    (2L, vec(i => if (i <= 1) 1f else 0f), 0),   // cos = 1/sqrt(2)
    (3L, vec(i => if (i == 1) 1f else 0f), 1),   // orthogonal
    (4L, vec(i => if (i == 0) -1f else 0f), 1),  // opposite
    (50L, vec(i => if (i == 2) 2f else 0f), 2),
    (51L, vec(i => if (i == 2) 5f else 0f), 2))) // same direction as 50

  test("brute-force knn ranks by exact cosine") {
    val rows = rowsOf(Similarity.queries("knn_brute")(spark, dir))
    val q0 = rows.filter(_("qid") == 0L)
      .map(m => m("nid").asInstanceOf[Long] -> m("cos").asInstanceOf[Double]).toMap
    assert(math.abs(q0(1L) - 1.0) < 1e-12)
    assert(math.abs(q0(2L) - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(math.abs(q0(3L)) < 1e-12)
    // 6 candidates, k=5: the antipodal vector is the one cut
    assert(!q0.contains(4L))
    val q50 = rows.filter(_("qid") == 50L)
      .map(m => m("nid").asInstanceOf[Long] -> m("cos").asInstanceOf[Double]).toMap
    assert(math.abs(q50(51L) - 1.0) < 1e-12) // scale-invariant
  }

  test("knn returns at most k neighbors per query") {
    val rows = rowsOf(Similarity.queries("knn_brute")(spark, sfDir()))
    val counts = rows.groupBy(_("qid")).map(_._2.size)
    assert(counts.nonEmpty && counts.forall(_ == Similarity.TopK))
  }

  test("lsh buckets identical vectors together") {
    val sig = rowsOf(Similarity.queries("ann_lsh_sig")(spark, dir))
      .map(m => m("vec_id") -> m("bucket")).toMap
    assert(sig(0L) == sig(1L)) // identical vectors, identical projections
    assert(sig(50L) == sig(51L)) // same direction
    sig.values.foreach { b =>
      val v = b.asInstanceOf[Long]
      assert(v >= 0 && v < (1L << Similarity.LshBits))
    }
  }

  test("lsh candidates are a subset of brute-force with exact cosines") {
    val brute = rowsOf(Similarity.queries("knn_brute")(spark, sfDir()))
      .map(m => (m("qid"), m("nid")) -> m("cos")).toMap
    val lsh = rowsOf(Similarity.queries("ann_lsh_topk")(spark, sfDir()))
    assert(lsh.nonEmpty)
    lsh.foreach { m =>
      brute.get((m("qid"), m("nid"))).foreach { bc =>
        assert(bc == m("cos")) // same pair -> identical exact cosine
      }
    }
  }

  test("pq top-k is exact-cosine-ranked and finds the shortlisted true neighbors") {
    // on sf0.001 (50 vectors, 10 cells) the 6-probe + 50-deep shortlist
    // covers most of the corpus, so PQ's top-k must match brute-force
    // wherever the probed cells contain the true neighbors
    val pq = rowsOf(Similarity.queries("ann_pq_topk")(spark, sfDir()))
    assert(pq.nonEmpty)
    val brute = rowsOf(Similarity.queries("knn_brute")(spark, sfDir()))
      .map(m => (m("qid"), m("nid")) -> m("cos").asInstanceOf[Double]).toMap
    pq.foreach { m =>
      val exact = brute.get((m("qid"), m("nid")))
      // every PQ pair carries the EXACT cosine (the re-rank contract):
      // where brute computed the same pair, values must agree
      exact.foreach(c =>
        assert(math.abs(m("cos").asInstanceOf[Double] - c) < 1e-9))
    }
    // per-query output is a descending-ranked top-3
    pq.groupBy(_("qid")).foreach { case (_, rows) =>
      assert(rows.size <= 3)
      val cs = rows.map(_("cos").asInstanceOf[Double]).sorted(Ordering[Double].reverse)
      assert(cs == rows.sortBy(r => (-r("cos").asInstanceOf[Double])).map(_("cos")))
    }
    // the ADC shortlist keeps recall at or above the k-means rung here
    val rPq = rowsOf(Similarity.queries("ann_recall_pq")(spark, sfDir()))
      .map(_("recall").asInstanceOf[Double])
    val rKm = rowsOf(Similarity.queries("ann_recall_kmeans")(spark, sfDir()))
      .map(_("recall").asInstanceOf[Double])
    assert(rPq.sum / rPq.size >= rKm.sum / rKm.size)
  }

  test("per-label centroids count every vector") {
    val c = rowsOf(Similarity.queries("emb_centroids")(spark, sfDir()))
    assert(c.map(_("n").asInstanceOf[Long]).sum == 500L)
    c.foreach(m => assert(m("centroid_norm").asInstanceOf[Double] > 0.0))
  }

  test("recall curve: monotone in probes, cell rungs reach 1.0 at full probing") {
    val rows = rowsOf(Similarity.queries("ann_recall_curve")(spark, sfDir()))
    val byRung = rows.groupBy(_("rung").asInstanceOf[String])
    assert(byRung.keySet == Set("ivf", "kmeans", "kmeans2", "pq", "ivfpq"))
    // approximate-score rungs: a wider probe set can evict a true
    // neighbor from the fixed shortlist (pq) or the ADC top-3 (ivfpq),
    // so neither monotonicity nor terminal 1.0 holds for them
    val approxRungs = Set("pq", "ivfpq")
    byRung.foreach { case (rung, rs) =>
      assert(rs.size == Similarity.MaxProbeBudget, rung)
      val curve = rs.sortBy(_("probes").asInstanceOf[Int])
        .map(_("recall").asInstanceOf[Double])
      // widening the probe set can only add candidates, so the
      // exact-re-rank rungs are non-decreasing in the budget
      if (!approxRungs(rung))
        curve.sliding(2).foreach { case Seq(a, b) => assert(a <= b, rung) }
      assert(curve.head >= 0.0 && curve.last <= 1.0)
      // probing all 10 cells makes the candidate set the whole corpus,
      // so the exact-re-rank rungs end at perfect recall; the
      // approximate-score rungs may sit below it but not above
      if (!approxRungs(rung)) assert(curve.last == 1.0, rung)
    }
    // the code-only rung can never beat its own re-ranked shortlist:
    // ivfpq's ADC top-3 is a subset of pq's candidate shortlist
    val ivfpqC = byRung("ivfpq").sortBy(_("probes").asInstanceOf[Int])
      .map(_("recall").asInstanceOf[Double])
    val pqC = byRung("pq").sortBy(_("probes").asInstanceOf[Int])
      .map(_("recall").asInstanceOf[Double])
    ivfpqC.zip(pqC).foreach { case (i, p) => assert(i <= p) }
    val pq = byRung("pq").sortBy(_("probes").asInstanceOf[Int])
      .map(_("recall").asInstanceOf[Double])
    val km = byRung("kmeans").sortBy(_("probes").asInstanceOf[Int])
      .map(_("recall").asInstanceOf[Double])
    pq.zip(km).foreach { case (p, k) => assert(p <= k) }
  }

  test("pq distortion covers every vector with finite per-cell error") {
    val rows = rowsOf(Similarity.queries("ann_pq_distortion")(spark,
      sfDir("sf0.01")))
    assert(rows.nonEmpty)
    assert(rows.map(_("n_vecs").asInstanceOf[Long]).sum == 500L)
    rows.foreach { m =>
      val mse = m("mse_per_dim").asInstanceOf[Double]
      assert(mse >= 0.0 && java.lang.Double.isFinite(mse))
      // residuals of unit-scale embeddings: a reconstruction that threw
      // everything away would sit near the raw residual energy (~0.01+
      // per dim on this corpus); the codes must do materially better
      assert(mse < 0.05, s"cell ${m("cell")} mse $mse")
    }
  }

  test("ivfpq: residual codes beat raw codes; code-only recall bounded by re-rank") {
    // the measured case for residual encoding: same recipe, same code
    // size (m=8, K=32), raw vectors vs cell residuals — the residual
    // variant must realize a strictly lower quantization MSE
    val dist = rowsOf(Similarity.queries("ann_ivfpq_distortion")(spark, sfDir()))
      .map(m => m("variant").asInstanceOf[String] ->
        m("mse_per_dim").asInstanceOf[Double]).toMap
    assert(dist.keySet == Set("ivfpq_residual", "pq_raw"))
    assert(dist("ivfpq_residual") < dist("pq_raw"),
      s"residual ${dist("ivfpq_residual")} !< raw ${dist("pq_raw")}")
    // code-only answers: exactly 3 per query, ranked by the ADC score
    val topkDf = Similarity.queries("ann_ivfpq_topk")(spark, sfDir())
    val topk = rowsOf(topkDf)
    topk.groupBy(_("qid")).foreach { case (q, rs) =>
      assert(rs.size == 3, s"query $q")
    }
    // plan: the rung is a filter + per-query rank window over the
    // MEMOIZED ADC stream (Scan ExistingRDD) with a map-side partial
    // top-k (WindowGroupLimit) — no new corpus scan, no new join
    val plan = topkDf.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), s"must reuse the ADC memo:\n$plan")
    assert(plan.contains("WindowGroupLimit"), s"want partial top-k:\n$plan")
    assert(!plan.contains("Join"), s"no join belongs here:\n$plan")
    // skipping the exact re-rank can only lose recall: per query, the
    // ADC top-3 is a subset of the re-ranked shortlist's candidate set,
    // and a true neighbor in the shortlist always survives the re-rank
    val rIvfpq = rowsOf(Similarity.queries("ann_recall_ivfpq")(spark, sfDir()))
      .map(m => m("qid") -> m("recall").asInstanceOf[Double]).toMap
    val rPq = rowsOf(Similarity.queries("ann_recall_pq")(spark, sfDir()))
      .map(m => m("qid") -> m("recall").asInstanceOf[Double]).toMap
    assert(rIvfpq.keySet == rPq.keySet)
    rIvfpq.foreach { case (q, r) => assert(r <= rPq(q), s"query $q") }
  }

  test("matryoshka truncation: prefix shortlist + exact re-rank; curve anchors at 1.0") {
    // constructed space: all signal lives in dims 0-2, inside every
    // prefix — the 16-dim rung must reproduce the exact ranking
    val t0 = rowsOf(Similarity.queries("ann_trunc_topk")(spark, dir))
    t0.groupBy(_("qid")).foreach { case (q, rs) =>
      assert(rs.size == 3, s"query $q")
    }
    val q0 = t0.filter(_("qid") == 0L)
      .map(m => m("nid").asInstanceOf[Long] ->
        m("cos").asInstanceOf[Double]).toMap
    assert(math.abs(q0(1L) - 1.0) < 1e-12) // identical vector survives
    assert(q0.contains(2L)) // cos 1/sqrt(2) neighbor survives
    // real corpus: exactly 3 re-ranked answers per query
    rowsOf(Similarity.queries("ann_trunc_topk")(spark, sfDir()))
      .groupBy(_("qid")).foreach { case (q, rs) =>
        assert(rs.size == 3, s"query $q")
      }
    // the curve sweeps every width; the full-width row is the built-in
    // exactness anchor (prefix ranking == exact ranking at d = Dim)
    val curve = rowsOf(Similarity.queries("ann_trunc_curve")(spark, sfDir()))
    val byD = curve.map(m => m("prefix_dim").asInstanceOf[Int] -> m).toMap
    assert(byD.keySet == Similarity.TruncDims.toSet)
    assert(byD(Similarity.Dim)("recall").asInstanceOf[Double] == 1.0)
    curve.foreach { m =>
      val r = m("recall").asInstanceOf[Double]
      assert(r >= 0.0 && r <= 1.0)
    }
    // shortlist membership IS final recall at the shipped width: the
    // per-query recall rows must sum to the curve's d=16 hit count
    val hits16 = rowsOf(Similarity.queries("ann_recall_trunc")(spark, sfDir()))
      .map(_("hits").asInstanceOf[Long]).sum
    assert(hits16 == byD(Similarity.TruncDim)("hits").asInstanceOf[Long])
  }

  test("cell stats: the refined quantizer's occupancy covers the corpus " +
    "and stays balanced here") {
    val dir = sfDir("sf0.01")
    val rows = rowsOf(SparkEntry.queries("ann_cell_stats")(spark, dir))
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    assert(rows.map(_("n_members").asInstanceOf[Long]).sum === n)
    // the synthetic corpus is label-balanced, so one Lloyd round keeps
    // cells near fair share and the hot flag must NOT fire — the audit's
    // healthy-index face (the skew face is diag_heavy_hitters' job)
    rows.foreach { r =>
      val b = r("balance").asInstanceOf[Double]
      assert(b > 0.5 && b < 2.0)
      assert(r("hot") === false)
    }
  }

  test("filtered search: pre-filter stays in-label and complete; " +
    "post-filter recall collapses") {
    import spark.implicits._
    val dir = sfDir("sf0.01")
    val labels = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"label")
    val topk = SparkEntry.queries("ann_filtered_topk")(spark, dir)
    // every neighbor shares its query's label (the filter is honored)
    val crossLabel = topk
      .join(labels.select($"vec_id".as("qid"), $"label".as("ql")), "qid")
      .join(labels.select($"vec_id".as("nid"), $"label".as("nl")), "nid")
      .filter($"ql" =!= $"nl")
    assert(crossLabel.count() === 0)
    // and every query finds a full top-3 (all labels have >3 members)
    val perQ = topk.groupBy($"qid").count().select($"count").distinct()
    assert(rowsOf(perQ).map(_("count")) === Seq(3L))
    // the post-filter strategy loses real recall on this selective
    // filter (~10 labels, global top-20 shortlist): strictly below 0.95
    // mean, strictly above zero (it is not a strawman)
    val rec = rowsOf(SparkEntry.queries("ann_filtered_recall")(spark, dir))
      .map(_("recall").asInstanceOf[Double])
    val mean = rec.sum / rec.size
    assert(mean > 0.05 && mean < 0.95,
      s"post-filter mean recall $mean outside the expected collapse band")
    rec.foreach(r => assert(r >= 0.0 && r <= 1.0))
  }

  test("semantic dedup keeps each cell's first member and drops near-dups") {
    val rows = rowsOf(Similarity.queries("dedup_semantic")(spark, dir))
      .map(m => m("vec_id").asInstanceOf[Long] -> m).toMap
    assert(rows.size == 7) // every vector gets a verdict
    // each cell's minimum vec_id has no prior: kept, null max_prior_cos
    rows.values.groupBy(_("cell")).foreach { case (_, ms) =>
      val first = ms.minBy(_("vec_id").asInstanceOf[Long])
      assert(first("keep") == true && first("max_prior_cos") == null)
    }
    // identical vector 1 (dup of 0) and colinear 51 (dup of 50) drop
    assert(rows(1L)("keep") == false &&
      rows(1L)("max_prior_cos").asInstanceOf[Double] > 0.999999)
    assert(rows(51L)("keep") == false)
    // every dropped vector crossed the threshold; every kept one with a
    // prior stayed under it
    rows.values.foreach { m =>
      (m("keep"), m("max_prior_cos")) match {
        case (false, c: Double) => assert(c >= Similarity.SemDedupCos)
        case (true, c: Double) => assert(c < Similarity.SemDedupCos)
        case (true, null) => ()
        case other => fail(s"impossible verdict $other")
      }
    }
  }

  test("prototype pruning drops the floor(20%) most-central of each cell " +
    "and keeps the hard tail") {
    val rows = rowsOf(Similarity.queries("emb_prune")(spark, sfDir()))
    val byCell = rows.groupBy(_("cell"))
    assert(byCell.nonEmpty)
    var pruned = 0
    byCell.values.foreach { ms =>
      val n = ms.size
      val dropped = ms.filterNot(_("keep").asInstanceOf[Boolean])
      assert(dropped.size === n * Similarity.PrunePct / 100,
        s"prune count must be floor($n * ${Similarity.PrunePct}%)")
      // pruned = the PREFIX of the prototypicality ranking: every
      // dropped cosine >= every kept cosine (ranks are contiguous)
      if (dropped.nonEmpty) {
        val maxDroppedRk = dropped.map(_("proto_rk").asInstanceOf[Int]).max
        val minKeptRk = ms.filter(_("keep").asInstanceOf[Boolean])
          .map(_("proto_rk").asInstanceOf[Int]).min
        assert(maxDroppedRk < minKeptRk)
        val minDroppedCos = dropped
          .map(_("cos_centroid").asInstanceOf[Double]).min
        val maxKeptCos = ms.filter(_("keep").asInstanceOf[Boolean])
          .map(_("cos_centroid").asInstanceOf[Double]).max
        assert(minDroppedCos >= maxKeptCos - 1e-9)
      }
      pruned += dropped.size
    }
    assert(pruned > 0, "sf0.001 cells are large enough to prune from")
    // every vector gets exactly one verdict
    assert(rows.map(_("vec_id")).distinct.size === rows.size)
  }

  test("ivf append routes every delta into the standing index and " +
    "audits occupancy growth") {
    import spark.implicits._
    val d = sfDir()
    val rows = rowsOf(Similarity.queries("ann_ivf_append")(spark, d))
    val e = graft.sources.Tables.embeddings(spark, d)
    val nDelta = e.filter($"vec_id" % Similarity.VecDeltaMod === 0).count()
    val nBase = e.count() - nDelta
    assert(rows.map(_("n_new").asInstanceOf[Long]).sum === nDelta,
      "every delta vector lands in exactly one standing cell")
    assert(rows.map(_("n_base").asInstanceOf[Long]).sum === nBase,
      "every base vector is a member of exactly one standing cell")
    rows.foreach { r =>
      val (nb, nn) = (r("n_base").asInstanceOf[Long],
        r("n_new").asInstanceOf[Long])
      assert(r("growth_pct").asInstanceOf[Long] === nn * 100 / nb)
      if (nn == 0) assert(r("cos_new") == null)
      else {
        val c = r("cos_new").asInstanceOf[Double]
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      }
    }
    // deltas are an interleaved 1-in-5 slice of the same distribution,
    // so corpus-level growth is ~25% of the base population
    val g = rows.map(_("n_new").asInstanceOf[Long]).sum * 100 /
      rows.map(_("n_base").asInstanceOf[Long]).sum
    assert(g >= 20 && g <= 30, s"corpus growth $g% out of the 1/4 band")
  }

  test("semantic dedup curve: drops decrease in the threshold, shipped " +
    "point matches the verdict query") {
    val d = sfDir()
    val rows = rowsOf(Similarity.queries("dedup_semantic_curve")(spark, d))
      .sortBy(_("threshold").asInstanceOf[Double])
    assert(rows.map(_("threshold").asInstanceOf[Double]) ===
      Similarity.SemCurveThresholds)
    val drops = rows.map(_("n_dropped").asInstanceOf[Long])
    assert(drops.zip(drops.tail).forall { case (a, b) => b <= a },
      "raising the cosine bar can only drop fewer")
    val shippedDrops = rowsOf(
      Similarity.queries("dedup_semantic")(spark, d))
      .count(_("keep") == false).toLong
    assert(rows.find(_("threshold") == Similarity.SemDedupCos)
      .get("n_dropped") === shippedDrops)
    rows.foreach { r =>
      assert(r("drop_pct").asInstanceOf[Long] ===
        r("n_dropped").asInstanceOf[Long] * 100 /
          r("n_vecs").asInstanceOf[Long])
    }
  }

  test("stale-index recall covers every query and stays a sane rung") {
    val d = sfDir()
    val stale = rowsOf(Similarity.queries("ann_recall_stale")(spark, d))
      .map(r => r("qid").asInstanceOf[Long] ->
        r("recall").asInstanceOf[Double]).toMap
    val fresh = rowsOf(Similarity.queries("ann_recall_ivf")(spark, d))
      .map(r => r("qid").asInstanceOf[Long] ->
        r("recall").asInstanceOf[Double]).toMap
    assert(stale.keySet === fresh.keySet,
      "both curves measure the same query set")
    stale.values.foreach(r => assert(r >= 0.0 && r <= 1.0))
    // probing a coarse quantizer still finds most true neighbors even
    // with centroids trained before 1/5 of the corpus arrived
    val mean = stale.values.sum / stale.size
    assert(mean > 0.3, s"stale mean recall $mean collapsed")
  }

  test("multi-LSH signature width is occupancy-adaptive with exact integer boundaries") {
    // smallest b in [6,16] with 2^b * 64 >= n — integer logic, so the
    // engine and the oracle SQL (the same min-over-range) can never
    // disagree at a power-of-two boundary the way float log2 could
    assert(Similarity.adaptiveBits(0L) == 6)
    assert(Similarity.adaptiveBits(200L) == 6)    // sf0.01 gate: unchanged
    assert(Similarity.adaptiveBits(2000L) == 6)   // sf0.1 gate: unchanged
    assert(Similarity.adaptiveBits(4096L) == 6)   // 2^6 * 64 exactly
    assert(Similarity.adaptiveBits(4097L) == 7)
    assert(Similarity.adaptiveBits(20000L) == 9)  // derived sf1
    assert(Similarity.adaptiveBits(100000000L) == 16) // clamped at the cap
    // per-bucket occupancy n / 2^bits stays within [target/2, target]
    // across the unclamped range — the invariant that keeps the banded
    // self-join's candidate volume per vector scale-free
    Seq(10000L, 100000L, 1000000L, 4000000L).foreach { n =>
      val occ = n.toDouble / (1L << Similarity.adaptiveBits(n))
      assert(occ <= Similarity.EmbBucketTarget, s"n=$n occupancy $occ")
      assert(occ > Similarity.EmbBucketTarget / 2.0, s"n=$n over-split: $occ")
    }
  }

  test("dim stats: rank permutes the dims, cumulative share climbs to exactly 1000") {
    val rows = rowsOf(Similarity.queries("emb_dim_stats")(spark, sfDir("sf0.01")))
    assert(rows.size == 64)
    assert(rows.map(_("d")).toSet == (1L to 64L).toSet)
    assert(rows.map(_("var_rank")).toSet == (1L to 64L).map(_.toInt).toSet)
    assert(rows.map(_("n")).distinct.size == 1, "every dim sees every vector")
    rows.foreach(m =>
      assert(m("variance").asInstanceOf[Double] >= 0.0))
    val byRank = rows.sortBy(_("var_rank").asInstanceOf[Int])
    // variance non-increasing down the rank; share non-decreasing up to
    // exactly 1000 permille (integer arithmetic closes the sum)
    val vs = byRank.map(_("variance").asInstanceOf[Double])
    assert(vs == vs.sorted.reverse)
    val shares = byRank.map(_("cum_share_permille").asInstanceOf[Long])
    assert(shares == shares.sorted)
    assert(shares.last == 1000L)
  }

  test("mmr prefers a diverse candidate over a redundant higher-cosine one") {
    // q = e1; A (id 1) cos 0.90; A' (id 2) cos 0.89 but nearly identical
    // to A (cos ~0.9997); B (id 3) cos 0.80 but diverse (cos(A,B) = 0.72).
    // Plain top-3 is A, A', B; MMR at lambda 0.7 must pick B second:
    // score(A') = .7*.89 - .3*.9997 = 0.323 < score(B) = .7*.8 - .3*.72 = 0.344
    val mdir = writeEmbFixture(Seq(
      (0L, vec(i => if (i == 0) 1f else 0f), 0),
      (1L, vec(i => if (i == 0) 0.9f else if (i == 1) 0.43589f else 0f), 0),
      (2L, vec(i => if (i == 0) 0.89f else if (i == 1) 0.45596f else 0f), 0),
      (3L, vec(i => if (i == 0) 0.8f else if (i == 2) 0.6f else 0f), 1)))
    val rows = rowsOf(Similarity.queries("ann_mmr_topk")(spark, mdir))
      .filter(_("qid") == 0L)
      .sortBy(_("step").asInstanceOf[Int])
    assert(rows.map(_("nid")) == Seq(1L, 3L, 2L), "greedy order must be A, B, A'")
    assert(rows.head("mmr") == null, "first pick has no diversity term")
    rows.tail.foreach(r => assert(r("mmr") != null))
  }

  test("mmr on the corpus: first pick is the knn top-1, selections distinct") {
    val knn = rowsOf(Similarity.queries("knn_brute")(spark, sfDir()))
    val top1 = knn.groupBy(_("qid").asInstanceOf[Long]).map { case (q, rs) =>
      val best = rs.maxBy(r =>
        (r("cos").asInstanceOf[Double], -r("nid").asInstanceOf[Long]))
      q -> best("nid")
    }
    val mmr = rowsOf(Similarity.queries("ann_mmr_topk")(spark, sfDir()))
    mmr.groupBy(_("qid").asInstanceOf[Long]).foreach { case (q, rs) =>
      assert(rs.size == Similarity.TopK)
      assert(rs.map(_("nid")).distinct.size == Similarity.TopK)
      val first = rs.minBy(r => r("step").asInstanceOf[Int])
      assert(first("nid") == top1(q))
    }
  }
}
