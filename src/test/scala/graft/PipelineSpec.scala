package graft

import graft.operators.{Dedup, Pipeline}
import org.apache.spark.sql.functions.{concat, lit}

/** Training-set assembly semantics: deterministic sampling, the composed
  * quality gate, and benchmark-contamination detection. */
class PipelineSpec extends SparkSpec {

  test("stratified sample is deterministic and respects per-source rates") {
    val a = rowsOf(Pipeline.queries("sample_stratified")(spark, sfDir()))
    val b = rowsOf(Pipeline.queries("sample_stratified")(spark, sfDir()))
    assert(a.nonEmpty)
    // reproducibility: the keep decision is pure hash, not RNG
    assert(a.map(_("doc_id")).toSet == b.map(_("doc_id")).toSet)
    a.foreach { m =>
      val rate = m("rate").asInstanceOf[Long]
      val kh = m("keep_hash").asInstanceOf[Long]
      assert(rate >= Pipeline.RateBase &&
        rate < Pipeline.RateBase + Pipeline.RateSpan)
      assert(kh < rate) // every kept row actually passed its gate
    }
  }

  test("quality gate keeps only dedup keepers that pass language and quality") {
    val dup = "the quick brown fox jumps over the lazy dog and runs away fast"
    val d = writeDocsFixture(Seq(
      (1L, dup, "en"),
      (2L, dup, "en"),                                   // dup of 1: dropped
      (3L, "der hund und die katze und das haus und so", "de"), // non-en
      (4L, "a b", "en"),                                 // too short: low quality
      (5L, "the distributed computation frameworks optimize partitioned " +
        "aggregation pipelines across heterogeneous clusters while " +
        "storage layers maintain consistent snapshots during concurrent " +
        "modifications", "en")))
    val kept = rowsOf(Pipeline.queries("docs_quality_gate")(spark, d))
      .map(_("doc_id").asInstanceOf[Long]).toSet
    assert(kept.contains(1L) && !kept.contains(2L)) // keeper = min doc_id
    assert(!kept.contains(3L))
    assert(kept.contains(5L))
  }

  test("length stats: percentiles are monotone and bracket the per-language extremes") {
    val rows = rowsOf(graft.operators.Pipeline.queries("docs_length_stats")(
      spark, sfDir("sf0.01")))
    assert(rows.nonEmpty)
    val total = rows.map(_("n_docs").asInstanceOf[Long]).sum
    assert(total == 500L) // every document profiled exactly once
    rows.foreach { m =>
      val ps = Seq("p25", "p50", "p75", "p95")
        .map(c => m(c).asInstanceOf[Double])
      assert(ps == ps.sorted, s"percentiles not monotone: $ps")
      val avg = m("avg_chars").asInstanceOf[Double]
      assert(avg >= ps.head / 10 && avg > 0)
    }
  }

  test("histogram quantile sketch: within-bound estimates, one row per (lang, q)") {
    val rows = rowsOf(graft.operators.Pipeline.queries("docs_length_hist")(
      spark, sfDir("sf0.01")))
    // one estimate per (lang, quantile) — the CDF-inversion filter must
    // select exactly one covering bin
    assert(rows.map(m => (m("lang"), m("q"))).distinct.size == rows.size)
    assert(rows.size == 5 * Pipeline.LengthPcts.size)
    // measured error bound: the interpolated estimate sits in the covering
    // bin; quantile_cont's rank convention can land one bin over, so the
    // honest bound is two global bin widths
    val docs = graft.sources.Tables.documents(spark, sfDir("sf0.01"))
    val Seq(lo, hi) = rowsOf(docs.agg(
      org.apache.spark.sql.functions.min("n_chars").as("lo"),
      org.apache.spark.sql.functions.max("n_chars").as("hi")))
      .flatMap(m => Seq(m("lo"), m("hi"))).map(_.asInstanceOf[Number].doubleValue)
    val w = (hi - lo) / Pipeline.HistB
    rows.foreach { m =>
      val err = m("abs_err").asInstanceOf[Double]
      assert(err <= 2 * w + 1e-6,
        s"lang=${m("lang")} q=${m("q")} err=$err exceeds 2 bins (${2 * w})")
    }
    // estimates are monotone in q within each lang, like true quantiles
    rows.groupBy(_("lang")).values.foreach { g =>
      val byQ = g.sortBy(_("q").asInstanceOf[Double])
        .map(_("est").asInstanceOf[Double])
      assert(byQ == byQ.sorted, s"non-monotone estimates: $byQ")
    }
  }

  test("sequence packing: contiguous per-source token stream cut at the budget") {
    val rows = rowsOf(Pipeline.queries("pipeline_pack")(spark, sfDir("sf0.01")))
    assert(rows.size == 500)
    val bySource = rows.groupBy(_("source"))
    bySource.values.foreach { docs =>
      val ordered = docs.sortBy(_("doc_id").asInstanceOf[Long])
      // reconstruct the concatenated stream: each doc starts exactly where
      // the previous one ended
      var cum = 0L
      ordered.foreach { m =>
        val seq = m("seq_id").asInstanceOf[Long]
        val off = m("tok_offset").asInstanceOf[Long]
        assert(off >= 0 && off < Pipeline.PackBudget)
        assert(seq * Pipeline.PackBudget + off == cum,
          s"doc ${m("doc_id")} not contiguous in its source stream")
        cum += m("n_tokens").asInstanceOf[Number].longValue
      }
    }
  }

  test("contamination curve: monotone in shingle width, n=3 row matches " +
    "the shipped screen") {
    val rows = rowsOf(Pipeline.queries("bench_contamination_curve")(
      spark, sfDir("sf0.01"))).sortBy(_("shingle_n").asInstanceOf[Int])
    assert(rows.map(_("shingle_n")) === Pipeline.ContamCurveNs)
    // stricter shingles can only flag fewer docs
    val counts = rows.map(_("n_contaminated").asInstanceOf[Long])
    assert(counts === counts.sorted.reverse)
    // cross-view: the curve's n=3 point IS bench_contamination's verdict
    val n3 = rows.find(_("shingle_n") == 3).get
    val screen = rowsOf(Pipeline.queries("bench_contamination")(
      spark, sfDir("sf0.01")))
    assert(n3("n_contaminated") === screen.size.toLong)
    assert(n3("total_shared") ===
      screen.map(_("n_shared").asInstanceOf[Long]).sum)
    // and the curve discriminates on this corpus: bigrams over-flag,
    // the shipped width flags a strict subset
    assert(counts.head > counts(1))
  }

  test("greedy no-split packing: docs never span, greedy boundary is tight, " +
    "waste reconciles") {
    val rows = rowsOf(Pipeline.queries("pipeline_pack_greedy")(spark, sfDir("sf0.01")))
    assert(rows.size == 500)
    rows.groupBy(_("source")).values.foreach { docs =>
      val ordered = docs.sortBy(_("doc_id").asInstanceOf[Long])
      var seq = 0L; var fill = 0L
      ordered.foreach { m =>
        val n = m("n_tokens").asInstanceOf[Number].longValue
        // replay the greedy rule independently: boundary exactly where
        // the next doc stops fitting, never earlier, never later
        if (fill > 0 && fill + n > Pipeline.PackBudget) { seq += 1; fill = 0 }
        assert(m("seq_id") == seq && m("tok_offset") == fill,
          s"doc ${m("doc_id")} deviates from greedy first-fit")
        fill += n
        // the no-split contract: a doc fits its sequence or owns it
        val off = m("tok_offset").asInstanceOf[Long]
        assert(off + n <= Pipeline.PackBudget || off == 0L)
      }
    }
    val waste = rowsOf(Pipeline.queries("pipeline_pack_waste")(spark, sfDir("sf0.01")))
    waste.foreach { w =>
      assert(w("n_tokens").asInstanceOf[Long] +
        w("padding").asInstanceOf[Long] === w("capacity").asInstanceOf[Long])
      val f = w("fill_pct").asInstanceOf[Double]
      assert(f > 0.0 && f <= 1.0)
    }
    assert(waste.map(_("n_docs").asInstanceOf[Long]).sum === 500L)
  }

  test("greedy no-split packing: an oversized doc takes its own sequence, " +
    "never an empty one") {
    // 300 words > the 256 budget; neighbors pack around it
    val d = writeDocsFixture(Seq(
      (1L, "a b c", "en"),
      (2L, Seq.fill(300)("w").mkString(" "), "en"),
      (3L, "d e", "en"),
      (4L, "f g h", "en")))
    val rows = rowsOf(Pipeline.queries("pipeline_pack_greedy")(spark, d))
      .map(r => r("doc_id").asInstanceOf[Long] ->
        (r("seq_id").asInstanceOf[Long], r("tok_offset").asInstanceOf[Long])).toMap
    assert(rows(1L) === ((0L, 0L)))   // opens seq 0
    assert(rows(2L) === ((1L, 0L)))   // oversized: own sequence, offset 0
    assert(rows(3L) === ((2L, 0L)))   // must reopen: seq 1 is over budget
    assert(rows(4L) === ((2L, 2L)))   // packs behind doc 3
  }

  test("mixture accounting: token shares partition the corpus") {
    val rows = rowsOf(Pipeline.queries("pipeline_mixture")(spark, sfDir("sf0.01")))
    assert(rows.nonEmpty)
    assert(rows.map(_("n_docs").asInstanceOf[Long]).sum == 500L)
    val shareSum = rows.map(_("token_share").asInstanceOf[Double]).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
  }

  test("keep-best resolution: one highest-quality survivor per duplicate cluster") {
    val rows = rowsOf(Pipeline.queries("dedup_keep_best")(spark, sfDir("sf0.01")))
    assert(rows.nonEmpty)
    rows.groupBy(_("canon")).values.foreach { cluster =>
      val keepers = cluster.filter(_("keep").asInstanceOf[Boolean])
      assert(keepers.size == 1, "exactly one survivor per cluster")
      val best = cluster.map(_("quality").asInstanceOf[Double]).max
      assert(keepers.head("quality").asInstanceOf[Double] == best)
    }
    // resolution covers exactly the clustered nodes
    val clustered = rowsOf(
      graft.operators.Dedup.queries("dedup_clusters")(spark, sfDir("sf0.01")))
      .map(_("doc_id")).toSet
    assert(rows.map(_("doc_id")).toSet == clustered)
  }

  test("deterministic shuffle: reproducible, one position per doc, sources interleave") {
    val rows = rowsOf(Pipeline.queries("pipeline_shuffle")(spark, sfDir("sf0.01")))
    assert(rows.size == 500)
    // every document takes exactly one distinct global position
    val ords = rows.map(_("global_ord").asInstanceOf[Long])
    assert(ords.distinct.size == rows.size)
    // reproducible: a second run yields the identical order
    val again = rowsOf(Pipeline.queries("pipeline_shuffle")(spark, sfDir("sf0.01")))
      .map(m => m("doc_id") -> m("global_ord")).toMap
    rows.foreach(m => assert(again(m("doc_id")) == m("global_ord")))
    // round-robin interleave: the first position of each source lands in
    // the first n_src slots of the global order (src_ord=0 -> global_ord
    // = src_idx), so a reader's first |sources| docs span every source
    val nSrc = rows.map(_("source")).distinct.size
    val firstSlots = rows.filter(_("src_ord").asInstanceOf[Long] == 0L)
      .map(_("global_ord").asInstanceOf[Long]).sorted
    assert(firstSlots == (0L until nSrc.toLong).toList)
    // within a source the order follows the seeded hash, not doc_id
    val bySrc = rows.groupBy(_("source")).head._2
      .sortBy(_("src_ord").asInstanceOf[Long])
    assert(bySrc.map(_("doc_id").asInstanceOf[Long]) !=
      bySrc.map(_("doc_id").asInstanceOf[Long]).sorted)
  }

  test("shard assignment: global sequence renumbering cuts on fixed token budgets") {
    val rows = rowsOf(Pipeline.queries("pipeline_shard")(spark, sfDir("sf0.01")))
    assert(rows.nonEmpty)
    // global_seq is unique and source-contiguous: each source occupies
    // the interval [base, base + n_seqs)
    val gseqs = rows.map(_("global_seq").asInstanceOf[Long])
    assert(gseqs.distinct.size == rows.size)
    rows.groupBy(_("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_("seq_id").asInstanceOf[Long])
      val base = sorted.head("global_seq").asInstanceOf[Long] -
        sorted.head("seq_id").asInstanceOf[Long]
      sorted.foreach(r => assert(r("global_seq").asInstanceOf[Long] ==
        base + r("seq_id").asInstanceOf[Long]))
    }
    // shards cut every ShardTokens/PackBudget sequences of the global stream
    val perShard = Pipeline.ShardTokens / Pipeline.PackBudget
    rows.foreach { r =>
      assert(r("shard_id").asInstanceOf[Long] ==
        r("global_seq").asInstanceOf[Long] / perShard)
    }
    // the shard table accounts for every packed document
    val packed = rowsOf(Pipeline.queries("pipeline_pack")(spark, sfDir("sf0.01")))
    assert(rows.map(_("n_docs").asInstanceOf[Long]).sum == packed.size)
  }

  test("fractional upsampling: reproducible copies tracking the source weight") {
    val rows = rowsOf(Pipeline.queries("pipeline_upsample")(spark, sfDir("sf0.01")))
    assert(rows.nonEmpty)
    // per doc: copy_idx is dense 0..n_copies-1 and n_copies is within
    // the integer envelope of the weight
    rows.groupBy(_("doc_id")).foreach { case (_, copies) =>
      val n = copies.head("n_copies").asInstanceOf[Long]
      val w = copies.head("weight").asInstanceOf[Double]
      assert(copies.map(_("copy_idx").asInstanceOf[Long]).sorted ==
        (0L until n).toList)
      assert(n == math.floor(w).toLong || n == math.floor(w).toLong + 1)
    }
    // per source: mean copies converges on the weight (hash-Bernoulli
    // fractional part over ~100+ docs)
    rows.groupBy(_("source")).foreach { case (_, rs) =>
      val perDoc = rs.groupBy(_("doc_id")).view
        .mapValues(_.head("n_copies").asInstanceOf[Long].toDouble).values.toSeq
      val w = rs.head("weight").asInstanceOf[Double]
      // docs with n_copies = 0 are absent from the output; reconstruct
      // the denominator from the corpus source counts
      val total = graft.sources.Tables.documents(spark, sfDir("sf0.01"))
        .filter(org.apache.spark.sql.functions.col("source") === rs.head("source"))
        .count()
      val mean = perDoc.sum / total
      assert(math.abs(mean - w) < 0.25, s"mean $mean vs weight $w")
    }
    // reproducible: a re-run yields identical copies
    val again = rowsOf(Pipeline.queries("pipeline_upsample")(spark, sfDir("sf0.01")))
    assert(again.map(m => (m("doc_id"), m("copy_idx"))).toSet ==
      rows.map(m => (m("doc_id"), m("copy_idx"))).toSet)
  }

  test("quota sample: exactly min(quota, |source|) docs per source, shuffle-ranked") {
    val rows = rowsOf(Pipeline.queries("sample_quota")(spark, sfDir("sf0.01")))
    val bySrc = rows.groupBy(_("source"))
    assert(bySrc.size == 20) // every source represented
    bySrc.values.foreach { docs =>
      assert(docs.size == Pipeline.QuotaPerSource) // sf0.01: 25 docs/source
      val ranks = docs.map(_("sample_rank").asInstanceOf[Long]).sorted
      assert(ranks == (0L until Pipeline.QuotaPerSource).toList)
    }
    // reproducible and consistent with the training-order shuffle
    val shuffled = rowsOf(Pipeline.queries("pipeline_shuffle")(spark, sfDir("sf0.01")))
      .filter(_("src_ord").asInstanceOf[Long] < Pipeline.QuotaPerSource)
      .map(_("doc_id")).toSet
    assert(rows.map(_("doc_id")).toSet == shuffled)
  }

  test("temperature mixture: sqrt-weighted quotas, exact total, flatter than proportional") {
    val rows = rowsOf(Pipeline.queries("sample_temperature")(spark, sfDir("sf0.01")))
    val bySrc = rows.groupBy(_("source").asInstanceOf[String])
    // exact-size apportionment: picks sum to max(n_total div 5, 1)
    val nTotal = graft.sources.Tables.documents(spark, sfDir("sf0.01")).count()
    assert(rows.size == math.max(nTotal / Pipeline.TempSampleDiv, 1L))
    bySrc.foreach { case (_, docs) =>
      // per-source picks match the advertised quota and are the shuffle
      // rank's prefix (uniform without replacement within source)
      val quota = docs.head("quota").asInstanceOf[Long]
      assert(docs.size == quota)
      assert(docs.map(_("sample_rank").asInstanceOf[Long]).sorted ==
        (0L until quota).toList)
    }
    // integer weights really are floor(sqrt(n * scale))
    bySrc.values.map(_.head).foreach { r =>
      val n = r("n_docs").asInstanceOf[Long]
      assert(r("weight") ==
        math.floor(math.sqrt(n.toDouble * Pipeline.TempWeightScale)).toLong)
    }
    // temperature semantics vs a skewed corpus: on the 90%-skew fixture
    // the mega source gets LESS than its proportional share and every
    // small source more (tau = 1/2 flattens), while shares stay ordered
    // by size (tau > 0 does not invert)
    val skewRows = rowsOf(Pipeline.queries("sample_temperature")(spark, skewFixtureDir))
    val skewBySrc = skewRows.groupBy(_("source").asInstanceOf[String])
      .map { case (s, docs) =>
        (s, docs.head("n_docs").asInstanceOf[Long], docs.size.toLong)
      }.toSeq
    val total = skewRows.size.toLong
    val nSkew = skewBySrc.map(_._2).sum
    skewBySrc.foreach { case (_, n, picks) =>
      val proportional = n.toDouble / nSkew
      val share = picks.toDouble / total
      if (proportional > 0.5) assert(share < proportional)
      else assert(share >= proportional * 0.999)
    }
  }

  /** 90%-skew corpus shared with SkewSpec's shape: one mega source. */
  private lazy val skewFixtureDir: String =
    writeDocsFixtureWithSources(
      (0L until 450L).map(i => (i, s"mega doc $i words", "mega")) ++
        (450L until 500L).map(i => (i, s"tail doc $i", s"tail${i % 5}")))

  private def writeDocsFixtureWithSources(
      rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("curriculum phases partition the kept corpus by quality quartile") {
    val rows = rowsOf(Pipeline.queries("pipeline_curriculum")(spark, sfDir("sf0.01")))
    val kept = rowsOf(Pipeline.queries("pipeline_corpus")(spark, sfDir("sf0.01")))
      .filter(_("keep") == true).map(_("doc_id")).toSet
    // exactly the kept docs get a phase
    assert(rows.map(_("doc_id")).toSet == kept && rows.nonEmpty)
    val byPhase = rows.groupBy(_("phase").asInstanceOf[Int])
    assert(byPhase.keySet == Set(0, 1, 2, 3), s"phases ${byPhase.keySet}")
    // phase quality ranges are ordered: every doc in phase i scores at
    // most every doc in phase i+1 (boundary ties land in the upper phase)
    (0 to 2).foreach { i =>
      val hi = byPhase(i).map(_("quality").asInstanceOf[Double]).max
      val lo = byPhase(i + 1).map(_("quality").asInstanceOf[Double]).min
      assert(hi <= lo, s"phase $i max $hi > phase ${i + 1} min $lo")
    }
    // quartiles: no phase holds more than half the corpus (sanity, not
    // exact counts — thresholds are value-based, ties cluster)
    byPhase.values.foreach(p => assert(p.size <= rows.size / 2 + 1))
  }

  test("shard manifest reconciles with the packed corpus") {
    val man = rowsOf(Pipeline.queries("pipeline_manifest")(spark, sfDir("sf0.01")))
    val packed = rowsOf(Pipeline.queries("pipeline_pack")(spark, sfDir("sf0.01")))
    val fp = rowsOf(graft.operators.TextAnalysis
      .queries("text_fingerprint")(spark, sfDir("sf0.01")))
      .map(m => m("doc_id") -> m("fingerprint").asInstanceOf[Long]).toMap
    // every packed document is attributed to exactly one shard
    assert(man.map(_("n_docs").asInstanceOf[Long]).sum == packed.size)
    assert(man.map(_("n_tokens").asInstanceOf[Long]).sum ==
      packed.map(_("n_tokens").asInstanceOf[Number].longValue).sum)
    // the checksum is the exact fingerprint sum a reader would recompute
    assert(man.map(_("fp_checksum").asInstanceOf[Long]).sum ==
      packed.map(m => fp(m("doc_id"))).sum)
    assert(man.size > 1, "want multiple shards at sf0.01")
  }

  test("corpus verdict: token-less documents still get an audit row") {
    val d = writeDocsFixture(Seq(
      (1L, "the quick brown fox jumps over the lazy dog runs", "en"),
      (2L, "   ", "en"), // whitespace-only: no tokens, no gram stream
      (3L, "", "en")))
    val v = rowsOf(Pipeline.queries("pipeline_corpus")(spark, d))
      .map(m => m("doc_id") -> m).toMap
    // the audit table covers EVERY ingested document — a doc the
    // repetition/quality gates cannot score must fail visibly, not
    // vanish from the verdict frame
    assert(v.keySet == Set(1L, 2L, 3L))
    Seq(2L, 3L).foreach { id =>
      assert(v(id)("keep") == false && v(id)("repetitive") == false &&
        v(id)("quality_ok") == false, s"doc $id: ${v(id)}")
    }
    assert(v(1L)("quality_ok") == true)
  }

  test("corpus verdicts compose the gates; funnel attrition is monotone") {
    val v = rowsOf(Pipeline.queries("pipeline_corpus")(spark, sfDir("sf0.01")))
    assert(v.size == 500) // one verdict per document, none silently dropped
    // keep is exactly the conjunction of its printed reasons
    v.foreach { m =>
      val expect = m("lang_ok") == true && m("quality_ok") == true &&
        m("classifier_ok") == true &&
        m("exact_keeper") == true && m("is_bench") == false &&
        m("media_bench") == false &&
        m("contaminated") == false && m("neardup_keep") == true &&
        m("media_keep") == true && m("media_contam") == false &&
        m("repetitive") == false
      assert(m("keep") == expect, s"inconsistent verdict $m")
    }
    // the media gate columns are exactly the standalone phash verdicts
    val mk = rowsOf(graft.operators.Phash
      .queries("media_keep")(spark, sfDir("sf0.01")))
      .map(m => m("doc_id") -> m("media_keep")).toMap
    val mc = rowsOf(graft.operators.Phash
      .queries("media_contamination")(spark, sfDir("sf0.01")))
      .map(m => m("media_id") -> (m("verdict") != "clean")).toMap
    v.foreach { m =>
      assert(m("media_keep") == mk(m("doc_id")), s"media_keep ${m("doc_id")}")
      assert(m("media_contam") ==
        mc.getOrElse(m("doc_id"), false), s"media_contam ${m("doc_id")}")
    }
    // the first three gates reproduce docs_quality_gate's selection
    val gate = rowsOf(
      Pipeline.queries("docs_quality_gate")(spark, sfDir("sf0.01")))
      .map(_("doc_id")).toSet
    val firstThree = v.filter(m => m("lang_ok") == true &&
      m("quality_ok") == true && m("exact_keeper") == true)
      .map(_("doc_id")).toSet
    assert(firstThree == gate)
    // both verdicts occur and the funnel narrows monotonically
    assert(v.exists(_("keep") == true) && v.exists(_("keep") == false))
    // plan shape: the verdict join chain never degenerates into a
    // cartesian/nested-loop product, and the funnel re-reads the
    // memoized verdict frame instead of re-running any gate
    val fdf = Pipeline.queries("pipeline_funnel")(spark, sfDir("sf0.01"))
    val fplan = fdf.queryExecution.executedPlan.toString
    assert(fplan.contains("ExistingRDD"), "funnel must read the memoized verdicts")
    assert(!fplan.contains("CartesianProduct") &&
      !fplan.contains("BroadcastNestedLoopJoin"))
    val f = rowsOf(fdf).head
    val seq = Seq("n_total", "n_lang", "n_quality", "n_classifier",
      "n_exact", "n_bench", "n_media_bench",
      "n_contam", "n_neardup", "n_media_dup", "n_media_contam",
      "n_keep").map(f(_).asInstanceOf[Long])
    seq.sliding(2).foreach { case Seq(a, b) => assert(a >= b, seq) }
    assert(seq.head == 500 && seq.last == v.count(_("keep") == true))
  }

  test("delta admission composes the gates with both incremental screens") {
    val rows = rowsOf(
      Pipeline.queries("pipeline_delta_admit")(spark, sfDir("sf0.01")))
      .map(m => m("doc_id").asInstanceOf[Long] -> m).toMap
    val D = graft.operators.Dedup.IncrementalDeltaMod
    // one admission row per delta doc
    assert(rows.nonEmpty && rows.keySet.forall(_ % D == 0))
    assert(rows.size * D >= 500) // the whole delta split is covered
    // admit is exactly the printed conjunction — including the holdout
    // and contamination gates the batch verdict applies
    rows.values.foreach { m =>
      val expect = m("lang_ok") == true && m("quality_ok") == true &&
        m("classifier_ok") == true &&
        m("is_bench") == false && m("media_bench") == false &&
        m("contaminated") == false && m("media_contam") == false &&
        m("text_verdict") == "novel" && m("media_verdict") == "novel"
      assert(m("admit") == expect, s"inconsistent admission $m")
    }
    // the incremental path cannot admit a doc the batch verdict rejects
    // at a shared gate: every admitted delta doc passes the SAME
    // lang/quality/classifier/holdout/contamination columns there
    val corpus = rowsOf(
      Pipeline.queries("pipeline_corpus")(spark, sfDir("sf0.01")))
      .map(m => m("doc_id").asInstanceOf[Long] -> m).toMap
    rows.values.filter(_("admit") == true).foreach { m =>
      val c = corpus(m("doc_id").asInstanceOf[Long])
      Seq("lang_ok", "quality_ok", "classifier_ok").foreach(g =>
        assert(c(g) == true, s"admitted doc fails corpus $g: $m"))
      Seq("is_bench", "media_bench", "contaminated", "media_contam")
        .foreach(g => assert(c(g) == false,
          s"admitted doc fails corpus $g: $m"))
    }
    // the verdict columns ARE the standalone screens' verdicts
    val ti = rowsOf(graft.operators.Dedup
      .queries("dedup_incremental")(spark, sfDir("sf0.01")))
      .map(m => m("doc_id") -> m("verdict")).toMap
    val mi = rowsOf(graft.operators.Phash
      .queries("media_incremental")(spark, sfDir("sf0.01")))
      .map(m => m("media_id") -> m("verdict")).toMap
    rows.foreach { case (id, m) =>
      assert(m("text_verdict") == ti(id) && m("media_verdict") == mi(id),
        s"screen drift for doc $id")
    }
    // both decisions occur on the real corpus
    assert(rows.values.exists(_("admit") == true) &&
      rows.values.exists(_("admit") == false))
  }

  test("contamination flags exactly the docs sharing enough benchmark shingles") {
    val rows = rowsOf(
      Pipeline.queries("bench_contamination")(spark, sfDir("sf0.01")))
    assert(rows.nonEmpty) // the sf corpus plants duplicate docs across ids
    rows.foreach { m =>
      val id = m("doc_id").asInstanceOf[Long]
      assert(id % Pipeline.BenchMod != 0) // benchmark never flags itself
      assert(m("n_shared").asInstanceOf[Long] >= Pipeline.MinOverlap)
    }
  }

  test("bloom prefilter: no false negatives, measured FP mass tiny, exact docs all caught") {
    val df = Pipeline.queries("bench_contamination_bloom")(spark, sfDir("sf0.01"))
    val rows = rowsOf(df)
    assert(rows.size > 400) // every non-benchmark doc gets a verdict row
    // the Bloom guarantee: membership never misses — n_maybe dominates
    // n_shared on every row, so exact_flag implies bloom_flag
    rows.foreach { m =>
      assert(m("n_maybe").asInstanceOf[Long] >= m("n_shared").asInstanceOf[Long],
        s"false negative on ${m("doc_id")}")
      if (m("exact_flag").asInstanceOf[Boolean])
        assert(m("bloom_flag").asInstanceOf[Boolean])
    }
    val exactDocs = rows.count(_("exact_flag").asInstanceOf[Boolean])
    assert(exactDocs > 0, "fixture must contain exact contamination")
    // measured per-shingle false-positive rate: small but nonzero (the
    // filter is exercised, not vacuous) — measured 23 / 25643 ~ 0.0009
    // at m = 8192, k = 3 on this corpus
    val fp = rows.map(m => m("n_maybe").asInstanceOf[Long] -
      m("n_shared").asInstanceOf[Long]).sum
    val cand = rows.map(m => m("n_shingles").asInstanceOf[Long] -
      m("n_shared").asInstanceOf[Long]).sum
    assert(fp > 0, "no collisions at all would mean the filter is not exercised")
    assert(fp.toDouble / cand < 0.01, s"per-shingle FPR ${fp.toDouble / cand}")
    // plan shape: the set-bit table reaches the probe join as a
    // broadcast — the benchmark side must never shuffle the corpus
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"expected the bloom bit table broadcast:\n$plan")
  }

  test("mixture reweighting: bounded loss multipliers, budget conserved exactly") {
    val rows = rowsOf(
      Pipeline.queries("pipeline_mixture_reweight")(spark, sfDir("sf0.01")))
    assert(rows.nonEmpty)
    // reweighting, not resizing: the apportionment hands back the exact
    // corpus total
    val tTotal = rows.map(_("n_tokens").asInstanceOf[Long]).sum
    val budget = rows.map(_("token_budget").asInstanceOf[Long]).sum
    assert(budget == tTotal, s"budget $budget != corpus $tTotal")
    // corpus mean xent from the same exact integers the query used
    val xentAll = rows.map(m => m("xent").asInstanceOf[Double] *
      m("n_tokens").asInstanceOf[Long]).sum / tTotal
    rows.foreach { m =>
      val mult = m("mult").asInstanceOf[Double]
      assert(mult >= 1.0 / Pipeline.ReweightMaxBoost - 1e-12 &&
        mult <= Pipeline.ReweightMaxBoost + 1e-12, s"mult $mult out of clamp")
      // direction: harder-than-average sources move up, easier move down
      val x = m("xent").asInstanceOf[Double]
      if (mult > 1.0 + 1e-9) assert(x > xentAll)
      if (mult < 1.0 - 1e-9) assert(x < xentAll)
      assert(m("token_budget").asInstanceOf[Long] >= 0L)
    }
    // at least one source actually moves in each direction on this
    // corpus (the operator is exercised, not an identity)
    assert(rows.exists(_("mult").asInstanceOf[Double] > 1.0))
    assert(rows.exists(_("mult").asInstanceOf[Double] < 1.0))
  }

  test("cluster-aware split: components move together, cluster leakage is zero") {
    val dir = sfDir("sf0.01")
    val asg = rowsOf(Pipeline.queries("pipeline_split")(spark, dir))
    assert(asg.size == 500) // every document gets a verdict
    val splits = Set("train", "val", "test")
    asg.foreach { m =>
      assert(splits.contains(m("split").asInstanceOf[String]))
      assert(splits.contains(m("naive_split").asInstanceOf[String]))
    }
    // the split property that justifies the operator: every member of a
    // near-dup component shares its canon's split
    asg.groupBy(_("canon")).foreach { case (c, ms) =>
      assert(ms.map(_("split")).toSet.size == 1, s"canon $c straddles splits")
    }
    // singletons: canon == doc_id, so the two policies agree
    asg.filter(m => m("canon") == m("doc_id")).foreach { m =>
      assert(m("split") == m("naive_split"))
    }
    // determinism: re-running assigns the identical splits
    val again = rowsOf(Pipeline.queries("pipeline_split")(spark, dir))
    assert(asg.map(m => m("doc_id") -> m("split")).toMap ==
      again.map(m => m("doc_id") -> m("split")).toMap)
    // the audit: zero leaked pairs under the cluster policy BY
    // CONSTRUCTION; the naive policy is bounded by the pair count
    val leak = rowsOf(Pipeline.queries("pipeline_split_leakage")(spark, dir))
      .map(m => m("policy").asInstanceOf[String] -> m).toMap
    assert(leak.keySet == Set("cluster", "naive"))
    assert(leak("cluster")("n_leaked") == 0L)
    val nPairs = rowsOf(
      Dedup.queries("dedup_minhash_pairs")(spark, dir)).size.toLong
    assert(leak("cluster")("n_pairs") == nPairs)
    assert(leak("naive")("n_pairs") == nPairs)
    val nl = leak("naive")("n_leaked").asInstanceOf[Long]
    assert(nl >= 0L && nl <= nPairs)
  }

  test("quality curve: monotone in the threshold, shipped point equals " +
    "the gate") {
    val d = sfDir("sf0.01")
    val rows = rowsOf(Pipeline.queries("docs_quality_curve")(spark, d))
      .sortBy(_("threshold").asInstanceOf[Double])
    assert(rows.map(_("threshold").asInstanceOf[Double]) ===
      Pipeline.QualityCurveThresholds)
    Seq("n_pass_quality", "n_pass_gate").foreach { c =>
      val xs = rows.map(_(c).asInstanceOf[Long])
      assert(xs.zip(xs.tail).forall { case (a, b) => b <= a },
        s"$c must fall as the bar rises")
    }
    rows.foreach(r => assert(r("n_pass_gate").asInstanceOf[Long] <=
      r("n_pass_quality").asInstanceOf[Long]))
    val shipped = rows.find(_("threshold") == 0.5).get
    val gate = rowsOf(Pipeline.queries("docs_quality_gate")(spark, d))
    assert(shipped("n_pass_gate") === gate.size.toLong)
  }

  test("pack curve: token mass invariant, sequences shrink with budget, " +
    "shipped point reconciles with the waste audit") {
    val d = sfDir("sf0.01")
    val rows = rowsOf(Pipeline.queries("pipeline_pack_curve")(spark, d))
      .sortBy(_("budget").asInstanceOf[Long])
    assert(rows.map(_("budget")) === Pipeline.PackCurveBudgets)
    // the same corpus packs at every budget
    assert(rows.map(_("n_tokens").asInstanceOf[Long]).distinct.size === 1)
    val seqs = rows.map(_("n_seqs").asInstanceOf[Long])
    assert(seqs.zip(seqs.tail).forall { case (a, b) => b <= a },
      "a bigger budget can only close fewer sequences")
    rows.foreach { r =>
      assert(r("n_tokens").asInstanceOf[Long] +
        r("padding").asInstanceOf[Long] === r("capacity").asInstanceOf[Long])
      val f = r("fill_pct").asInstanceOf[Double]
      assert(f > 0.0 && f <= 1.0)
    }
    // the shipped budget's corpus totals equal the per-source audit's
    val shipped = rows.find(_("budget") == Pipeline.PackBudget).get
    val waste = rowsOf(Pipeline.queries("pipeline_pack_waste")(spark, d))
    assert(shipped("n_seqs") ===
      waste.map(_("n_seqs").asInstanceOf[Long]).sum)
    assert(shipped("padding") ===
      waste.map(_("padding").asInstanceOf[Long]).sum)
    assert(shipped("capacity") ===
      waste.map(_("capacity").asInstanceOf[Long]).sum)
  }

  test("epoch reshuffles are decorrelated: displacement near B/3, " +
    "same-bucket rate near 1/B") {
    val rows = rowsOf(Pipeline.queries("pipeline_epochs")(spark, sfDir()))
    assert(rows.size === Pipeline.Epochs * (Pipeline.Epochs - 1) / 2)
    val b = Pipeline.EpochBuckets.toDouble
    rows.foreach { r =>
      val disp = r("mean_abs_disp").asInstanceOf[Double]
      // independent uniforms give E|X-Y| = B/3; a reused seed gives 0
      assert(disp > b / 3 * 0.8 && disp < b / 3 * 1.2,
        s"epoch pair displacement $disp far from ${b / 3}")
      assert(r("pct_same_bucket").asInstanceOf[Long] <= 3L,
        "same-bucket rate must stay near 100/B percent")
    }
    // and the self-pair sanity: epoch 0 against itself would be 0 —
    // recompute one displacement by hand to pin the bucket transform
    import org.apache.spark.sql.functions.{abs => fabs}
    val spark2 = spark
    import spark2.implicits._
    val k = graft.sources.Tables.documents(spark, sfDir()).select($"doc_id")
      .withColumn("b0", org.apache.spark.sql.functions.shiftright(
        graft.functions.ColFns.hex32(concat(lit("epoch0:"), $"doc_id")), 24))
      .withColumn("b1", org.apache.spark.sql.functions.shiftright(
        graft.functions.ColFns.hex32(concat(lit("epoch1:"), $"doc_id")), 24))
    val hand = k.agg(org.apache.spark.sql.functions.round(
      org.apache.spark.sql.functions.avg(fabs($"b0" - $"b1")), 6))
      .head().getDouble(0)
    val reported = rows.find(r => r("epoch_a") == 0L && r("epoch_b") == 1L)
      .get("mean_abs_disp").asInstanceOf[Double]
    assert(hand === reported)
  }

  test("length buckets: minimal power-of-two widths, exact waste accounting") {
    import org.apache.spark.sql.functions.col
    val d = sfDir()
    val rows = rowsOf(Pipeline.queries("pipeline_length_buckets")(spark, d))
    // every width is a power of two
    rows.foreach { r =>
      val w = r("bucket_w").asInstanceOf[Long]
      assert((w & (w - 1)) == 0L && w > 0L, s"$w is not a power of two")
    }
    // the audit covers every document exactly once
    val lens = rowsOf(graft.operators.TextAnalysis
      .queries("text_tokens")(spark, d).select(col("n_tokens")))
      .map(_("n_tokens").asInstanceOf[Number].longValue)
    assert(rows.map(_("n_docs").asInstanceOf[Long]).sum === lens.size.toLong)
    assert(rows.map(_("sum_tokens").asInstanceOf[Long]).sum === lens.sum)
    // recompute the bucket assignment independently: histogram matches
    def bucketOf(n: Long): Long = {
      var w = 1L; while (w < n) w <<= 1; w
    }
    val expect = lens.groupBy(bucketOf).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => r("bucket_w").asInstanceOf[Long] ->
      r("n_docs").asInstanceOf[Long]).toMap === expect)
    // waste arithmetic: integer floor of (padded - real) / padded
    rows.foreach { r =>
      val padded = r("padded_tokens").asInstanceOf[Long]
      assert(padded === r("bucket_w").asInstanceOf[Long] *
        r("n_docs").asInstanceOf[Long])
      assert(r("waste_pct").asInstanceOf[Long] ===
        (padded - r("sum_tokens").asInstanceOf[Long]) * 100 / padded)
    }
  }

  test("pipeline_mixture_kl: Gibbs' inequality and the JS ln2 bound hold; " +
    "identical releases diverge by zero") {
    import graft.operators.Pipeline
    val rows = rowsOf(
      Pipeline.queries("pipeline_mixture_kl")(spark, sfDir()))
    assert(rows.nonEmpty)
    val kl = rows.map(_("kl_term").asInstanceOf[Double]).sum
    val js = rows.map(_("js_term").asInstanceOf[Double]).sum
    // Gibbs: KL(P||Q) >= 0 (terms may be negative, the SUM may not);
    // Jensen-Shannon is bounded by ln 2 and symmetric-positive
    assert(kl >= -1e-9, s"KL total $kl")
    assert(js >= -1e-9 && js <= math.log(2.0) + 1e-9, s"JS total $js")
    // a single-source corpus has P = Q = (1.0): both divergences vanish
    val one = writeDocsFixture(Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "delta epsilon", "en"),
      (18L, "zeta eta theta iota", "en"))) // 18 % 17 = 1: kept in both
    val oneRows = rowsOf(Pipeline.queries("pipeline_mixture_kl")(spark, one))
    assert(oneRows.nonEmpty)
    oneRows.foreach { m =>
      assert(m("kl_term").asInstanceOf[Double] == 0.0)
      assert(m("js_term").asInstanceOf[Double] == 0.0)
    }
  }
}
