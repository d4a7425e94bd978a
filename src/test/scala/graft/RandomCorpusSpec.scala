package graft

import java.nio.file.Files
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Pipeline
import graft.streaming.Streams

/** Property-style checks over seeded random corpora: the two-level
  * decompositions (hierarchical packing prefix sums, granule shuffle
  * rank) must equal their naive single-window references BIT-FOR-BIT on
  * corpora of arbitrary shape — not just the fixtures. Three seeded
  * draws with skewed source sizes and doc lengths; deterministic, so a
  * failure reproduces. */
class RandomCorpusSpec extends SparkSpec {

  private def randomCorpus(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    val nSources = 1 + rnd.nextInt(6)
    // skewed: source s gets ~4^s weight, so one source dominates
    val rows = (0 until (50 + rnd.nextInt(250))).map { i =>
      val src = (0 until nSources)
        .map(s => s -> math.pow(4.0, s)).maxBy(t => rnd.nextDouble() * t._2)._1
      val nTok = 1 + rnd.nextInt(40)
      // sparse (but unique) doc ids exercise granule-boundary arithmetic
      (i.toLong * 5 + rnd.nextInt(5), Seq.fill(nTok)("w").mkString(" "),
        "en", s"src$src")
    }
    val dir = Files.createTempDirectory(s"graft_rand$seed").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("two-level packing equals the single window on random skewed corpora") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val dir = randomCorpus(seed)
      val got = Pipeline.queries("pipeline_pack")(spark, dir)
        .select("doc_id", "seq_id", "tok_offset")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val toks = graft.operators.TextAnalysis.queries("text_tokens")(spark, dir)
        .select($"doc_id", $"n_tokens")
      val wRef = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = graft.sources.Tables.documents(spark, dir)
        .select($"doc_id", $"source").join(toks, Seq("doc_id"))
        .withColumn("cum", coalesce(sum($"n_tokens").over(wRef), lit(0L)))
        .select($"doc_id",
          expr(s"cum div ${Pipeline.PackBudget}").as("seq_id"),
          ($"cum" % Pipeline.PackBudget).as("tok_offset"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == want, s"packing diverged at seed $seed")
    }
  }

  test("the assembly chain reconciles end-to-end on random skewed corpora") {
    import spark.implicits._
    (1 to 2).foreach { seed =>
      val dir = randomCorpus(seed + 200)
      val packed = rowsOf(Pipeline.queries("pipeline_pack")(spark, dir))
      val shards = rowsOf(Pipeline.queries("pipeline_shard")(spark, dir))
      val man = rowsOf(Pipeline.queries("pipeline_manifest")(spark, dir))
      val fp = rowsOf(graft.operators.TextAnalysis
        .queries("text_fingerprint")(spark, dir))
        .map(m => m("doc_id") -> m("fingerprint").asInstanceOf[Long]).toMap
      // every packed doc lands in exactly one shard; token totals and
      // fingerprint checksums survive the whole chain
      assert(shards.map(_("n_docs").asInstanceOf[Long]).sum == packed.size)
      assert(man.map(_("n_docs").asInstanceOf[Long]).sum == packed.size)
      assert(man.map(_("n_tokens").asInstanceOf[Long]).sum ==
        packed.map(_("n_tokens").asInstanceOf[Number].longValue).sum)
      assert(man.map(_("fp_checksum").asInstanceOf[Long]).sum ==
        packed.map(m => fp(m("doc_id"))).sum, s"checksum drift at seed $seed")
      // global sequence numbering: unique and formula-consistent
      val gseqs = shards.map(_("global_seq").asInstanceOf[Long])
      assert(gseqs.distinct.size == gseqs.size)
      val perShard = Pipeline.ShardTokens / Pipeline.PackBudget
      shards.foreach(r => assert(r("shard_id").asInstanceOf[Long] ==
        r("global_seq").asInstanceOf[Long] / perShard))
    }
  }

  test("two-level shuffle rank equals the single window on random skewed corpora") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val dir = randomCorpus(seed + 100)
      val got = Pipeline.queries("pipeline_shuffle")(spark, dir)
        .select("doc_id", "src_ord")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wRef = Window.partitionBy($"source")
        .orderBy($"shuffle_key", $"doc_id")
      val want = graft.sources.Tables.documents(spark, dir)
        .select($"doc_id", $"source")
        .withColumn("shuffle_key", graft.functions.ColFns.hex32(
          concat(lit(s"${Pipeline.ShuffleSeed}:"), $"doc_id")))
        .withColumn("src_ord", (row_number().over(wRef) - 1).cast("long"))
        .select($"doc_id", $"src_ord")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"shuffle rank diverged at seed $seed")
    }
  }

  test("greedy no-split packing equals a driver-side replay on random corpora") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      // longer docs than the base corpus so oversized (> PackBudget)
      // documents occur and the own-sequence branch is exercised
      val rnd = new scala.util.Random(seed + 500)
      val rows = (0 until (80 + rnd.nextInt(120))).map { i =>
        val nTok = 1 + rnd.nextInt(400) // up to 400 > the 256 budget
        (i.toLong * 3 + rnd.nextInt(3),
          Seq.fill(nTok)("w").mkString(" "), "en", s"src${rnd.nextInt(4)}")
      }
      val dir = Files.createTempDirectory(s"graft_gp$seed").toString
      rows.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length($"text").cast("long"))
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      val got = Pipeline.queries("pipeline_pack_greedy")(spark, dir)
        .select("doc_id", "seq_id", "tok_offset")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // driver-side greedy replay over the same (source, doc_id) order
      val docs = graft.operators.TextAnalysis.queries("text_tokens")(spark, dir)
        .select($"doc_id", $"n_tokens")
        .join(graft.sources.Tables.documents(spark, dir)
          .select($"doc_id", $"source"), Seq("doc_id"))
        .collect().map(r => (r.getAs[String]("source"),
          r.getAs[Long]("doc_id"),
          r.getAs[Number]("n_tokens").longValue)) // size() is IntegerType
      val want = docs.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
        var seq = 0L; var fill = 0L
        ds.sortBy(_._2).toSeq.map { case (_, id, n) =>
          if (fill > 0 && fill + n > Pipeline.PackBudget) { seq += 1; fill = 0 }
          val off = fill; fill += n
          id -> ((seq, off))
        }
      }.toMap
      assert(got == want, s"greedy packing diverged at seed $seed")
    }
  }

  test("layout two-level granule rank equals the single window on random events") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed + 900)
      val n = 200 + rnd.nextInt(600)
      val fix = writeEventsFixture((0 until n).map { i =>
        (i.toLong,
          1700000000000000000L + math.abs(rnd.nextLong() % 2000000000000L) * 1000L,
          rnd.nextInt(1 + rnd.nextInt(300)).toLong,
          "click", 1.0)
      })
      val base = graft.operators.Layout.zvalDf(spark, fix)
      val got = graft.operators.Layout
        .granuleByRank(base, $"zval", $"event_id")
        .select("event_id", "granule")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = base
        .withColumn("granule", expr(
          s"(row_number() OVER (ORDER BY zval, event_id) - 1) div ${graft.operators.Layout.GranuleRows}"))
        .select("event_id", "granule")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"granule rank diverged at seed $seed")
    }
  }

  test("skyline equals brute-force dominance on random part catalogs") {
    import spark.implicits._
    for (seed <- 1 to 25) {
      val rnd = new scala.util.Random(seed)
      val n = 20 + rnd.nextInt(200)
      // small value domains force heavy ties — the hard case for the
      // per-price max collapse and the strict-predecessor window
      val rows = (0 until n).map { i =>
        (i.toLong, s"part$i", "Brand#1", "ECONOMY",
          1 + rnd.nextInt(12), 1.0 + rnd.nextInt(15) * 0.25)
      }
      val dir = Files.createTempDirectory(s"graft_sky$seed").toString
      rows.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
        .coalesce(1).write.parquet(s"$dir/part.parquet")
      val front = rowsOf(
        graft.operators.Relational.queries("skyline_parts")(spark, dir))
        .map(m => (m("price_cents").asInstanceOf[Long],
          m("p_size").asInstanceOf[Int])).toSet
      val pts = rows.map(r => (math.round(r._6 * 100), r._5)).toSet
      val expect = pts.filter { case (pc, sz) =>
        !pts.exists { case (qc, qz) =>
          qc <= pc && qz >= sz && (qc < pc || qz > sz) }
      }
      assert(front == expect, s"seed $seed: front=$front expect=$expect")
    }
  }

  test("an empty corpus yields empty-or-sentinel results, never a throw") {
    val dir = writeDocsFixture(Seq.empty)
    // the document-driven analytics: each must evaluate cleanly on a
    // zero-row corpus (null-guarded divisions, empty windows, empty
    // sketches) — the first crawl drop of a new pipeline IS this case
    Seq("text_zipf", "text_vocab_drift", "pipeline_length_buckets",
      "dedup_lsh_curve", "text_langid_confusion", "pipeline_epochs",
      "pipeline_release_diff", "dedup_edit_verify")
      .foreach { q =>
        val rows = rowsOf(SparkEntry.queries(q)(spark, dir))
        // no verdict row may claim coverage of documents that don't exist
        rows.foreach { r =>
          r.get("n_docs").foreach(n =>
            assert(n == null || n.asInstanceOf[Long] == 0L, s"$q: $r"))
        }
      }
  }

  test("Spark levenshtein equals the reference DP on random string pairs") {
    import spark.implicits._
    // the edit-verify rung leans on both engines agreeing on the
    // unit-cost DP; pin the Spark side against a from-scratch reference
    def ref(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(4242)
    def word() = (0 until rnd.nextInt(24))
      .map(_ => "abcde"(rnd.nextInt(5))).mkString
    val pairs = (0 until 200).map(_ => (word(), word()))
    val got = pairs.toDF("a", "b")
      .select(levenshtein($"a", $"b").as("d")).as[Int].collect()
    pairs.zip(got).foreach { case ((a, b), d) =>
      assert(d === ref(a, b), s"levenshtein('$a','$b')")
    }
  }

  test("streaming funnel equals the batch funnel on random event streams") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val types = graft.operators.Keyed.FunnelSteps ++ Seq("error", "noise")
    (1 to 2).foreach { seed =>
      val rnd = new scala.util.Random(seed + 1700)
      val n = 300 + rnd.nextInt(500)
      // timestamps cluster inside a few days so the 24 h completion
      // window genuinely gates some users and passes others
      val rows = (0 until n).map { i =>
        (i.toLong,
          1700000000000000000L +
            math.abs(rnd.nextLong() % (5L * 86400L * 1000000L)) * 1000L,
          rnd.nextInt(25).toLong,
          types(rnd.nextInt(types.size)), 1.0)
      }
      val fix = writeEventsFixture(rows)
      val batch = rowsOf(graft.operators.Keyed
        .queries("events_funnel")(spark, fix))
        .map(r => r("step").asInstanceOf[Long] ->
          r("n_users").asInstanceOf[Long]).toMap
      val deltas = graft.sources.Tables.events(spark, fix)
        .select($"user_id", $"event_type", $"ts_us")
        .as[(Long, String, Long)].collect().toSeq.sortBy(_._3)
      val input = MemoryStream[(Long, String, Long)]
      val name = s"funnel_rand_$seed"
      val q = Streams.funnelMonitor(
        input.toDF().toDF("user_id", "event_type", "ts_us"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      input.addData(deltas.take(deltas.size / 3))
      q.processAllAvailable()
      input.addData(deltas.drop(deltas.size / 3))
      q.processAllAvailable()
      q.stop()
      val prog = spark.table(name).as[Streams.FunnelProgress].collect()
      batch.foreach { case (step, nu) =>
        assert(prog.count(_.stage == step).toLong === nu,
          s"seed $seed step $step: stream vs batch diverged")
      }
    }
  }

  test("streaming cusum equals batch on random streams at random trigger cuts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    (1 to 2).foreach { seed =>
      val rnd = new scala.util.Random(seed + 9100)
      val n = 2000 + rnd.nextInt(2000)
      // several hundred hourly buckets so the 168-bucket baseline trains
      val rows = (0 until n).map { i =>
        (i.toLong,
          1700000000000000000L +
            math.abs(rnd.nextLong() % (400L * 3600L * 1000000L)) * 1000L,
          rnd.nextInt(9).toLong,
          Seq("click", "view")(rnd.nextInt(2)),
          10.0 + rnd.nextInt(9000) / 100.0)
      }
      val fix = writeEventsFixture(rows)
      val batchRows = rowsOf(SparkEntry.queries("flow_cusum")(spark, fix))
        .map(r => (r("event_type").asInstanceOf[String],
          r("bucket").asInstanceOf[Long], r("x_centi").asInstanceOf[Long],
          r("s_hi").asInstanceOf[Long], r("s_lo").asInstanceOf[Long],
          r("alarm").asInstanceOf[Boolean]))
      val lastPerType = batchRows.groupBy(_._1)
        .view.mapValues(_.map(_._2).max).toMap
      val batch = batchRows.filter(r => r._2 != lastPerType(r._1)).toSet
      val base = graft.operators.Stateful.cusumBaseDf(spark, fix)
        .select($"event_type", $"mu", $"k", $"h").collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val ev = graft.sources.Tables.events(spark, fix)
        .select($"event_type", $"ts_us", $"value")
        .as[(String, Long, Double)].collect().toSeq.sortBy(_._2)
      val input = MemoryStream[(String, Long, Double)]
      val name = s"cusum_rand_$seed"
      val q = Streams.cusumMonitor(
        input.toDF().toDF("event_type", "ts_us", "value"), base)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      // random trigger boundaries: 2-6 unequal chunks, so open buckets
      // straddle cuts at arbitrary points
      var rest = ev
      while (rest.nonEmpty) {
        val take = math.max(1, rnd.nextInt(ev.size / 2 + 1))
        input.addData(rest.take(take))
        q.processAllAvailable()
        rest = rest.drop(take)
      }
      q.stop()
      val streamed = spark.table(name).as[Streams.CusumMonRow].collect()
        .map(r => (r.event_type, r.bucket, r.x_centi, r.s_hi, r.s_lo, r.alarm))
        .toSet
      assert(streamed === batch, s"seed $seed: stream vs batch diverged")
    }
  }

  test("kaplan-meier equals a local bitwise replay on random lifetimes") {
    import graft.operators.Keyed
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 77)
      // random users with random active-day sets over a 0..40 horizon
      val rows = (1 to (10 + rnd.nextInt(20))).flatMap { uid =>
        val first = rnd.nextInt(30)
        val span = rnd.nextInt(11)
        val days = Seq(first, first + span) ++
          Seq.fill(rnd.nextInt(4))(first + rnd.nextInt(span + 1))
        days.distinct.map(d => (uid.toLong, d.toLong))
      }
      val dir = writeEventsFixture(rows.zipWithIndex.map { case ((u, d), i) =>
        (i.toLong + 1, d * 24L * 3600L * 1000000000L, u, "view", 1.0)
      })
      // local replay with the identical integer-floored ln canon
      // .toSeq BEFORE .map: mapping a Map to (min, max) tuples would
      // collapse users sharing the same span into one map entry
      val perUser = rows.groupBy(_._1).toSeq.map { case (_, ds) =>
        (ds.map(_._2).min, ds.map(_._2).max) }
      val maxDay = perUser.map(_._2).max
      val lives = perUser.map { case (f, l) =>
        (l - f, if (l < maxDay - Keyed.CensorDays) 1L else 0L) }
      val timeline = lives.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (dur, us) => (dur, us.size.toLong, us.map(_._2).sum) }
      var atRisk = lives.size.toLong
      var lnSum = 0L
      var dead = false
      val want = timeline.map { case (dur, cnt, deaths) =>
        val nRisk = atRisk
        if (deaths == nRisk) dead = true
        else lnSum +=
          math.floor(StrictMath.log(1.0 - deaths.toDouble / nRisk) * 1e9).toLong
        atRisk -= cnt
        // Spark's Log/Exp expressions run StrictMath, not Math —
        // bitwise replay must match the engine's libm choice
        val s = if (dead) 0.0 else StrictMath.exp(lnSum.toDouble / 1e9)
        dur -> ((nRisk, deaths, cnt - deaths, s))
      }.toMap
      val got = rowsOf(Keyed.queries("events_survival")(spark, dir))
      assert(got.size == want.size,
        s"seed $seed: timeline ${got.map(_("duration_days").asInstanceOf[Long]).sorted} vs ${want.keySet.toSeq.sorted}")
      got.foreach { r =>
        val (n, dth, c, s) = want(r("duration_days").asInstanceOf[Long])
        assert(r("n_risk") == n && r("deaths") == dth && r("censored") == c,
          s"seed $seed: counters at ${r("duration_days")}")
        assert(r("survival") == s,
          s"seed $seed: survival at ${r("duration_days")}")
      }
    }
  }
}
