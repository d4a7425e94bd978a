package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Ranks

/** The two-level global rank must equal the single-partition window
  * bit-for-bit on every id shape the corpus can throw at it, while its
  * plan keeps the ranked side off a single-partition Exchange — the
  * property that lets PQ/OPQ codebook seeding survive 10⁹-vector tables.
  */
class RanksSpec extends SparkSpec {

  private def assertMatchesDirect(ids: Seq[Long], label: String): Unit = {
    import spark.implicits._
    val df = ids.toDF("vec_id").repartition(7)
    val direct = df.withColumn("rn",
      row_number().over(Window.orderBy($"vec_id")).cast("long"))
    val two = Ranks.rankById(df, "vec_id", "rn")
    val mismatches = two.join(direct.withColumnRenamed("rn", "rn_direct"),
      Seq("vec_id"))
      .filter($"rn" =!= $"rn_direct")
      .count()
    assert(mismatches == 0L, s"$label: two-level rank != direct window")
    assert(two.count() == ids.size.toLong, s"$label: row count changed")
  }

  test("rankById == direct window: dense, gapped, clustered, negative ids") {
    assertMatchesDirect(0L until 500L, "dense 0..n")
    assertMatchesDirect(Seq(3L, 7L, 11L, 1000L, 1001L, 999999L), "gapped")
    // 90% of ids packed into one range cell: rank must still be exact
    assertMatchesDirect((0L until 450L) ++ (1L to 50L).map(_ * 1000000L),
      "clustered")
    assertMatchesDirect(Seq(-50L, -3L, 0L, 4L, 17L), "negative lo")
    assertMatchesDirect(Seq(42L), "single row")
  }

  test("rankById: fewer rows than granules (tiny frames stay exact)") {
    assertMatchesDirect(Seq(5L, 9L, 2L, 14L), "n << granules")
  }

  test("rankById plan: ranked side has no single-partition Exchange") {
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import spark.implicits._
    // The banned regression is Window.orderBy with no partitionBy — it
    // plans as `Exchange SinglePartition` (AllTuples), NOT as a
    // rangepartitioning exchange, so the old string assertion here
    // could never catch it (advisor r15). Assert the real property
    // instead: every SinglePartition exchange in the plan feeds an
    // AGGREGATED subtree (the bounded <=granules-row bases frame); the
    // corpus-sized ranked side never funnels through one task. AQE is
    // disabled for the snapshot so the full physical tree is
    // traversable (AdaptiveSparkPlanExec hides its inner plan from
    // collect()); the production plan shape is identical.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (0L until 2000L).toDF("vec_id").repartition(7)
      def singles(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect { case e: ShuffleExchangeLike
          if e.outputPartitioning == SinglePartition => e }
      val twoLevel = Ranks.rankById(df, "vec_id", "rn")
        .queryExecution.executedPlan
      val s = singles(twoLevel)
      assert(s.nonEmpty, "expected the bounded bases-side window exchange")
      s.foreach { e =>
        assert(e.collect { case a: BaseAggregateExec => a }.nonEmpty,
          "a SinglePartition exchange feeds a non-aggregated " +
            s"(corpus-sized) subtree:\n$twoLevel")
      }
      // negative control: the banned direct form DOES trip the detector
      // (its SinglePartition exchange carries the raw un-aggregated
      // corpus), proving this assertion can catch the regression
      val banned = df.withColumn("rn",
          row_number().over(Window.orderBy($"vec_id")).cast("long"))
        .queryExecution.executedPlan
      val tripped = singles(banned).exists(
        e => e.collect { case a: BaseAggregateExec => a }.isEmpty)
      assert(tripped, "detector failed to flag the direct global window")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("rankById fails loudly when the id span exceeds the cell-" +
      "arithmetic bound (no silent mis-rank)") {
    import spark.implicits._
    // span (hi-lo+1) > Long.MaxValue/256: the documented precondition —
    // must raise, not wrap the cell expression into wrong ranks
    val wide = Seq(Long.MinValue / 2, 0L, Long.MaxValue / 2).toDF("vec_id")
    val e = intercept[Exception] {
      Ranks.rankById(wide, "vec_id", "rn").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("Ranks.rankById")),
      s"expected the range-guard raise_error, got: $e")
  }

  test("PQ seed picks via rankById reproduce the strided-rank contract") {
    import spark.implicits._
    // the codebook trainer picks ranks 1 + k*step; assert those land on
    // exactly the vec_ids the direct window would pick
    val n = 500L
    val k = 8
    val step = math.max(n / k, 1L)
    val picks = (0 until k).map(kk => (kk, 1L + kk * step)).toDF("k", "rn")
    val ids = (0L until n).map(i => i * 3 + 1) // gapped ids
    val ranked = Ranks.rankById(ids.toDF("vec_id"), "vec_id", "rn")
    val got = picks.join(ranked, Seq("rn")).orderBy($"k")
      .select($"vec_id").as[Long].collect().toSeq
    val expect = (0 until k).map(kk => ids((kk * step).toInt))
    assert(got == expect, s"seed picks drifted: $got vs $expect")
  }
}
