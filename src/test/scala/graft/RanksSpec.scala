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
    import spark.implicits._
    val df = (0L until 2000L).toDF("vec_id").repartition(7)
    val plan = Ranks.rankById(df, "vec_id", "rn")
      .queryExecution.executedPlan.toString
    // a global-order rank would show up as a rangepartitioning Exchange
    // feeding the window; the two-level form must not have one
    assert(!plan.contains("rangepartitioning"),
      s"two-level rank plan contains a global sort exchange:\n$plan")
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
