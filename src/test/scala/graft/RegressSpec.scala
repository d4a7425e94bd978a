package graft

import java.nio.file.Files
import graft.operators.Regress

/** Hand-computed semantics for the closed-form OLS trainer: exact
  * recovery on exactly-linear data, NULL-not-NaN on a singular normal
  * matrix, and economic sanity on the corpus (price rises with quantity).
  */
class RegressSpec extends SparkSpec {

  /** lineitem fixture with just the columns the trainers read; orderkey
    * is the row index so the kfold assignment is hand-computable. */
  private def writeLineitem(rows: Seq[(String, Double, Double, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fix").toString
    rows.zipWithIndex
      .map { case ((f, q, d, y), i) => (i.toLong, f, q, d, y) }
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("ols recovers an exactly linear model with r2 = 1") {
    // y = 100 + 2q - 50d on non-collinear (q, d) points
    val pts = Seq((1.0, 0.00), (2.0, 0.02), (3.0, 0.04),
      (4.0, 0.00), (5.0, 0.10), (10.0, 0.06))
    val dir = writeLineitem(pts.map { case (q, d) =>
      ("A", q, d, 100.0 + 2.0 * q - 50.0 * d)
    })
    val r = rowsOf(Regress.queries("ml_ols")(spark, dir)).head
    assert(r("n") == 6L)
    assert(math.abs(r("beta_qty").asInstanceOf[Double] - 2.0) < 1e-9)
    assert(math.abs(r("beta_disc").asInstanceOf[Double] + 50.0) < 1e-9)
    assert(math.abs(r("intercept").asInstanceOf[Double] - 100.0) < 1e-9)
    assert(math.abs(r("r2").asInstanceOf[Double] - 1.0) < 1e-9)
    assert(r("rmse").asInstanceOf[Double] < 1e-6)
  }

  test("singular normal matrix (constant discount) yields NULLs, not NaN") {
    val dir = writeLineitem(Seq(
      ("A", 1.0, 0.05, 10.0), ("A", 2.0, 0.05, 20.0), ("A", 3.0, 0.05, 30.0)))
    val r = rowsOf(Regress.queries("ml_ols")(spark, dir)).head
    assert(r("beta_qty") == null && r("beta_disc") == null)
    assert(r("intercept") == null && r("r2") == null && r("rmse") == null)
  }

  test("ridge curve: frac=0 reproduces OLS; shrinkage and fit monotone in frac") {
    val ols = rowsOf(Regress.queries("ml_ols")(spark, sfDir()))
      .map(r => r("l_returnflag") -> r).toMap
    val curve = rowsOf(Regress.queries("ml_ridge_curve")(spark, sfDir()))
    assert(curve.size == 12) // 3 returnflags x 4 fracs
    curve.groupBy(_("l_returnflag")).foreach { case (flag, rows) =>
      val byFrac = rows.sortBy(_("frac").asInstanceOf[Double])
      // unpenalized point is the OLS solution bit-for-bit
      assert(byFrac.head("beta_qty") == ols(flag)("beta_qty"))
      assert(byFrac.head("beta_disc") == ols(flag)("beta_disc"))
      // ||beta|| non-increasing, in-sample r2 non-increasing as the
      // penalty grows
      val norms = byFrac.map(_("beta_norm").asInstanceOf[Double])
      val r2s = byFrac.map(_("r2").asInstanceOf[Double])
      norms.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-12) }
      r2s.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-12) }
    }
  }

  test("logreg: first-step loss is exactly ln 2, loss descends, Newton deltas collapse") {
    val rs = rowsOf(Regress.queries("ml_logreg")(spark, sfDir()))
      .sortBy(_("iter").asInstanceOf[Int])
    assert(rs.size == Regress.LogregIters)
    // at w0 = 0 every p is exactly 0.5, so every row's floored loss term
    // is floor(ln(2) * 1e6) = 693147 and the mean is exact
    assert(rs.head("logloss") == 0.693147)
    // entering-weights loss improves every Newton step until the
    // flooring noise floor (~1e-8 jitter once converged)
    rs.map(_("logloss").asInstanceOf[Double]).sliding(2).foreach {
      case Seq(a, b) => assert(b < a + 1e-6)
    }
    assert(rs.last("logloss").asInstanceOf[Double] < 0.693147 - 0.01)
    // quadratic convergence: the last delta is far below the first
    val deltas = rs.map(_("delta_norm").asInstanceOf[Double])
    assert(deltas.last < deltas.head / 10.0)
    rs.foreach { r =>
      assert(r("intercept") != null && r("beta_qty") != null && r("beta_disc") != null)
    }
  }

  test("logreg: recovers the sign structure of a planted separable-ish fixture") {
    // high quantity -> returned, low -> kept (with two flipped rows so
    // the logit stays finite); discount alternates without label signal
    // (a CONSTANT discount would make the Hessian singular)
    val rows = (1 to 40).map { i =>
      val q = i.toDouble
      val ret = (q > 20) ^ (i == 1 || i == 40) // flip the extremes
      (if (ret) "R" else "N", q, if (i % 2 == 0) 0.02 else 0.06, 10.0)
    }
    val dir = writeLineitem(rows)
    val rs = rowsOf(Regress.queries("ml_logreg")(spark, dir))
      .sortBy(_("iter").asInstanceOf[Int])
    val last = rs.last
    // quantity must carry strong positive weight; loss well below ln 2
    assert(last("beta_qty").asInstanceOf[Double] > 0.0)
    assert(last("logloss").asInstanceOf[Double] < 0.5)
  }

  test("kfold: exactly linear data generalizes perfectly on every held fold") {
    // 20 rows over 5 folds; every 4-fold complement stays non-collinear
    val pts = (0 until 20).map { i =>
      val q = (i % 7 + 1).toDouble
      val d = (i % 4).toDouble / 50.0 // 0.00, 0.02, 0.04, 0.06
      ("A", q, d, 100.0 + 2.0 * q - 50.0 * d)
    }
    val dir = writeLineitem(pts)
    val rs = rowsOf(Regress.queries("ml_kfold")(spark, dir))
    assert(rs.size == Regress.KFolds)
    assert(rs.map(_("fold")).toSet.size == Regress.KFolds)
    rs.foreach { r =>
      assert(r("n_train") == 16L && r("n_test") == 4L)
      assert(math.abs(r("beta_qty").asInstanceOf[Double] - 2.0) < 1e-9)
      assert(math.abs(r("beta_disc").asInstanceOf[Double] + 50.0) < 1e-9)
      assert(r("rmse_test").asInstanceOf[Double] < 1e-6)
    }
  }

  test("kfold: corpus folds partition the table; held-out r2 tracks in-sample") {
    val rs = rowsOf(Regress.queries("ml_kfold")(spark, sfDir()))
    assert(rs.size == Regress.KFolds)
    val total = rs.map(r => r("n_test").asInstanceOf[Long]).sum
    val whole = rowsOf(Regress.queries("ml_ols")(spark, sfDir()))
      .map(_("n").asInstanceOf[Long]).sum
    assert(total == whole, "folds must partition the rows exactly")
    rs.foreach { r =>
      assert(r("rmse_test").asInstanceOf[Double] > 0.0)
      // held-out r2 of a stable linear fit can dip below 0 only on
      // pathological splits; bound it loosely and cap at 1
      val r2 = r("r2_test").asInstanceOf[Double]
      assert(r2 > -1.0 && r2 <= 1.0)
    }
  }

  test("logreg eval: exact AUC and strong accuracy on the planted fixture") {
    // same planted data as the sign-structure test: pos = {1, 21..39},
    // neg = {2..20, 40}. If scores were monotone in q alone the exact
    // tie-aware AUC would be 19*19/400 = 0.9025; the alternating d
    // feature's small learned weight may flip a few ADJACENT-q pairs
    // (each flip moves AUC by 1/400), so the assertion bounds it
    val rows = (1 to 40).map { i =>
      val q = i.toDouble
      val ret = (q > 20) ^ (i == 1 || i == 40)
      (if (ret) "R" else "N", q, if (i % 2 == 0) 0.02 else 0.06, 10.0)
    }
    val dir = writeLineitem(rows)
    val r = rowsOf(Regress.queries("ml_logreg_eval")(spark, dir)).head
    val total = Seq("tp", "fp", "fn", "tn").map(r(_).asInstanceOf[Long]).sum
    assert(total == 40L)
    val auc = r("auc").asInstanceOf[Double]
    assert(math.abs(auc - 0.9025) <= 10.0 / 400.0)
    assert(r("accuracy").asInstanceOf[Double] >= 0.9)
  }

  test("logreg eval on the corpus: confusion partitions rows, auc defined") {
    val r = rowsOf(Regress.queries("ml_logreg_eval")(spark, sfDir())).head
    val total = Seq("tp", "fp", "fn", "tn").map(r(_).asInstanceOf[Long]).sum
    val n = rowsOf(Regress.queries("ml_ols")(spark, sfDir()))
      .map(_("n").asInstanceOf[Long]).sum
    assert(total == n)
    val auc = r("auc").asInstanceOf[Double]
    assert(auc >= 0.0 && auc <= 1.0)
    assert(r("accuracy").asInstanceOf[Double] >= 0.5)
  }

  test("quality probe replays bitwise against an independent local OLS") {
    import graft.operators.TextAnalysis
    val dir = sfDir()
    val q = rowsOf(TextAnalysis.queries("text_quality")(spark, dir))
      .map(r => r("doc_id") -> r("quality")).collect {
        case (id, v: java.lang.Double) => id -> v.toDouble }.toMap
    val x = rowsOf(TextAnalysis.queries("text_unigram_xent")(spark, dir))
      .map(r => r("doc_id") -> r("xent")).collect {
        case (id, v: java.lang.Double) => id -> v.toDouble }.toMap
    val src = rowsOf(graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source"))
      .map(r => r("doc_id") -> r("source").asInstanceOf[String]).toMap
    val local = q.keySet.intersect(x.keySet).toSeq
      .map(id => (src(id), math.floor(q(id) * 1e6).toLong,
        math.floor(x(id) * 1e6).toLong))
      .groupBy(_._1).map { case (s, rows) =>
        val n = rows.size.toLong
        val sx = rows.map(_._2).sum / 1e6
        val sy = rows.map(_._3).sum / 1e6
        val sxx = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble / 1e12
        val sxy = rows.map(r => BigInt(r._2) * BigInt(r._3)).sum.toDouble / 1e12
        val syy = rows.map(r => BigInt(r._3) * BigInt(r._3)).sum.toDouble / 1e12
        val (cxx, cxy, cyy) =
          (sxx - sx * sx / n, sxy - sx * sy / n, syy - sy * sy / n)
        s -> (n, cxy / cxx, (sy - (cxy / cxx) * sx) / n, (cxy * cxy) / (cxx * cyy))
      }
    val got = rowsOf(Regress.queries("docs_quality_probe")(spark, dir))
    assert(got.map(_("source")).toSet == local.keySet)
    got.foreach { r =>
      val (n, slope, icept, r2) = local(r("source").asInstanceOf[String])
      assert(r("n_docs") == n)
      assert(r("slope") == slope && r("intercept") == icept && r("r2") == r2)
      val rr = r("r2").asInstanceOf[Double]
      assert(rr >= 0.0 && rr <= 1.0)
    }
  }

  test("corpus fit: one row per returnflag, solvable system, r2 in [0, 1]") {
    val rs = rowsOf(Regress.queries("ml_ols")(spark, sfDir()))
    assert(rs.size == 3)
    rs.foreach { r =>
      assert(r("n").asInstanceOf[Long] > 0L)
      // quantity and discount vary within every slice, so the normal
      // matrix is non-singular and every output is defined
      assert(r("beta_qty") != null && r("beta_disc") != null)
      // in-sample OLS with an intercept cannot have negative r2
      val r2 = r("r2").asInstanceOf[Double]
      assert(r2 >= -1e-9 && r2 <= 1.0)
      assert(r("rmse").asInstanceOf[Double] >= 0.0)
    }
  }
}
