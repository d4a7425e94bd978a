package graft

import java.nio.file.Files
import graft.operators.Regress

/** Hand-computed semantics for the closed-form OLS trainer: exact
  * recovery on exactly-linear data, NULL-not-NaN on a singular normal
  * matrix, and economic sanity on the corpus (price rises with quantity).
  */
class RegressSpec extends SparkSpec {

  /** lineitem fixture with just the columns the trainer reads. */
  private def writeLineitem(rows: Seq[(String, Double, Double, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fix").toString
    rows.toDF("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
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
