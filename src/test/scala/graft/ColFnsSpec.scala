package graft

import org.apache.spark.sql.functions._
import graft.functions.ColFns

/** Scalar helpers against known values (SURVEY §5.1). */
class ColFnsSpec extends SparkSpec {

  private def eval1(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).collect()(0).get(0)
  }

  test("normCdf matches known quantiles within the A&S 7.1.26 bound") {
    val cases = Seq(0.0 -> 0.5, 1.0 -> 0.8413447, -1.0 -> 0.1586553,
      1.96 -> 0.9750021, -2.575 -> 0.0050122, 4.0 -> 0.9999683)
    for ((x, expected) <- cases) {
      val got = eval1(ColFns.normCdf(lit(x))).asInstanceOf[Double]
      assert(math.abs(got - expected) < 2e-7, s"Phi($x) = $got != $expected")
    }
  }

  test("sigmoid midpoint and symmetry") {
    assert(eval1(ColFns.sigmoid(lit(0.0))) == 0.5)
    val p = eval1(ColFns.sigmoid(lit(3.0))).asInstanceOf[Double]
    val n = eval1(ColFns.sigmoid(lit(-3.0))).asInstanceOf[Double]
    assert(math.abs(p + n - 1.0) < 1e-15)
  }

  test("clamp bounds") {
    assert(eval1(ColFns.clamp(lit(5.0), 0.0, 1.0)) == 1.0)
    assert(eval1(ColFns.clamp(lit(-5.0), 0.0, 1.0)) == 0.0)
    assert(eval1(ColFns.clamp(lit(0.3), 0.0, 1.0)) == 0.3)
  }

  test("hex32 is deterministic, 32-bit, and equals the md5 prefix") {
    import spark.implicits._
    val out = Seq("alpha", "beta", "alpha").toDF("s")
      .select(ColFns.hex32($"s").as("h"), $"s").collect()
    val byS = out.map(r => (r.getString(1), r.getLong(0))).toMap
    assert(byS("alpha") == java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("alpha".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16))
    out.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) < (1L << 32)))
  }
}
