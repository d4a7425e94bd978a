package graft

import org.apache.spark.sql.functions._
import graft.operators.{LogisticTrendClassifier, Trend}

/** Trend classifier: dataset-builder semantics and the ML pipeline
  * behind the TrendClassifier trait (capability parity: 3-state output
  * with a probability floor, SURVEY §2.11). */
class TrendSpec extends SparkSpec {

  private lazy val features = Trend.queries("trend_features")(spark, sfDir("sf0.01"))

  test("feature rows are complete and labels match the future return") {
    val rows = rowsOf(features)
    assert(rows.nonEmpty)
    rows.foreach { m =>
      (0 until Trend.SeqLen).foreach(i => assert(m(s"f$i") != null))
      val fr = m("future_ret").asInstanceOf[Double]
      val expected =
        if (fr > Trend.RetThresh) "UP"
        else if (fr < -Trend.RetThresh) "DOWN"
        else "RANGE"
      assert(m("label") == expected)
    }
  }

  test("labels cover all three classes on real data") {
    val labels = rowsOf(features).map(_("label")).toSet
    assert(labels == Set[Any]("UP", "DOWN", "RANGE"))
  }

  test("classifier fits, predicts all rows, and honors the probability floor") {
    val clf = new LogisticTrendClassifier(probFloor = 0.5)
    clf.fit(features)
    val pred = clf.predict(features)
    val rows = pred
      .withColumn("max_prob", array_max(
        org.apache.spark.ml.functions.vector_to_array(col("probability"))))
      .select("pred_trend", "max_prob", "label").collect()
    assert(rows.length == features.count())
    rows.foreach { r =>
      val t = r.getString(0)
      assert(Set("UPTREND", "DOWNTREND", "RANGEBOUND").contains(t))
      if (r.getDouble(1) < 0.5) assert(t == "RANGEBOUND")
    }
    // better than the trivial all-majority baseline on its training set
    val full = pred.count().toDouble
    val majority = rowsOf(features).groupBy(_("label")).map(_._2.size).max / full
    val correct = rows.count { r =>
      (r.getString(0), r.getString(2)) match {
        case ("UPTREND", "UP") | ("DOWNTREND", "DOWN") |
             ("RANGEBOUND", "RANGE") => true
        case _ => false
      }
    } / full
    assert(correct >= majority * 0.85,
      s"accuracy $correct should approach majority $majority")
  }

  test("volume spike lowers the RANGEBOUND floor and flips uncertain predictions") {
    val clf = new LogisticTrendClassifier(probFloor = 0.5)
    clf.fit(features)
    def predWith(vf: Double) = clf
      .predict(features.withColumn("vol_factor", lit(vf)))
      .withColumn("max_prob", array_max(
        org.apache.spark.ml.functions.vector_to_array(col("probability"))))
      .select("bucket", "pred_trend", "max_prob").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // lull (vol_factor 1.0): floor = max(0.4, 0.6/1.0) = 0.6
    val calm = predWith(1.0)
    // spike (vol_factor 2.0, the reference's clamp ceiling): floor =
    // max(0.4, 0.6/2.0) = 0.4 — strictly more willing to call a trend
    val spike = predWith(2.0)
    calm.foreach { case (b, (t, p)) =>
      if (p < 0.6) assert(t == "RANGEBOUND", s"bucket $b: $p under calm floor")
    }
    spike.foreach { case (b, (t, p)) =>
      if (p >= 0.4 && calm(b)._1 != "RANGEBOUND")
        assert(t == calm(b)._1) // confident calls unaffected by the floor
    }
    // at least one uncertain row (0.4 <= p < 0.6) flips out of RANGEBOUND
    val flipped = spike.count { case (b, (t, _)) =>
      calm(b)._1 == "RANGEBOUND" && t != "RANGEBOUND"
    }
    assert(flipped > 0, "expected an uncertain prediction to flip on the spike")
    // and the flip is one-directional: a spike never ADDS a RANGEBOUND
    assert(spike.count(_._2._1 == "RANGEBOUND") <=
      calm.count(_._2._1 == "RANGEBOUND"))

    // a NULL vol_factor falls back to the STATIC floor (0.5), not the
    // dynamic minimum — greatest() skips nulls, so this needs the
    // explicit null branch the implementation carries
    val nullVf = clf
      .predict(features.withColumn("vol_factor",
        lit(null).cast("double")))
      .withColumn("max_prob", array_max(
        org.apache.spark.ml.functions.vector_to_array(col("probability"))))
      .select("pred_trend", "max_prob").collect()
    nullVf.foreach { r =>
      if (r.getDouble(1) < 0.5)
        assert(r.getString(0) == "RANGEBOUND",
          s"null vol_factor must use the static 0.5 floor, got ${r.getString(0)} at ${r.getDouble(1)}")
    }
  }

  test("classifier is deterministic across refits") {
    val a = new LogisticTrendClassifier()
    val b = new LogisticTrendClassifier()
    a.fit(features); b.fit(features)
    val pa = a.predict(features).select("bucket", "pred_trend").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pb = b.predict(features).select("bucket", "pred_trend").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pa == pb)
  }
}
