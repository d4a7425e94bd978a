package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.OpModule

/** Trend classification (SURVEY §2.11): the reference trains a
  * 1-feature LSTM on z-normalized close sequences and labels by the mean
  * future return (data_manager.py:839-929). Capability parity — 3-state
  * trend from lagged normalized closes with a probability floor — not
  * weight parity (SURVEY §7.3).
  *
  *  - `trend_features`: the dataset builder as a pure relational query —
  *    lag windows build the sequence features, a lead window builds the
  *    future-return label (data_manager.py:839-884). Hash-checked against
  *    the DuckDB twin; this IS the part of the ML surface an engine owns.
  *  - [[TrendClassifier]]: the model behind a trait; the Spark ML
  *    implementation is a multinomial logistic regression over the same
  *    features with the reference's RANGEBOUND probability floor
  *    (data_manager.py:931-965). Train-once-predict-many, exactly the
  *    reference's warmup pattern; deterministic given fixed data.
  *
  * Scale: feature building is window work over the per-symbol bar table
  * (tiny relative to raw events); training data collects to the ML
  * library's distributed fit; prediction is a map-side model transform.
  */
object Trend extends OpModule {

  val SeqLen = 8       // lagged features (reference seq_len=20 on ticks)
  val Horizon = 3      // future bars for the label (data_manager.py:989)
  val RetThresh = 0.02 // labeling threshold, scaled to this data's vol
  val NormWin = 60     // z-normalization lookback
  val ProbFloor = 0.5  // below max-prob floor -> RANGEBOUND
  // Dynamic floor under volume spikes (data_manager.py:1034-1035): the
  // reference lowers the RANGEBOUND threshold to max(0.4, 0.6/vol_factor)
  // — a volume surge (vol_factor > 1, §2.5 volume-rate ratio) makes the
  // classifier more willing to call a trend; a lull raises the bar.
  val FloorMin = 0.4
  val FloorBase = 0.6

  private[operators] def featuresDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"bucket")
    val wNorm = w.rowsBetween(-(NormWin - 1), 0)
    var df = Bars.ohlcDf(spark, dir)
      .select($"bucket", $"close")
      .withColumn("mu", avg($"close").over(wNorm))
      .withColumn("sd", stddev_pop($"close").over(wNorm))
      .withColumn("norm",
        ($"close" - $"mu") / when($"sd" > 0.0, $"sd"))
    for (i <- 0 until SeqLen)
      df = df.withColumn(s"f$i", lag($"norm", i).over(w))
    df.withColumn("future_ret",
        (lead($"close", Horizon).over(w) - $"close") / $"close")
      .withColumn("label",
        when($"future_ret" > RetThresh, "UP")
          .when($"future_ret" < -RetThresh, "DOWN")
          .otherwise("RANGE"))
      .filter($"future_ret".isNotNull && (0 until SeqLen)
        .map(i => col(s"f$i").isNotNull).reduce(_ && _))
      .select(($"bucket" +: (0 until SeqLen).map(i => col(s"f$i")) :+
        $"future_ret" :+ $"label"): _*)
  }

  private val featuresSql: String = {
    val lags = (0 until SeqLen)
      .map(i => s"    lag(norm, $i) OVER wo AS f$i").mkString(",\n")
    val notNull = (0 until SeqLen).map(i => s"f$i IS NOT NULL").mkString(" AND ")
    s"""WITH ohlc AS (${Bars.ohlcSql}),
       |n AS (
       |  SELECT bucket, close,
       |    (close - avg(close) OVER wn)
       |      / nullif(stddev_pop(close) OVER wn, 0.0) AS norm
       |  FROM ohlc
       |  WINDOW wn AS (ORDER BY bucket ROWS BETWEEN ${NormWin - 1} PRECEDING AND CURRENT ROW)),
       |f AS (
       |  SELECT bucket,
       |$lags,
       |    (lead(close, $Horizon) OVER wo - close) / close AS future_ret
       |  FROM n
       |  WINDOW wo AS (ORDER BY bucket))
       |SELECT bucket, ${(0 until SeqLen).map(i => s"f$i").mkString(", ")},
       |  future_ret,
       |  CASE WHEN future_ret > $RetThresh THEN 'UP'
       |       WHEN future_ret < -$RetThresh THEN 'DOWN'
       |       ELSE 'RANGE' END AS label
       |FROM f
       |WHERE future_ret IS NOT NULL AND $notNull""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "trend_features" -> (featuresDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "trend_features" -> featuresSql
  )
}

/** 3-state trend classifier interface (SURVEY §2.11: "interface kept
  * behind a TrendClassifier trait"). */
trait TrendClassifier {
  /** Fit on a trend_features frame (f0..fN + label). */
  def fit(features: DataFrame): Unit

  /** Adds `pred_trend` (UP/DOWN/RANGEBOUND) honoring the probability
    * floor: an uncertain model output degrades to RANGEBOUND
    * (data_manager.py:958-965). When the input carries a `vol_factor`
    * column (the §2.5 volume-rate ratio), the floor is the reference's
    * dynamic `max(0.4, 0.6/vol_factor)` per row
    * (data_manager.py:1034-1035); otherwise the static constructor
    * floor applies. */
  def predict(features: DataFrame): DataFrame
}

/** Spark ML multinomial logistic regression implementation —
  * train-once-on-warmup, broadcast-model transform thereafter. */
class LogisticTrendClassifier(probFloor: Double = Trend.ProbFloor)
    extends TrendClassifier {
  private var model: org.apache.spark.ml.PipelineModel = _

  private def pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols((0 until Trend.SeqLen).map(i => s"f$i").toArray)
      .setOutputCol("fvec")
    val indexer = new org.apache.spark.ml.feature.StringIndexer()
      .setInputCol("label").setOutputCol("y").setStringOrderType("alphabetAsc")
    val lr = new LogisticRegression()
      .setFeaturesCol("fvec").setLabelCol("y")
      .setMaxIter(50).setFamily("multinomial")
    new org.apache.spark.ml.Pipeline().setStages(Array(assembler, indexer, lr))
  }

  override def fit(features: DataFrame): Unit =
    model = pipeline.fit(features)

  override def predict(features: DataFrame): DataFrame = {
    require(model != null, "fit before predict")
    val labels = model.stages(1)
      .asInstanceOf[org.apache.spark.ml.feature.StringIndexerModel].labelsArray.head
    val out = model.transform(features)
    val maxProb = array_max(
      org.apache.spark.ml.functions.vector_to_array(col("probability")))
    val predLabel = labels.zipWithIndex.foldLeft(lit("RANGE")) {
      case (acc, (l, i)) =>
        when(col("prediction") === i.toDouble, l).otherwise(acc)
    }
    // dynamic RANGEBOUND threshold under volume spikes: a missing or
    // null vol_factor falls back to the static floor (the reference
    // guards the same way, data_manager.py:1031-1035). The null branch is
    // explicit — greatest() SKIPS nulls, so a coalesce around
    // greatest(0.4, 0.6/null) would never fire (it yields 0.4, not null)
    val floor =
      if (features.columns.contains("vol_factor"))
        when(col("vol_factor").isNotNull,
          greatest(lit(Trend.FloorMin), lit(Trend.FloorBase) / col("vol_factor")))
          .otherwise(lit(probFloor))
      else lit(probFloor)
    out.withColumn("pred_trend",
      when(maxProb < floor, "RANGEBOUND")
        .otherwise(when(predLabel === "RANGE", "RANGEBOUND")
          .when(predLabel === "UP", "UPTREND")
          .otherwise("DOWNTREND")))
  }
}
