package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.OpModule

/** Distributed closed-form regression (`ml_*`): the training-side
  * counterpart of the serving-side classifiers in TextAnalysis/Trend.
  * The reference trains its trend model offline and only serves weights
  * (SURVEY §2.11); a 100 TB pipeline also needs the *fit* to run on the
  * cluster. For linear models with a handful of features the normal
  * equations make training a single aggregation: every sufficient
  * statistic (sums, cross-moments) is one map-side-combined pass over the
  * facts, and the O(D^3) solve happens per GROUP on D-sized numbers —
  * Cramer's rule inside the projection, no driver loop, no iteration, no
  * collect. This is the textbook "sufficient statistics beat gradient
  * descent at D<<N" design (e.g. Chu et al., Map-Reduce for Machine
  * Learning on Multicore, NIPS 2006).
  *
  * `ml_ols` fits extendedprice ~ quantity + discount per returnflag
  * group. Determinism is the exact-integer canon end-to-end: quantity,
  * centi-discount and centi-price are exact BIGINTs, so every sufficient
  * statistic is an order-independent integer sum (the one wide moment,
  * sum(y_c^2), accumulates as decimal(38,0) in Spark and HUGEINT in
  * DuckDB — ~6.6e20 at sf1 overflows int64); both engines then run the
  * IDENTICAL textual double-op sequence (shared selectExpr strings) over
  * identical integers, so betas/R^2 match bitwise. Groups with a singular
  * normal matrix (collinear or constant features) yield NULL betas on
  * both sides rather than a 0/0.
  */
object Regress extends OpModule {

  // Stage 2: exact integer sums -> natural-unit double moments.
  // quantity is whole units; discount and price carry 2 decimals, so the
  // integer sums rescale by the matching power of 100 — each a single
  // double division on an exactly-represented operand.
  private val olsMoments: Seq[String] = Seq(
    "l_returnflag",
    "n",
    "cast(sq_i as double) as sq",
    "cast(sd_i as double) / 100.0 as sd",
    "cast(sy_i as double) / 100.0 as sy",
    "cast(sqq_i as double) as sqq",
    "cast(sqd_i as double) / 100.0 as sqd",
    "cast(sdd_i as double) / 10000.0 as sdd",
    "cast(sqy_i as double) / 100.0 as sqy",
    "cast(sdy_i as double) / 10000.0 as sdy",
    "cast(syy_w as double) / 10000.0 as syy")

  // Stage 3: centered second moments (better conditioned than raw).
  private val olsCentered: Seq[String] = Seq(
    "l_returnflag", "n", "sq", "sd", "sy",
    "sqq - sq * sq / n as cqq",
    "sqd - sq * sd / n as cqd",
    "sdd - sd * sd / n as cdd",
    "sqy - sq * sy / n as cqy",
    "sdy - sd * sy / n as cdy",
    "syy - sy * sy / n as cyy")

  // Stage 4: Cramer solve of the centered 2x2 system.
  private val olsBetas: Seq[String] = Seq(
    "l_returnflag", "n", "sq", "sd", "sy", "cqy", "cdy", "cyy",
    "cqq * cdd - cqd * cqd as det",
    "case when cqq * cdd - cqd * cqd <> 0.0 then (cqy * cdd - cdy * cqd) / (cqq * cdd - cqd * cqd) end as beta_qty",
    "case when cqq * cdd - cqd * cqd <> 0.0 then (cdy * cqq - cqy * cqd) / (cqq * cdd - cqd * cqd) end as beta_disc")

  // Stage 5: intercept, fit quality.
  private val olsFinal: Seq[String] = Seq(
    "l_returnflag",
    "n",
    "case when det <> 0.0 then (sy - beta_qty * sq - beta_disc * sd) / n end as intercept",
    "beta_qty",
    "beta_disc",
    "case when det <> 0.0 and cyy > 0.0 then 1.0 - (cyy - beta_qty * cqy - beta_disc * cdy) / cyy end as r2",
    "case when det <> 0.0 then sqrt(greatest(cyy - beta_qty * cqy - beta_disc * cdy, 0.0) / n) end as rmse")

  /** `ml_ols`: per-returnflag OLS of extendedprice on (quantity, discount)
    * via normal equations — one aggregation over lineitem, then a
    * constant-size per-group solve. */
  private[operators] def olsDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select(
        $"l_returnflag",
        round($"l_quantity").cast("long").as("q_i"),
        round($"l_discount" * 100).cast("long").as("d_i"),
        round($"l_extendedprice" * 100).cast("long").as("y_i"))
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum($"q_i").as("sq_i"),
        sum($"d_i").as("sd_i"),
        sum($"y_i").as("sy_i"),
        sum($"q_i" * $"q_i").as("sqq_i"),
        sum($"q_i" * $"d_i").as("sqd_i"),
        sum($"d_i" * $"d_i").as("sdd_i"),
        sum($"q_i" * $"y_i").as("sqy_i"),
        sum($"d_i" * $"y_i").as("sdy_i"),
        sum(($"y_i" * $"y_i").cast("decimal(38,0)")).as("syy_w"))
      .selectExpr(olsMoments: _*)
      .selectExpr(olsCentered: _*)
      .selectExpr(olsBetas: _*)
      .selectExpr(olsFinal: _*)
  }

  private[operators] val olsSql: String =
    s"""WITH r AS (SELECT l_returnflag,
       |    round(l_quantity)::BIGINT AS q_i,
       |    round(l_discount * 100)::BIGINT AS d_i,
       |    round(l_extendedprice * 100)::BIGINT AS y_i
       |  FROM lineitem),
       |a AS (SELECT l_returnflag, count(*) AS n,
       |    sum(q_i)::BIGINT AS sq_i, sum(d_i)::BIGINT AS sd_i,
       |    sum(y_i)::BIGINT AS sy_i,
       |    sum(q_i * q_i)::BIGINT AS sqq_i, sum(q_i * d_i)::BIGINT AS sqd_i,
       |    sum(d_i * d_i)::BIGINT AS sdd_i, sum(q_i * y_i)::BIGINT AS sqy_i,
       |    sum(d_i * y_i)::BIGINT AS sdy_i,
       |    sum(y_i::HUGEINT * y_i::HUGEINT) AS syy_w
       |  FROM r GROUP BY 1),
       |m AS (SELECT ${olsMoments.mkString(", ")} FROM a),
       |c AS (SELECT ${olsCentered.mkString(", ")} FROM m),
       |b AS (SELECT ${olsBetas.mkString(", ")} FROM c)
       |SELECT ${olsFinal.mkString(", ")} FROM b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_ols" -> (olsDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "ml_ols" -> olsSql
  )
}
