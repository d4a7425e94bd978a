package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY §2 operator to a DataFrame
  * builder over a scale-factor directory; `oracleSql` gives the equivalent
  * DuckDB SQL the driver hash-compares against at sf0.01. Column names and
  * types are aligned pairwise (bigint buckets/epochs instead of raw
  * timestamps; all divisions null-guarded identically on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature operator: 10-bucket taker delta -> rolling
    * population z-score -> |z|>=2.1 entry signal (strategy.py:1000-1044). */
  def entry(spark: SparkSession): DataFrame =
    Flow.queries("flow_zscore")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[OpModule] = Seq(Bars, LongMemory, Book, Relational, TextAnalysis, Dedup, Similarity, Scores, Stateful, Scalars, Multimodal, Trend, Ingest, Keyed, Pipeline, MultiSym, Bpe, Opq, Phash, Sq8, Layout, Audit, Graph, Regress)

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Flow.queries ++ modules.map(_.queries).fold(Map.empty)(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Flow.oracles ++ modules.map(_.oracles).fold(Map.empty)(_ ++ _)
}

/** Interface each operator family implements (kept trivial on purpose). */
trait OpModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
