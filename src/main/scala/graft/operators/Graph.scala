package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.OpModule

/** Iterative graph analytics (SURVEY §2's ML/iterative family, next to
  * k-means and BPE): PageRank over the part co-purchase graph — two parts
  * are linked when they appear in the same order, weighted by
  * co-occurrence count, the item-item graph behind "customers also
  * bought" ranking. The reference has no graph surface; this extends the
  * engine the same way the ANN/dedup families do.
  *
  * Everything is INTEGER arithmetic so the fixed-point is bit-identical
  * across engines: ranks live in micro-units ([[PrScale]] = 1e6 per
  * node), every per-edge contribution floors once
  * (`rank * w div out_weight`), and the damping update floors once
  * (`telep + 85 * sum div 100`). Floor leakage is bounded by 1 micro-unit
  * per edge per iteration — the price of a hash-checkable iterative
  * algorithm (doubles would drift between engines' summation orders).
  *
  * Scale shape: the edge table is built from per-order part arrays (never
  * a row-grain self-join — orders bound the pair fan-out), pre-partitioned
  * on `src` ONCE and reused across all [[PrIters]] iterations via
  * localCheckpoint, so each iteration shuffles only the node-sized rank
  * table into the standing edge partitioning, then aggregates on `dst`.
  * At 100 TB the ranks:edges join is the canonical distributed PageRank
  * step — no driver-side state, no adjacency materialized per node.
  */
object Graph extends OpModule {

  /** Rank unit: each node starts with 1e6 micro-units of mass. */
  val PrScale = 1000000L
  /** Fixed damping 0.85 expressed as integers (85/100). */
  val PrIters = 8
  private val telep: Long = 15L * PrScale / 100L // (1-d) * scale, exact

  /** Co-purchase edges (src, dst, w): distinct (order, part) pairs fan out
    * per order — both directions, so the graph is symmetric and every
    * node has out-degree >= 1 (no dangling-mass term needed). */
  private[graft] def edgesDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
      .groupBy($"l_orderkey").agg(collect_list($"l_partkey").as("ps"))
      .select(explode($"ps").as("src"), $"ps")
      .select($"src", explode($"ps").as("dst"))
      .filter($"src" =!= $"dst")
      .groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
  }

  private def pagerankDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // standing state for the loop: partitioned on src once, lineage cut so
    // each iteration's plan is one join + one aggregate, not a growing tree
    val edges = edgesDf(spark, dir)
      .repartition($"src")
      .localCheckpoint()
    val deg = edges.groupBy($"src").agg(sum($"w").as("dw"))
      .repartition($"src")
      .localCheckpoint()
    var ranks = deg.select($"src".as("node"), lit(PrScale).as("r"))
    for (_ <- 1 to PrIters) {
      ranks = edges
        .join(deg, Seq("src"))
        .join(ranks, $"src" === $"node")
        .groupBy($"dst")
        .agg(sum(expr("r * w div dw")).as("s"))
        .select($"dst".as("node"),
          (lit(telep) + expr("85 * s div 100")).as("r"))
        .localCheckpoint() // keep the loop's plan O(1) deep
    }
    ranks.select($"node".as("p_partkey"), $"r".as("rank_micros"))
  }

  /** The same 8 iterations unrolled as generated CTE levels (the BPE
    * oracle's replay pattern — DuckDB's recursive term can't aggregate). */
  private val pagerankSql: String = {
    val levels = (1 to PrIters).map { i =>
      s"""pr$i AS (
         |  SELECT e.dst AS node,
         |    $telep + (85 * sum((p.r * e.w) // d.dw)) // 100 AS r
         |  FROM pr${i - 1} p
         |  JOIN e ON e.src = p.node
         |  JOIN deg d ON d.src = p.node
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH lp AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*)::BIGINT AS w
       |  FROM lp a JOIN lp b USING (l_orderkey)
       |  WHERE a.l_partkey <> b.l_partkey
       |  GROUP BY 1, 2),
       |deg AS MATERIALIZED (SELECT src, sum(w)::BIGINT AS dw FROM e GROUP BY 1),
       |pr0 AS (SELECT src AS node, $PrScale::BIGINT AS r FROM deg),
       |$levels
       |SELECT node AS p_partkey, r::BIGINT AS rank_micros FROM pr$PrIters""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerankDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql
  )
}
