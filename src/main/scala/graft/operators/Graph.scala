package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.OpModule

/** Iterative graph analytics (SURVEY §2's ML/iterative family, next to
  * k-means and BPE): PageRank (Brin & Page 1998, the random-surfer
  * fixed point) over the part co-purchase graph — two parts are linked
  * when they appear in the same order, weighted by co-occurrence count,
  * the item-item graph behind "customers also bought" ranking — and
  * triangle counting via degree-ordered orientation (the forward/
  * compact-forward algorithm of Schank & Wagner 2005 / Latapy 2008).
  * The reference has no graph surface; this extends the engine the
  * same way the ANN/dedup families do.
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

  /** The co-purchase window: two ship-years (see [[edgesDf]]). */
  val GraphYears = 2
  val GraphWindowLo = "1996-01-01"
  val GraphWindowHi = "1998-01-01"

  /** Rank unit: each node starts with 1e6 micro-units of mass. */
  val PrScale = 1000000L
  /** Fixed damping 0.85 expressed as integers (85/100). */
  val PrIters = 8
  private val telep: Long = 15L * PrScale / 100L // (1-d) * scale, exact

  /** Co-purchase edges (src, dst, w): distinct (order, part) pairs fan out
    * per order — both directions, so the graph is symmetric and every
    * node has out-degree >= 1 (no dangling-mass term needed). The graph
    * is the [[GraphYears]] recommendation window, not all history: a
    * production item-item graph decays old co-purchases (last season's
    * basket says little about today's), and the window is ALSO the scan
    * prune — the shipdate filter reaches the parquet scan, so the graph
    * build reads a bounded recent slice no matter how much history the
    * fact table accumulates. */
  private[graft] def edgesDf(spark: SparkSession, dir: String): DataFrame =
    graft.functions.DfMemo.cached(spark, s"graph_edges:$dir") {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .filter($"l_shipdate" >= lit(GraphWindowLo).cast("timestamp") &&
          $"l_shipdate" < lit(GraphWindowHi).cast("timestamp"))
        .select($"l_orderkey", $"l_partkey").distinct()
        .groupBy($"l_orderkey").agg(collect_list($"l_partkey").as("ps"))
        .select(explode($"ps").as("src"), $"ps")
        .select($"src", explode($"ps").as("dst"))
        .filter($"src" =!= $"dst")
        .groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
    }

  private def pagerankDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // standing state for the loop: the out-weight joins INTO the edge
    // table once (never re-joined per iteration), partitioned on src and
    // lineage-cut, so each iteration is exactly one node-sized shuffle of
    // ranks into the standing edge partitioning plus the dst aggregate
    val edges0 = edgesDf(spark, dir)
    val deg = edges0.groupBy($"src").agg(sum($"w").as("dw"))
    val edges = edges0.join(deg, Seq("src"))
      .repartition($"src")
      .localCheckpoint()
    // PrIters is a small fixed constant, so the loop UNROLLS into one
    // declarative 8-level plan — one job, no per-iteration driver sync or
    // checkpoint barrier (a dynamic-N loop would re-introduce them).
    // The rank vector is node-sized and nodes ≪ edges on any co-purchase
    // graph, so it BROADCASTS into the standing edge partitioning: the
    // 2.4M-edge side never moves or re-sorts, and each iteration's only
    // exchange is the map-side-combined dst aggregate. (A web-scale
    // billion-node graph would drop the hint and take the co-partitioned
    // shuffle join on src instead.)
    var ranks = deg.select($"src".as("node"), lit(PrScale).as("r"))
    for (_ <- 1 to PrIters) {
      ranks = edges
        .join(broadcast(ranks), $"src" === $"node")
        .groupBy($"dst")
        .agg(sum(expr("r * w div dw")).as("s"))
        .select($"dst".as("node"),
          (lit(telep) + expr("85 * s div 100")).as("r"))
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
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$GraphWindowLo'
       |    AND l_shipdate < TIMESTAMP '$GraphWindowHi'),
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

  /** Per-node triangle counts (`graph_triangles`) over the undirected
    * co-purchase graph — the local clustering signal behind community
    * detection and recommendation diversity. The classic scalable plan:
    * orient every edge from the LOWER-(degree, id) endpoint to the
    * higher one (a total order, so each triangle survives in exactly one
    * rotation), then one self-join extends each oriented wedge and one
    * more join closes it. Degree-ordered orientation is what makes this
    * survive 100 TB: a node's out-degree is O(sqrt(m)) after orienting,
    * so the wedge join's fan-out is m^1.5 worst-case instead of the
    * hub-degree-squared blowup a naive adjacency join takes on skewed
    * graphs — the same hot-key discipline as the salted join, achieved
    * by construction rather than salting. All joins are equi-joins on
    * node keys; counts are exact integers.
    *
    * The closure step never materializes wedges: each oriented edge
    * (s, t) picks up BOTH endpoints' out-neighbor arrays (bounded at
    * O(sqrt(m)) each by the orientation) and intersects them in place —
    * the per-edge common-neighbor list IS the edge's triangle set, so the
    * only shuffled rows are the m edges and the per-node credit terms,
    * never the wedge fan-out. */
  private def trianglesDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val und = edgesDf(spark, dir).filter($"src" < $"dst")
      .select($"src".as("u"), $"dst".as("v"))
    val deg = und.select($"u".as("node"))
      .unionAll(und.select($"v".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("d"))
    val fwd = $"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v")
    val o = und
      .join(deg.select($"node".as("u"), $"d".as("du")), Seq("u"))
      .join(deg.select($"node".as("v"), $"d".as("dv")), Seq("v"))
      .select(when(fwd, $"u").otherwise($"v").as("s"),
        when(fwd, $"v").otherwise($"u").as("t"))
    val adj = o.groupBy($"s").agg(collect_list($"t").as("nbrs"))
    val closed = o
      .join(adj, Seq("s"))
      .join(adj.select($"s".as("t"), $"nbrs".as("nbrs_t")), Seq("t"))
      .select($"s", $"t", array_intersect($"nbrs", $"nbrs_t").as("common"))
      .filter(size($"common") > 0)
    // triangle {s, t, w} exists once (as its oriented base edge): credit
    // s and t with the edge's triangle count, each closing w with 1
    closed.select($"s".as("node"), size($"common").cast("long").as("c"))
      .unionAll(closed.select($"t".as("node"),
        size($"common").cast("long").as("c")))
      .unionAll(closed.select(explode($"common").as("node"), lit(1L).as("c")))
      .groupBy($"node").agg(sum($"c").as("n_triangles"))
      .select($"node".as("p_partkey"), $"n_triangles")
  }

  private val trianglesSql: String =
    s"""WITH lp AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '$GraphWindowLo'
      |    AND l_shipdate < TIMESTAMP '$GraphWindowHi'),
      |und AS MATERIALIZED (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lp a JOIN lp b USING (l_orderkey)
      |  WHERE a.l_partkey < b.l_partkey),
      |deg AS MATERIALIZED (
      |  SELECT node, count(*) AS d FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und) n
      |  GROUP BY 1),
      |o AS MATERIALIZED (
      |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
      |              THEN u ELSE v END AS s,
      |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
      |              THEN v ELSE u END AS t
      |  FROM und JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
      |tri AS MATERIALIZED (
      |  SELECT e1.s AS a, e1.t AS b, e2.t AS c
      |  FROM o e1
      |  JOIN o e2 ON e2.s = e1.t
      |  JOIN o e3 ON e3.s = e1.s AND e3.t = e2.t)
      |SELECT node AS p_partkey, count(*) AS n_triangles FROM (
      |  SELECT a AS node FROM tri
      |  UNION ALL SELECT b AS node FROM tri
      |  UNION ALL SELECT c AS node FROM tri) x
      |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerankDf(_, _)),
    "graph_triangles" -> (trianglesDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql,
    "graph_triangles" -> trianglesSql
  )
}
