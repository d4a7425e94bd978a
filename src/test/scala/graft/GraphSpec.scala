package graft

import graft.operators.Graph

/** Integer PageRank semantics: the query must equal a from-scratch Scala
  * replay of the same integer fixed-point (the DuckDB oracle covers the
  * SQL formulation; this pins the algorithm itself). */
class GraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("graph_pagerank equals an in-memory integer replay; mass conserved") {
    val out = rowsOf(Graph.queries("graph_pagerank")(spark, dir))
      .map(m => m("p_partkey").asInstanceOf[Long] ->
        m("rank_micros").asInstanceOf[Long]).toMap
    assert(out.nonEmpty)

    // replay: edges from the same builder, then 8 integer iterations
    val edges = Graph.edgesDf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = dw.keys.map(_ -> Graph.PrScale).toMap
    val telep = 15L * Graph.PrScale / 100L
    for (_ <- 1 to Graph.PrIters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      edges.foreach { case (s, d, w) =>
        contrib(d) += r(s) * w / dw(s)
      }
      r = contrib.map { case (n, c) => n -> (telep + 85L * c / 100L) }.toMap
    }
    assert(out == r)

    // floor leakage stays tiny: total mass within 0.1% of N * scale
    val total = out.values.sum.toDouble
    val ideal = out.size.toDouble * Graph.PrScale
    assert(math.abs(total - ideal) / ideal < 0.001)

    // symmetric-graph sanity: ranks positive, and the teleport term is a
    // hard floor for every node
    assert(out.values.forall(_ >= telep))

    // plan shape: the loop unrolls into PrIters broadcast levels over the
    // standing (checkpointed) edge frame — the node-sized rank vector is
    // what moves, never the edges
    val plan = Graph.queries("graph_pagerank")(spark, dir)
      .queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= Graph.PrIters, s"expected >= ${Graph.PrIters} broadcast levels, got $bhj")
    assert(plan.contains("ExistingRDD") || plan.contains("LogicalRDD"),
      "edges must come from the checkpointed standing frame")
  }

  test("graph_triangles equals the brute-force per-node census") {
    val out = rowsOf(Graph.queries("graph_triangles")(spark, dir))
      .map(m => m("p_partkey").asInstanceOf[Long] ->
        m("n_triangles").asInstanceOf[Long]).toMap
    assert(out.nonEmpty)
    // brute force over the undirected edge set
    val und = Graph.edgesDf(spark, dir).collect()
      .filter(r => r.getLong(0) < r.getLong(1))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = (und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val counts = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    und.foreach { case (u, v) =>
      adj(u).intersect(adj(v)).foreach { w =>
        if (w > v) { // {u < v < w}: each triangle counted once
          counts(u) += 1; counts(v) += 1; counts(w) += 1
        }
      }
    }
    assert(out == counts.toMap)
    // every triangle credits exactly 3 nodes
    assert(out.values.sum % 3 == 0)
  }
}
