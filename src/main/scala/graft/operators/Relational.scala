package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.OpModule

/** Standard relational families over the TPC-H-ish tables (SURVEY.md §2.4,
  * §2.7): the reference correlates its streams temporally rather than
  * relationally, but parity/BENCH requires the full join/agg/sort surface a
  * user of any engine expects — and the reference's book⋈price and
  * daily-summary upserts *are* as-of joins and keyed aggregations once
  * expressed relationally.
  *
  * Scale notes (the point of doing these in Spark):
  *  - `q1_pricing` is a pure map-side-combinable hash aggregate: 6 groups,
  *    so the shuffle carries ~6 rows per partition regardless of input size.
  *  - `q3_topk` joins two big fact tables after filters; customer is tiny
  *    and broadcast (checked in the plan), so only orders⋈lineitem shuffles,
  *    on the join key. The top-10 is a `TakeOrderedAndProject`, never a full
  *    sort.
  *  - `join_asof` uses the union-and-carry-forward formulation: tag both
  *    sides, sort within each `o_custkey` partition, carry the last right
  *    row forward with `last(_, ignoreNulls)` over an unbounded-preceding
  *    frame. One shuffle on the key, no range explosion — this is the plan
  *    that survives 100 TB, unlike a naive theta-join. The DuckDB oracle
  *    uses its native ASOF JOIN, so the two formulations cross-check.
  *  - `join_interval` is a genuine range join bounded by an equi-key, the
  *    shape Spark executes as a broadcast/shuffled hash join on the key
  *    with a range filter — key-bounded, so no quadratic blowup.
  */
object Relational extends OpModule {

  private def relDfs(spark: SparkSession, dir: String) = (
    Tables.lineitem(spark, dir),
    Tables.orders(spark, dir),
    Tables.customer(spark, dir))

  /** TPC-H Q1 pricing summary: the canonical partial-agg benchmark. */
  private def q1Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        sum($"l_extendedprice").as("sum_base_price"),
        sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
          .as("sum_charge"),
        avg($"l_quantity").as("avg_qty"),
        avg($"l_extendedprice").as("avg_price"),
        avg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  private val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(l_extendedprice) AS sum_base_price,
      |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
      |  sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS sum_charge,
      |  avg(l_quantity) AS avg_qty,
      |  avg(l_extendedprice) AS avg_price,
      |  avg(l_discount) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shipping priority: broadcast dim ⋈ two facts, top-10. */
  private def q3Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (l, o, c) = relDfs(spark, dir)
    val cut = lit("1997-06-30").cast("timestamp")
    broadcast(c.filter($"c_mktsegment" === "BUILDING"))
      .join(o.filter($"o_orderdate" < cut), $"c_custkey" === $"o_custkey")
      .join(l.filter($"l_shipdate" > cut), $"o_orderkey" === $"l_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  private val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-06-30'
      |  AND l_shipdate > TIMESTAMP '1997-06-30'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped 6-way join: revenue by region/nation. The three dims
    * are broadcast; the two facts shuffle once each on the join key. */
  private def q5Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (l, o, c) = relDfs(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(s), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q5Sql: String =
    """SELECT r_name, n_name,
      |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2""".stripMargin

  /** Left-semi: orders having at least one returned ('R') item. */
  private def semiDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (l, o, _) = relDfs(spark, dir)
    o.join(l.filter($"l_returnflag" === "R"),
        $"o_orderkey" === $"l_orderkey", "left_semi")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  private val semiSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')""".stripMargin

  /** Left-anti: orders with no lineitem shipped after 2000-01-01. */
  private def antiDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (l, o, _) = relDfs(spark, dir)
    o.join(l.filter($"l_shipdate" > lit("2000-01-01").cast("timestamp")),
        $"o_orderkey" === $"l_orderkey", "left_anti")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
  }

  private val antiSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > TIMESTAMP '2000-01-01')""".stripMargin

  /** As-of join (SURVEY §2.4 book⋈last-trade): for each open ('O') order,
    * the customer's most recent finalized ('F') order at or before its
    * date. Spark side: tag both streams, union, one shuffle on the key,
    * carry the latest right row forward — O(n log n) per key, no range
    * explosion. Right side pre-deduped per (key, ts) with arg_max for a
    * deterministic tie-break; DuckDB cross-checks with native ASOF JOIN.
    */
  private def asofDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val left = o.filter($"o_orderstatus" === "O")
      .select($"o_custkey".as("k"), $"o_orderdate".as("ts"),
        $"o_orderkey", lit(1).as("side"),
        lit(null).cast("double").as("r_price"), lit(null).cast("timestamp").as("r_ts"))
    val right = o.filter($"o_orderstatus" === "F")
      .groupBy($"o_custkey".as("k"), $"o_orderdate".as("ts"))
      .agg(max_by($"o_totalprice", $"o_orderkey").as("price"))
      .select($"k", $"ts", lit(null).cast("long").as("o_orderkey"),
        lit(0).as("side"), $"price".as("r_price"), $"ts".as("r_ts"))
    // right rows sort before left rows at equal ts (side 0 < 1) so an
    // 'F' order on the same date is visible to the 'O' order — mirrors
    // ASOF's >= semantics.
    val w = Window.partitionBy($"k").orderBy($"ts", $"side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("last_price", last($"r_price", ignoreNulls = true).over(w))
      .withColumn("last_ts", last($"r_ts", ignoreNulls = true).over(w))
      .filter($"side" === 1 && $"last_price".isNotNull)
      .select($"o_orderkey", $"k".as("o_custkey"), $"ts".as("o_orderdate"),
        $"last_ts".as("prev_f_date"), $"last_price".as("prev_f_price"))
  }

  private val asofSql: String =
    """WITH f AS (
      |  SELECT o_custkey AS k, o_orderdate AS fts,
      |         arg_max(o_totalprice, o_orderkey) AS price
      |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2)
      |SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
      |       f.fts AS prev_f_date, f.price AS prev_f_price
      |FROM orders o
      |ASOF JOIN f ON o.o_custkey = f.k AND o.o_orderdate >= f.fts
      |WHERE o.o_orderstatus = 'O'""".stripMargin

  /** Max staleness for the tolerance-bounded as-of join, in days. */
  val AsofTolDays = 365

  /** Tolerance-bounded as-of join (`join_asof_tol`) — the variant every
    * time-series library pairs with plain as-of (pandas `merge_asof
    * tolerance=`, kdb `wj` windows): a match older than [[AsofTolDays]]
    * is STALE and reports as no-match, and the join is LEFT — every
    * probe row survives with a `matched` verdict. Same single-shuffle
    * union + last(ignoreNulls) plan as `join_asof` (the tolerance is a
    * post-carry projection, free at any scale); the oracle cross-checks
    * with DuckDB's native ASOF LEFT JOIN plus the staleness screen. At
    * 100 TB this is the book⋈trade correlation with a "quote too old to
    * trust" guard — the live twin is `Streams.bookAtPrint`'s watermark.
    */
  private def asofTolDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val left = o.filter($"o_orderstatus" === "O")
      .select($"o_custkey".as("k"), $"o_orderdate".as("ts"),
        $"o_orderkey", lit(1).as("side"),
        lit(null).cast("double").as("r_price"),
        lit(null).cast("timestamp").as("r_ts"))
    val right = o.filter($"o_orderstatus" === "F")
      .groupBy($"o_custkey".as("k"), $"o_orderdate".as("ts"))
      .agg(max_by($"o_totalprice", $"o_orderkey").as("price"))
      .select($"k", $"ts", lit(null).cast("long").as("o_orderkey"),
        lit(0).as("side"), $"price".as("r_price"), $"ts".as("r_ts"))
    val w = Window.partitionBy($"k").orderBy($"ts", $"side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("last_price", last($"r_price", ignoreNulls = true).over(w))
      .withColumn("last_ts", last($"r_ts", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .withColumn("matched", $"last_ts".isNotNull &&
        datediff($"ts", $"last_ts") <= AsofTolDays)
      .select($"o_orderkey", $"k".as("o_custkey"), $"ts".as("o_orderdate"),
        when($"matched", $"last_ts").as("prev_f_date"),
        when($"matched", $"last_price").as("prev_f_price"),
        $"matched")
  }

  private val asofTolSql: String =
    s"""WITH f AS (
       |  SELECT o_custkey AS k, o_orderdate AS fts,
       |         arg_max(o_totalprice, o_orderkey) AS price
       |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2)
       |SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       |  CASE WHEN f.fts IS NOT NULL
       |        AND date_diff('day', f.fts, o.o_orderdate) <= $AsofTolDays
       |       THEN f.fts END AS prev_f_date,
       |  CASE WHEN f.fts IS NOT NULL
       |        AND date_diff('day', f.fts, o.o_orderdate) <= $AsofTolDays
       |       THEN f.price END AS prev_f_price,
       |  f.fts IS NOT NULL
       |    AND date_diff('day', f.fts, o.o_orderdate) <= $AsofTolDays
       |    AS matched
       |FROM orders o
       |ASOF LEFT JOIN f ON o.o_custkey = f.k AND o.o_orderdate >= f.fts
       |WHERE o.o_orderstatus = 'O'""".stripMargin

  /** Interval join: finalized orders within the 90 days before each open
    * order of the same customer (equi-key + range predicate). */
  private def intervalDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val left = o.filter($"o_orderstatus" === "O")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val right = o.filter($"o_orderstatus" === "F")
      .select($"o_custkey".as("f_custkey"), $"o_orderdate".as("f_date"),
        $"o_totalprice".as("f_price"))
    left
      .join(right,
        $"o_custkey" === $"f_custkey" &&
          $"f_date" >= $"o_orderdate" - expr("INTERVAL 90 DAYS") &&
          $"f_date" < $"o_orderdate",
        "left")
      .groupBy($"o_orderkey", $"o_custkey", $"o_orderdate")
      .agg(count($"f_date").as("n_recent_f"),
        coalesce(sum($"f_price"), lit(0.0)).as("sum_recent_f"))
  }

  private val intervalSql: String =
    """SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
      |  count(f.o_orderdate) AS n_recent_f,
      |  coalesce(sum(f.o_totalprice), 0.0) AS sum_recent_f
      |FROM orders o
      |LEFT JOIN orders f ON f.o_custkey = o.o_custkey
      |  AND f.o_orderstatus = 'F'
      |  AND f.o_orderdate >= o.o_orderdate - INTERVAL 90 DAY
      |  AND f.o_orderdate < o.o_orderdate
      |WHERE o.o_orderstatus = 'O'
      |GROUP BY 1, 2, 3""".stripMargin

  /** Top-3 orders per customer (rank window + filter; the reference's
    * head-N-after-sort family, SURVEY §2.7). */
  private def topkDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
  }

  private val topkSql: String =
    """SELECT o_custkey,
      |  row_number() OVER (PARTITION BY o_custkey
      |                     ORDER BY o_totalprice DESC, o_orderkey) AS rk,
      |  o_orderkey, o_totalprice
      |FROM orders QUALIFY rk <= 3""".stripMargin

  /** Rollup aggregation (subtotal + grand-total rows). Labels coalesce to
    * 'ALL' — the raw data has no NULL group keys, so this is unambiguous
    * and keeps the compare engine-neutral. */
  private def rollupDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"revenue", $"n_items")
  }

  private val rollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** CUBE — rollup's sibling: ALL grouping combinations including the
    * cross-margins rollup omits (the (·, linestatus) slice). One Expand
    * + hash aggregation, like rollup. */
  private def cubeDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"revenue", $"n_items")
  }

  private val cubeSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** GROUPING SETS — the third member of the subtotal family: ONLY the
    * two one-dimension margins, no detail cells and no grand total —
    * the shape neither rollup nor cube can express (both always carry
    * the detail level). Same single Expand + hash aggregation plan. */
  private def groupingSetsDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupingSets(Seq(Seq($"l_returnflag"), Seq($"l_linestatus")),
        $"l_returnflag", $"l_linestatus")
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"revenue", $"n_items")
  }

  private val groupingSetsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin

  /** Bucket count for the co-located join — 8 here so sf0.001 buckets
    * stay non-trivial; a 100 TB deployment dials this to O(1024) so each
    * bucket file stays executor-sized. */
  val BucketN = 8

  private def bucketedName(t: String, dir: String): String =
    "g_b_" + t + "_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** One-time bucketed layout write (idempotent per session via the
    * catalog check; `overwrite` heals any stale directory from a prior
    * run). `repartition` on the bucket key before the write aligns task
    * partitioning with the bucket hash so each bucket lands in one file
    * — the layout where the read side needs neither Exchange nor Sort. */
  private def ensureBucketed(spark: SparkSession, dir: String): (String, String) = {
    import spark.implicits._
    val on = bucketedName("orders", dir)
    val ln = bucketedName("lineitem", dir)
    if (!spark.catalog.tableExists(on)) {
      Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_orderpriority")
        .repartition(BucketN, $"o_orderkey")
        .write.mode("overwrite")
        .option("path", s"target/bucketed/$on")
        .bucketBy(BucketN, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(on)
    }
    if (!spark.catalog.tableExists(ln)) {
      Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
        .repartition(BucketN, $"l_orderkey")
        .write.mode("overwrite")
        .option("path", s"target/bucketed/$ln")
        .bucketBy(BucketN, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(ln)
    }
    (on, ln)
  }

  /** Bucketed co-located join (`join_bucketed`): both sides are written
    * bucketed + sorted on the join key, so the fact-fact join reads
    * co-partitioned files and the SortMergeJoin runs with ZERO Exchange
    * under it — the one shuffle left in the plan is the 5-group
    * priority aggregate. This is THE technique for the repeated
    * fact-fact join at 100 TB: pay one layout write, then every
    * subsequent join of these tables skips its shuffle entirely
    * (RelationalSpec asserts the exchange count on this exact builder).
    * Orders⋈lineitem here is the stand-in for the reference's repeated
    * trades⋈decisions correlation (strategy.py's per-cycle join). */
  private[graft] def bucketedJoinDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (on, ln) = ensureBucketed(spark, dir)
    spark.table(on).join(spark.table(ln), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .select($"o_orderpriority".as("priority"), $"revenue", $"n_items")
  }

  private val bucketedJoinSql: String =
    """SELECT o_orderpriority AS priority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1""".stripMargin

  /** Promotion revenue share per ship-year (the TPC-H Q14 shape, over
    * the public spec): lineitem ⋈ broadcast(part) with a conditional
    * aggregate — the canonical fact ⋈ tiny-dim plan where the dim side
    * NEVER shuffles (a 100 TB lineitem joins a broadcast part table in
    * map-side work only; `q3_topk` proves the same for customer). Share
    * is rounded 6 so engine summation trees cannot leak through the
    * ratio. */
  private def promoShareDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select($"p_partkey", $"p_type")), $"l_partkey" === $"p_partkey")
      .groupBy(year($"l_shipdate").cast("long").as("yr"))
      .agg(sum(when($"p_type" === "PROMO", rev).otherwise(0.0))
        .as("promo_rev"),
        sum(rev).as("total_rev"))
      .withColumn("promo_share", round($"promo_rev" / $"total_rev", 6))
  }

  private val promoShareSql: String =
    """SELECT year(l_shipdate)::BIGINT AS yr,
      |  sum(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
      |    AS promo_rev,
      |  sum(l_extendedprice * (1.0 - l_discount)) AS total_rev,
      |  round(sum(CASE WHEN p_type = 'PROMO'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) /
      |      sum(l_extendedprice * (1.0 - l_discount)), 6) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1""".stripMargin

  /** Large-volume orders (the TPC-H Q18 shape, public spec): aggregate
    * lineitem per order, HAVING-filter on the aggregate, join the
    * survivor keys back to orders, top-20 without a global sort. The
    * aggregate-then-filter side collapses to (orderkey, sum) rows
    * BEFORE the join — the survivor frame broadcasts — and quantities
    * are integral doubles so the HAVING boundary and the ordering are
    * engine-exact. */
  private def bigOrdersDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 150.0)
    Tables.orders(spark, dir)
      .join(broadcast(big), $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"sum_qty")
      .orderBy($"sum_qty".desc, $"o_orderkey")
      .limit(20)
  }

  private val bigOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, sum_qty
      |FROM orders JOIN (
      |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
      |  FROM lineitem GROUP BY 1 HAVING sum_qty > 150.0
      |) ON o_orderkey = l_orderkey
      |ORDER BY sum_qty DESC, o_orderkey
      |LIMIT 20""".stripMargin

  /** RFM segmentation (`customer_rfm`) — the classic warehouse
    * customer-scoring job: recency (days since last order vs the
    * corpus's latest), frequency, monetary, each quintiled WITHIN the
    * customer's market segment (so the ntile windows partition by
    * segment and stay dimension-bounded — no single global sort).
    * Monetary rounds to cents before ordering so double-summation
    * trees cannot flip a quintile boundary between engines; all tile
    * orders tiebreak on the key. Plan: one orders aggregation, one
    * broadcast dim join, three windows over the same
    * segment-partitioned frame. */
  private def rfmDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val DayUs = 86400000000L
    val per = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(max(unix_micros($"o_orderdate".cast("timestamp"))).as("last_us"),
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("monetary"))
    val mx = per.agg(max($"last_us").as("mx"))
    val seg = per.crossJoin(broadcast(mx))
      .withColumn("recency_days", expr(s"(mx - last_us) div $DayUs"))
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment")),
        $"o_custkey" === $"c_custkey")
    def tile(order: Seq[Column]) = ntile(5).over(
      Window.partitionBy($"c_mktsegment").orderBy(order: _*)).cast("long")
    seg.select($"c_custkey", $"c_mktsegment", $"recency_days",
      $"n_orders", $"monetary",
      tile(Seq($"recency_days", $"c_custkey")).as("r_tile"),
      tile(Seq($"n_orders".desc, $"c_custkey")).as("f_tile"),
      tile(Seq($"monetary".desc, $"c_custkey")).as("m_tile"))
  }

  private val rfmSql: String =
    """WITH per AS (
      |  SELECT o_custkey, max(epoch_us(o_orderdate)) AS last_us,
      |    count(*) AS n_orders, round(sum(o_totalprice), 2) AS monetary
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT max(last_us) AS mx FROM per)
      |SELECT c_custkey, c_mktsegment,
      |  (mx - last_us) // 86400000000 AS recency_days,
      |  n_orders, monetary,
      |  ntile(5) OVER (PARTITION BY c_mktsegment
      |    ORDER BY (mx - last_us) // 86400000000, c_custkey)::BIGINT AS r_tile,
      |  ntile(5) OVER (PARTITION BY c_mktsegment
      |    ORDER BY n_orders DESC, c_custkey)::BIGINT AS f_tile,
      |  ntile(5) OVER (PARTITION BY c_mktsegment
      |    ORDER BY monetary DESC, c_custkey)::BIGINT AS m_tile
      |FROM per, mx JOIN customer ON c_custkey = o_custkey""".stripMargin

  /** Monthly revenue trend with year-over-year growth
    * (`orders_monthly`): the standard reporting series — revenue per
    * calendar month, the same month last year via a self-join on
    * `ym - 100` (NOT `lag(12)`, which silently pairs a month with
    * whatever row sat 12 positions back when a calendar month has no
    * orders), and integer-basis-point growth. The self-join runs over
    * the ALREADY-AGGREGATED series (~84 rows at any corpus size, so
    * the small side broadcasts); the only data-sized work is one hash
    * aggregation. Revenue rounds to cents before the ratio so the
    * growth integer cannot wobble with summation order. */
  private def monthlyDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = Tables.orders(spark, dir)
      .groupBy((year($"o_orderdate") * 100 +
        month($"o_orderdate")).cast("long").as("ym"))
      .agg(round(sum($"o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
    val prev = m.select($"ym".as("ym_p"), $"revenue".as("revenue_prev_year"))
    m.join(broadcast(prev), $"ym_p" === $"ym" - 100, "left")
      .drop("ym_p")
      // floor of a double both engines compute identically (same ops,
      // same order) — not an integer cast, whose double rounding rule
      // differs between engines
      .withColumn("yoy_bp", floor(
        ($"revenue" - $"revenue_prev_year") * 10000.0 /
          $"revenue_prev_year").cast("long"))
  }

  private val monthlySql: String =
    """WITH m AS (
      |  SELECT (year(o_orderdate) * 100 + month(o_orderdate))::BIGINT AS ym,
      |    round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT m.ym, m.revenue, m.n_orders,
      |  p.revenue AS revenue_prev_year,
      |  floor((m.revenue - p.revenue) * 10000.0 / p.revenue)::BIGINT AS yoy_bp
      |FROM m LEFT JOIN m p ON p.ym = m.ym - 100""".stripMargin

  /** Small-quantity-order revenue (`q17_small_qty`, the TPC-H Q17
    * shape over the public spec): revenue lost to orders below 20% of a
    * part's average order quantity, for one brand — the canonical
    * CORRELATED SCALAR AGGREGATE, decorrelated Spark-first: the
    * per-part threshold is its own aggregation joined back (never a
    * per-row subquery execution), and both the threshold-building scan
    * and the probe scan push the brand filter through the broadcast
    * part join, so each side reads only the brand's slice. Revenue
    * rounds to cents per the house convention. The oracle keeps the
    * textbook correlated-subquery form, so the two formulations
    * cross-check. */
  private def q17Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val brandParts = broadcast(Tables.part(spark, dir)
      .filter($"p_brand" === "Brand#4").select($"p_partkey"))
    val brandLines = li.join(brandParts, $"l_partkey" === $"p_partkey")
    val thresholds = brandLines.groupBy($"l_partkey")
      .agg((avg($"l_quantity") * 0.2).as("qty_cut"))
    brandLines.join(thresholds, Seq("l_partkey"))
      .filter($"l_quantity" < $"qty_cut")
      .agg(round(sum($"l_extendedprice"), 2).as("small_qty_revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q17Sql: String =
    """SELECT round(sum(l_extendedprice), 2) AS small_qty_revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4'
      |  AND l_quantity < (
      |    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** Revenue concentration curve (`orders_pareto`): per market segment,
    * how many of its customers carry 80% of its revenue — the Pareto
    * question every account-management report opens with, and
    * `supplier_hhi`'s cumulative-curve complement. Customers rank by
    * cents-rounded revenue (ties on custkey) inside their segment; the
    * running share is a rank window over the ALREADY-AGGREGATED
    * per-customer frame (|customers| rows, partitioned by segment —
    * data-sized work is the one orders aggregation). Integer
    * cross-multiplication (`cum * 100 >= total * 80`) keeps the 80%
    * cut exact on both engines. */
  private def paretoDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 2).as("rev"))
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment")),
        $"o_custkey" === $"c_custkey")
    // integer cents make the cumulative compare exact
    val cents = per.select($"c_mktsegment",
      round($"rev" * 100).cast("long").as("rc"), $"o_custkey")
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"rc".desc, $"o_custkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cents.groupBy($"c_mktsegment")
      .agg(sum($"rc").as("total"), count(lit(1)).as("n_customers"))
    // n_top80 = FIRST rank whose running share crosses 80% — min over
    // the crossing rows, not count(pre-crossing)+1: the count form
    // leaves ZERO rows (segment vanishes) when the top customer alone
    // carries >=80%, where the min form correctly reports n_top80 = 1.
    // cum is non-decreasing so both agree everywhere else.
    val wRank = Window.partitionBy($"c_mktsegment")
      .orderBy($"rc".desc, $"o_custkey")
    cents
      .withColumn("rn", row_number().over(wRank))
      .withColumn("cum", sum($"rc").over(w))
      .join(tot, Seq("c_mktsegment"))
      .groupBy($"c_mktsegment")
      .agg(min(when($"cum" * 100 >= $"total" * 80, $"rn")).as("n_top80"),
        first($"n_customers").as("n_customers"))
      .select($"c_mktsegment", $"n_customers", $"n_top80",
        expr("(n_top80 * 1000) div n_customers").as("top80_permille"))
  }

  private val paretoSql: String =
    """WITH per AS (
      |  SELECT c_mktsegment, o_custkey,
      |    round(sum(o_totalprice), 2) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |c AS (SELECT c_mktsegment, o_custkey,
      |        round(rev * 100)::BIGINT AS rc FROM per),
      |t AS (SELECT c_mktsegment, sum(rc)::BIGINT AS total,
      |        count(*) AS n_customers FROM c GROUP BY 1),
      |r AS (SELECT c.c_mktsegment, rc,
      |        row_number() OVER (PARTITION BY c.c_mktsegment
      |          ORDER BY rc DESC, o_custkey) AS rn,
      |        sum(rc) OVER (PARTITION BY c.c_mktsegment
      |          ORDER BY rc DESC, o_custkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |          AS cum,
      |        t.total, t.n_customers
      |      FROM c JOIN t USING (c_mktsegment))
      |SELECT c_mktsegment, n_customers,
      |  min(CASE WHEN cum * 100 >= total * 80 THEN rn END)::BIGINT
      |    AS n_top80,
      |  ((min(CASE WHEN cum * 100 >= total * 80 THEN rn END) * 1000)
      |    // n_customers)::BIGINT AS top80_permille
      |FROM r GROUP BY 1, 2""".stripMargin

  /** Ordered array aggregation (`order_line_array`): per order, its
    * line quantities as a LINENUMBER-ORDERED array — the collect-and-
    * keep-order shape a document/feature assembler uses — probed with
    * array functions (element_at head/tail, a position-weighted
    * `aggregate` fold) so the ORDER inside the array is what the hash
    * checks, not just the multiset. One hash aggregation; arrays are
    * per-group (≤7 lines per order), never corpus-sized. */
  private def lineArrayDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_items"),
        sort_array(collect_list(struct($"l_linenumber", $"l_quantity")))
          .as("arr"))
      .select($"l_orderkey", $"n_items",
        element_at($"arr", 1).getField("l_quantity").as("first_qty"),
        element_at($"arr", -1).getField("l_quantity").as("last_qty"),
        aggregate($"arr", lit(0L), (acc, x) =>
          acc + (x.getField("l_quantity") * x.getField("l_linenumber"))
            .cast("long")).as("qty_checksum"))
  }

  // the synthetic data does NOT keep l_linenumber unique per order, so
  // the list order tie-breaks on quantity — the same lexicographic
  // (linenumber, quantity) order the engine's struct sort uses
  private val lineArraySql: String =
    """SELECT l_orderkey, count(*) AS n_items,
      |  (list(l_quantity ORDER BY l_linenumber, l_quantity))[1] AS first_qty,
      |  (list(l_quantity ORDER BY l_linenumber, l_quantity))[-1] AS last_qty,
      |  sum((l_quantity * l_linenumber)::BIGINT)::BIGINT AS qty_checksum
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Supplier revenue concentration (`supplier_hhi`): per-supplier
    * revenue share and the Herfindahl–Hirschman index (Σ share², the
    * public antitrust-screening statistic) — the supply-risk number a
    * procurement report leads with. Shares divide cents-rounded
    * revenue by the cents-rounded total so both engines divide the
    * same doubles; the HHI row rides every supplier row (a broadcast
    * 1-row cross join), keeping the output one self-contained frame.
    * Plan: one lineitem aggregation keyed by suppkey, a broadcast join
    * to supplier (names), one tiny re-aggregation for the index. */
  private def supplierHhiDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
        .as("revenue"))
    val tot = per.agg(round(sum($"revenue"), 2).as("total"))
    val shares = per.crossJoin(broadcast(tot))
      .withColumn("share", $"revenue" / $"total")
    val hhi = shares.agg(round(sum($"share" * $"share"), 6).as("hhi"),
      count(lit(1)).as("n_suppliers"))
    shares
      .join(broadcast(Tables.supplier(spark, dir)
        .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
      .crossJoin(broadcast(hhi))
      .select($"l_suppkey".as("suppkey"), $"s_name", $"revenue",
        round($"share", 6).as("share"), $"hhi", $"n_suppliers")
  }

  private val supplierHhiSql: String =
    """WITH per AS (
      |  SELECT l_suppkey,
      |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT round(sum(revenue), 2) AS total FROM per),
      |sh AS (SELECT l_suppkey, revenue, revenue / total AS share
      |       FROM per, tot),
      |h AS (SELECT round(sum(share * share), 6) AS hhi,
      |        count(*) AS n_suppliers FROM sh)
      |SELECT l_suppkey AS suppkey, s_name, revenue,
      |  round(share, 6) AS share, hhi, n_suppliers
      |FROM sh JOIN supplier ON s_suppkey = l_suppkey, h""".stripMargin

  /** Distinct projection (SURVEY §2.8 has one union/distinct surface). */
  private def distinctDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(($"user_id" % 10).as("user_mod"), $"event_type")
      .distinct()
  }

  private val distinctSql: String =
    "SELECT DISTINCT user_id % 10 AS user_mod, event_type FROM events"

  /** Semi-structured path: parse the `props` JSON column, aggregate by the
    * extracted key (the reference parses nested REST/WS JSON payloads at
    * every source, SURVEY §2.10). */
  private def jsonDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy(expr("k div 10").as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
  }

  private val jsonSql: String =
    """SELECT json_extract_string(props, '$.k')::BIGINT // 10 AS k_bucket,
      |  count(*) AS n, sum(value) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  /** Languages pivoted to columns — fixed list so the output schema is
    * static (an open-ended `.pivot(col)` would scan once just to learn
    * the columns; at scale you always pass the value list). */
  val PivotLangs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Cross-tab / PIVOT (`pivot_source_lang`): documents counted per
    * source with one column per language — Spark's `.pivot` with an
    * explicit value list compiles to ONE hash aggregation whose
    * aggregate expressions are per-language conditional counts (no
    * second pass, no shuffle beyond the groupBy); the oracle writes the
    * same conditional aggregation longhand. */
  private def pivotDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"source")
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
      // pivot leaves absent cells null; the oracle's counts are 0
      .select($"source" +: PivotLangs.map(l =>
        coalesce(col(l), lit(0L)).as(l)): _*)
  }

  private val pivotSql: String = {
    val cols = PivotLangs.map(l =>
      s"sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END)::BIGINT AS $l")
      .mkString(",\n  ")
    s"""SELECT source,
       |  $cols
       |FROM documents GROUP BY 1""".stripMargin
  }

  /** Set-operator family completion (`set_ops`): INTERSECT / EXCEPT /
    * UNION over the purchase-users and error-users sets, folded to one
    * summary row per operator. Spark plans INTERSECT as a left-semi and
    * EXCEPT as a left-anti over the deduplicated sides — the same
    * bounded join shapes as `join_semi`/`join_anti`, exercised through
    * the set-operator API the reference's SQL surface exposes. */
  private def setOpsDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def users(t: String) = Tables.events(spark, dir)
      .filter($"event_type" === t).select($"user_id").distinct()
    val buy = users("purchase")
    val err = users("error")
    Seq(
      ("intersect", buy.intersect(err)),
      ("except", buy.except(err)),
      ("union", buy.union(err).distinct())
    ).map { case (op, df) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(op).as("op"), $"n_users")
    }.reduce(_ unionByName _)
  }

  private val setOpsSql: String =
    s"""WITH buy AS (SELECT DISTINCT user_id FROM events
       |            WHERE event_type = 'purchase'),
       |err AS (SELECT DISTINCT user_id FROM events
       |        WHERE event_type = 'error')
       |SELECT 'intersect' AS op,
       |  (SELECT count(*) FROM (SELECT * FROM buy INTERSECT SELECT * FROM err))
       |    AS n_users
       |UNION ALL
       |SELECT 'except',
       |  (SELECT count(*) FROM (SELECT * FROM buy EXCEPT SELECT * FROM err))
       |UNION ALL
       |SELECT 'union',
       |  (SELECT count(*) FROM (SELECT * FROM buy UNION SELECT * FROM err))""".stripMargin

  /** Top supplier by windowed revenue (`q15_top_supplier`, the TPC-H
    * Q15 shape over the public spec): revenue per supplier over one
    * shipdate quarter, keep the supplier(s) achieving the MAX — the
    * canonical MAX-OVER-VIEW decorrelation. Spark-first: the scalar max
    * is a 1-row aggregate broadcast back over the per-supplier frame
    * (never a per-row subquery), and the max-equality compares EXACT
    * integer cents so engine summation-tree ulps cannot split or merge
    * the argmax set. Data-sized work is one filtered lineitem
    * aggregation keyed by suppkey; everything after is
    * |suppliers|-sized. The oracle keeps the textbook scalar-subquery
    * view form, so the two formulations cross-check. */
  private def q15Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // per-row round-then-integer-sum (the q6/q7/q8/q11 canon): the
    // argmax key rc is an order-independent BIGINT sum, so a
    // summation-tree ulp can never flip WHICH suppliers tie for max;
    // total_revenue derives from rc, bit-identical on both engines
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
        .cast("long")).as("rc"))
      .withColumn("total_revenue", $"rc" / 100.0)
    val mx = rev.agg(max($"rc").as("rc_max"))
    rev.crossJoin(broadcast(mx))
      .filter($"rc" === $"rc_max")
      .join(broadcast(Tables.supplier(spark, dir)
        .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey".as("suppkey"), $"s_name", $"total_revenue")
  }

  private val q15Sql: String =
    """WITH c AS (
      |  SELECT l_suppkey,
      |    sum(round(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT)
      |      ::BIGINT AS rc
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey AS suppkey, s_name, rc / 100.0 AS total_revenue
      |FROM c JOIN supplier ON s_suppkey = l_suppkey
      |WHERE rc = (SELECT max(rc) FROM c)""".stripMargin

  /** Days after the order date a shipment counts as late for
    * [[q21Df]] (the synthetic schema has no commit/receipt dates, so
    * lateness is ship-vs-order). */
  val LateDays = 60

  /** Sole-late supplier (`q21_sole_late`, the TPC-H Q21 shape
    * re-anchored on the columns this schema has): for finished orders
    * involving ≥2 suppliers, count per supplier the late lines
    * (shipped > [[LateDays]] after the order date) on orders where that
    * supplier was the ONLY late one — the canonical DOUBLE-CORRELATED
    * EXISTS / NOT EXISTS, the textbook hard decorrelation case.
    * Spark-first it is one keyed aggregation plus one window, no
    * subqueries at all: per (order, supplier) late-line counts, then
    * the per-order supplier count and late-supplier count as UNORDERED
    * windows over that already-reduced frame (never a second lineitem
    * scan or a self-join); a row qualifies iff its order has
    * n_supp > 1 and n_late_supp == 1 and it is the late one. Both
    * EXISTS collapse into counts the plan computes once — one
    * data-sized shuffle keyed by (orderkey, suppkey), then a
    * reduced-frame exchange on orderkey, then one by suppkey.
    * The oracle keeps the textbook correlated form. */
  private def q21Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
    val perSupp = lines.groupBy($"l_orderkey", $"l_suppkey")
      .agg(sum(when(
        $"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $LateDays DAY"),
        1L).otherwise(0L)).as("n_late"))
    val w = Window.partitionBy($"l_orderkey")
    perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp",
        sum(when($"n_late" > 0, 1L).otherwise(0L)).over(w))
      .filter($"n_late" > 0 && $"n_supp" > 1 && $"n_late_supp" === 1)
      .groupBy($"l_suppkey")
      .agg(sum($"n_late").as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
      .select($"s_name", $"numwait")
  }

  private val q21Sql: String =
    s"""SELECT s_name, count(*)::BIGINT AS numwait
       |FROM supplier
       |JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
       |JOIN orders ON o_orderkey = l1.l_orderkey
       |WHERE o_orderstatus = 'F'
       |  AND l1.l_shipdate > o_orderdate + INTERVAL $LateDays DAY
       |  AND EXISTS (
       |    SELECT 1 FROM lineitem l2
       |    WHERE l2.l_orderkey = l1.l_orderkey
       |      AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM lineitem l3
       |    WHERE l3.l_orderkey = l1.l_orderkey
       |      AND l3.l_suppkey <> l1.l_suppkey
       |      AND l3.l_shipdate > o_orderdate + INTERVAL $LateDays DAY)
       |GROUP BY 1
       |ORDER BY numwait DESC, s_name
       |LIMIT 20""".stripMargin

  /** Idle rich customers per nation (`q22_idle_capital`, the TPC-H Q22
    * shape — nation standing in for the phone-prefix country code this
    * schema lacks): customers whose balance beats the positive-balance
    * average AND who placed no order since 2000, grouped by nation —
    * the canonical SCALAR-SUBQUERY THRESHOLD + ANTI-JOIN combination.
    * The threshold compares by integer cross-multiplication
    * (cents · n_pos > total_pos_cents), so the average never
    * materializes as a double and engine summation order cannot move
    * customers across the cut. The anti-join shuffles on custkey (both
    * sides keyed); the threshold is a broadcast 1-row frame. */
  private def q22Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val thr = cust.filter($"c_acctbal" > 0)
      .agg(sum(round($"c_acctbal" * 100).cast("long")).as("pos_cents"),
        count(lit(1)).as("n_pos"))
    val recent = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey")
    cust.crossJoin(broadcast(thr))
      .filter(round($"c_acctbal" * 100).cast("long") * $"n_pos" > $"pos_cents")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_custs"),
        round(sum($"c_acctbal"), 2).as("total_acctbal"))
  }

  private val q22Sql: String =
    """SELECT n_name, count(*) AS n_custs,
      |  round(sum(c_acctbal), 2) AS total_acctbal
      |FROM customer JOIN nation ON n_nationkey = c_nationkey
      |WHERE round(c_acctbal * 100)::BIGINT *
      |    (SELECT count(*) FROM customer WHERE c_acctbal > 0)
      |  > (SELECT sum(round(c_acctbal * 100)::BIGINT)
      |     FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1""".stripMargin

  /** Distribution window functions (`window_dist`): per-nation customer
    * balance quartiles (`ntile`), `percent_rank`, and `cume_dist` —
    * the SQL window-distribution family completing §2.6 beyond ranks
    * and frames. The order key is (balance DESC, custkey), fully
    * unique, so rank == row_number and both engines' percent_rank /
    * cume_dist divide the SAME exactly-representable integers —
    * bit-identical doubles with no rounding needed. One shuffle on the
    * partition key; at corpus scale the per-nation partitions are the
    * natural ~1/25 slices. */
  private def windowDistDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal")
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
  }

  private val windowDistSql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey
      |             ORDER BY c_acctbal DESC, c_custkey)""".stripMargin

  /** Minimum co-occurrence count for a [[basketDf]] pair to surface. */
  val BasketMinSupport = 2

  /** Per-basket member budget for pair enumeration — the basket twin
    * of `Dedup.LshPairCap` (same guard family, same rationale): pair
    * output is quadratic in BASKET size, and while this schema's
    * baskets hold ≤ a dozen distinct parts, a retail-scale corpus with
    * 1,000-item carts would make one hot basket emit 500k pairs. Over
    * the cap only the first [[BasketPairCap]] parts (by part key —
    * the basket array is sorted, so the slice is deterministic)
    * enumerate; every basket on this schema, and any sane one, is
    * exact. Marginals (`cnt`, `n_orders`) stay uncapped — they are
    * linear and need no guard. */
  val BasketPairCap = 64

  /** Market-basket co-occurrence (`basket_pairs`): part pairs ordered
    * together, with support and LIFT (observed co-rate over the rate
    * independence predicts) — the frequent-itemset/association-rule
    * primitive, which is also exactly the co-occurrence shape a
    * training-data pipeline uses for token/domain co-occurrence stats.
    * Scale shape: the pair self-join is keyed by orderkey and an order
    * has ≤ a dozen distinct parts, so pairs-per-order is bounded and
    * the join output is linear in orders — the quadratic term rides
    * the BASKET size, not the corpus, and [[BasketPairCap]] bounds it
    * even against a pathological hot basket (contrast the shingle
    * posting lists, which need `HotShingleCap`). The pair generator is NOT a
    * self-join: baskets collect into per-order sorted part arrays (≤ a
    * dozen elements) and pairs explode per-row — one shuffle keyed by
    * orderkey, one by pair, no join of the corpus against itself.
    * Per-part counts are dimension-sized and broadcast; the orders
    * total is a 1-row cross join; lift divides exactly-representable
    * longs, rounded 6 on both engines. Top-50 by (support, part_a,
    * part_b) is a TakeOrderedAndProject, never a full sort. */
  private def basketDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val baskets = graft.functions.DfMemo.cached(spark, s"baskets:$dir")(
      Tables.lineitem(spark, dir)
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"l_partkey")).as("ps")))
    // memoized: cnt broadcasts into BOTH pair sides (part_a, part_b) —
    // un-checkpointed, each reference re-ran the explode + count over
    // every basket; the frame itself is dimension-sized (one row per
    // distinct part)
    val cnt = graft.functions.DfMemo.cached(spark, s"basket_cnt:$dir")(
      baskets.select(explode($"ps").as("l_partkey"))
        .groupBy($"l_partkey").agg(count(lit(1)).as("cnt")))
    val tot = baskets.agg(count(lit(1)).as("n_orders"))
    baskets
      // hot-basket guard: enumerate pairs over at most the first
      // BasketPairCap (sorted) parts — exact for every sub-cap basket
      .select(explode(expr(
        s"""flatten(transform(slice(ps, 1, $BasketPairCap), (x, i) ->
          |  transform(slice(ps, i + 2, $BasketPairCap - i - 1), y ->
          |    struct(x AS part_a, y AS part_b))))""".stripMargin)).as("p"))
      .groupBy($"p.part_a".as("part_a"), $"p.part_b".as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= BasketMinSupport)
      .join(broadcast(cnt.select($"l_partkey".as("part_a"),
        $"cnt".as("cnt_a"))), Seq("part_a"))
      .join(broadcast(cnt.select($"l_partkey".as("part_b"),
        $"cnt".as("cnt_b"))), Seq("part_b"))
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        round($"support" * $"n_orders" / ($"cnt_a" * $"cnt_b"), 6))
      .orderBy($"support".desc, $"part_a", $"part_b")
      .limit(50)
      .select($"part_a", $"part_b", $"support", $"cnt_a", $"cnt_b", $"lift")
  }

  private val basketSql: String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |cnt AS (SELECT l_partkey, count(*) AS cnt FROM items GROUP BY 1),
       |tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
       |itemsc AS (
       |  SELECT l_orderkey, l_partkey FROM (
       |    SELECT l_orderkey, l_partkey, row_number() OVER (
       |      PARTITION BY l_orderkey ORDER BY l_partkey) AS rn
       |    FROM items) r
       |  WHERE rn <= $BasketPairCap),
       |pr AS (
       |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       |    count(*) AS support
       |  FROM itemsc a JOIN itemsc b
       |    ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= $BasketMinSupport)
       |SELECT part_a, part_b, support, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
       |  round(support * n_orders / (ca.cnt * cb.cnt), 6) AS lift
       |FROM pr JOIN cnt ca ON ca.l_partkey = part_a
       |        JOIN cnt cb ON cb.l_partkey = part_b, tot
       |ORDER BY support DESC, part_a, part_b
       |LIMIT 50""".stripMargin

  /** Repeat-purchase cohort retention (`orders_cohort`): customers
    * grouped by first-order month, counted at each month offset where
    * they ordered again — the BI retention triangle, `events_retention`'s
    * orders-table sibling with month (not day) grain and a calendar
    * month index (year·12+month) so offsets cross year boundaries
    * exactly. Integer-only. One aggregation keyed by custkey for the
    * cohort anchor, one custkey-keyed join (both sides already
    * shuffled on the key), one distinct+count keyed by (cohort,
    * offset) — the triangle frame is cohorts×offsets, metadata-scale. */
  private def cohortDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val om = Tables.orders(spark, dir)
      .select($"o_custkey",
        (year($"o_orderdate") * 12 + month($"o_orderdate") - 1)
          .cast("long").as("m"))
    val firsts = om.groupBy($"o_custkey").agg(min($"m").as("m0"))
    om.join(firsts, Seq("o_custkey"))
      .select($"o_custkey", $"m0", ($"m" - $"m0").as("k"))
      .distinct()
      .groupBy(expr("(m0 div 12) * 100 + m0 % 12 + 1").as("cohort_ym"),
        $"k")
      .agg(count(lit(1)).as("n_customers"))
  }

  private val cohortSql: String =
    """WITH om AS (
      |  SELECT o_custkey,
      |    (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT AS m
      |  FROM orders),
      |f AS (SELECT o_custkey, min(m) AS m0 FROM om GROUP BY 1),
      |ck AS (SELECT DISTINCT om.o_custkey, f.m0, om.m - f.m0 AS k
      |       FROM om JOIN f USING (o_custkey))
      |SELECT ((m0 // 12) * 100 + m0 % 12 + 1)::BIGINT AS cohort_ym, k,
      |  count(*) AS n_customers
      |FROM ck GROUP BY 1, 2""".stripMargin

  /** Skyline / dominance front (`skyline_parts`): the Pareto-optimal
    * frontier of the part catalog — no other part is both cheaper
    * (retail price, exact integer cents) and at least as big (p_size),
    * with at least one strict. The classic skyline operator
    * (Börzsönyi 2001) is quadratic as written; Spark-first it is a
    * two-step reduction that never compares rows pairwise:
    *  1. collapse the data to the DISTINCT point set with counts (one
    *     hash aggregate — the only data-sized pass), then keep per
    *     price only the max size (same-price-smaller rows are
    *     dominated by it, size strict);
    *  2. over the per-price frame ordered by price ascending, a row is
    *     on the front iff its size strictly exceeds the running max of
    *     every strictly-cheaper row (that predecessor has price ≤ and
    *     would dominate at equal size because its price is strict).
    * The ordered window runs over |distinct prices| rows — the price
    * DOMAIN, bounded regardless of row count, so the single-partition
    * window is metadata-sized at any SF (and skyline is distributive:
    * per-partition local fronts could pre-filter step 1's input if the
    * domain ever grew data-sized). The oracle keeps the textbook
    * NOT EXISTS dominance form, so an independent formulation
    * cross-checks the window reduction. */
  private def skylineDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = Tables.part(spark, dir)
      .select(round($"p_retailprice" * 100).cast("long").as("price_cents"),
        $"p_size")
      .groupBy($"price_cents", $"p_size")
      .agg(count(lit(1)).as("n_parts"))
    val perPrice = pts
      .withColumn("mx", max($"p_size").over(
        Window.partitionBy($"price_cents")))
      .filter($"p_size" === $"mx")
      .drop("mx")
    val run = Window.orderBy($"price_cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    perPrice
      .withColumn("best_prev", max($"p_size").over(run))
      .filter($"best_prev".isNull || $"p_size" > $"best_prev")
      .select($"price_cents", $"p_size", $"n_parts")
  }

  private val skylineSql: String =
    """WITH pts AS (
      |  SELECT round(p_retailprice * 100)::BIGINT AS price_cents, p_size,
      |    count(*) AS n_parts
      |  FROM part GROUP BY 1, 2)
      |SELECT price_cents, p_size, n_parts FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.price_cents <= p.price_cents AND q.p_size >= p.p_size
      |    AND (q.price_cents < p.price_cents OR q.p_size > p.p_size))""".stripMargin

  /** Late-arriving-orders modulus for [[mvIncDf]]: orderkeys ≡ 0 mod
    * this are the orders-side delta (~1%). */
  val MvOrderMod = 97
  /** Late-arriving-lines modulus for [[mvIncDf]]: suppkeys ≡ 0 mod
    * this are the lineitem-side delta (~8%), deliberately CROSS-CUTTING
    * the orders delta so every term of the delta algebra is non-empty. */
  val MvSuppMod = 13

  /** Incremental materialized-view maintenance (`mv_incremental_join`):
    * the revenue-by-order-month join view maintained with
    * DELTA ALGEBRA instead of recomputation. With base/delta splits
    * L = L₀ ∪ ΔL and O = O₀ ∪ ΔO, the view over the full tables
    * decomposes as L₀⋈O₀ ∪ ΔL⋈O ∪ L₀⋈ΔO — the first term is the
    * standing view's sufficient statistics (sum/count partials, here
    * rebuilt once to stand in for the stored aggregate), and the two
    * delta terms are the refresh: ΔL⋈O shuffles only the delta lines
    * (the orders side prunes to matching keys), and L₀⋈ΔO BROADCASTS
    * the delta orders so the base fact never re-shuffles. Final merge
    * re-aggregates the partials — exact integer cents per row, so the
    * incremental sum is order-independent and bit-equal to a full
    * recompute. At 100 TB a view refresh costs O(|Δ| + |view|), never a
    * base-table re-join; the oracle IS the full recompute (plain
    * join+group over the complete tables), so the driver's hash check
    * certifies incremental ≡ recompute on every run. */
  private def mvIncDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey",
      round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
        .cast("long").as("cents"))
    val o = Tables.orders(spark, dir).select($"o_orderkey",
      (year($"o_orderdate") * 100 + month($"o_orderdate"))
        .cast("long").as("ym"))
    val lBase = l.filter($"l_suppkey" % MvSuppMod =!= 0)
    val lDelta = l.filter($"l_suppkey" % MvSuppMod === 0)
    val oBase = o.filter($"o_orderkey" % MvOrderMod =!= 0)
    val oDelta = o.filter($"o_orderkey" % MvOrderMod === 0)
    def partial(lines: DataFrame, orders: DataFrame): DataFrame =
      lines.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"ym")
        .agg(sum($"cents").as("pc"), count(lit(1)).as("pn"))
    val standing = partial(lBase, oBase)          // the stored view
    val dLines = partial(lDelta, o)               // ΔL ⋈ (O₀ ∪ ΔO)
    val dOrders = partial(lBase, broadcast(oDelta)) // L₀ ⋈ ΔO, no shuffle
    standing.unionByName(dLines).unionByName(dOrders)
      .groupBy($"ym")
      .agg(sum($"pc").as("revenue_cents"), sum($"pn").as("n_lines"))
  }

  private val mvIncSql: String =
    """SELECT (year(o_orderdate) * 100 + month(o_orderdate))::BIGINT AS ym,
      |  sum(round(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT)::BIGINT
      |    AS revenue_cents,
      |  count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Order-priority checking (`q4_order_priority`, the TPC-H Q4 shape on
    * this schema's columns: "late" = a line shipped >60 days after the
    * order date, standing in for commitdate<receiptdate which the trimmed
    * lineitem lacks). The textbook form is a correlated EXISTS; the plan
    * we want — and write directly — is a LEFT SEMI hash join on the order
    * key with the non-equi lateness predicate as a join residual, so each
    * order is emitted at most once no matter how many late lines it has
    * and no lineitem column ever reaches the aggregate. The quarter filter
    * prunes orders BEFORE the join (the semi join's build side is one
    * quarter, not the full table). DuckDB keeps the EXISTS spelling, so
    * the decorrelation is cross-checked against an engine that plans it
    * independently. */
  private def q4Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    o.join(l, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  private val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1""".stripMargin

  /** Important-nation revenue (`q11_important_stock`, the TPC-H Q11 shape:
    * keep groups whose value exceeds a FRACTION OF THE GLOBAL TOTAL —
    * partsupp is absent so the "value" is supplier-nation revenue). The
    * textbook form has a scalar subquery in HAVING that re-scans the fact
    * table; the Spark plan aggregates ONCE, derives the global total from
    * the 25-row per-nation frame (sum of sums — exact integer cents, so
    * re-aggregation is lossless), and broadcasts the 1-row total back as a
    * cross join, so the fact table is read exactly once at any SF. The
    * 5% threshold compares as `value*20 > total` in integer cents — no
    * double multiply to drift between engines. */
  private def q11Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_suppkey",
      round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
        .cast("long").as("cents"))
    val sup = broadcast(Tables.supplier(spark, dir)
      .select($"s_suppkey", $"s_nationkey"))
    val nat = broadcast(Tables.nation(spark, dir)
      .select($"n_nationkey", $"n_name"))
    val perNation = li.join(sup, $"l_suppkey" === $"s_suppkey")
      .join(nat, $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name").agg(sum($"cents").as("value_cents"))
    val total = perNation.agg(sum($"value_cents").as("total_cents"))
    perNation.crossJoin(broadcast(total))
      .filter($"value_cents" * 20 > $"total_cents")
      .select($"n_name", $"value_cents")
  }

  private val q11Sql: String =
    """WITH pn AS (
      |  SELECT n_name,
      |    sum(round(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT)::BIGINT
      |      AS value_cents
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1)
      |SELECT n_name, value_cents FROM pn
      |WHERE value_cents * 20 > (SELECT sum(value_cents) FROM pn)""".stripMargin

  /** Supplier census per part segment (`q16_supplier_cnt`, the TPC-H Q16
    * shape: COUNT DISTINCT suppliers per (brand, size) excluding a
    * NOT-IN supplier blocklist — negative account balance standing in for
    * the comment-pattern complaint flag). NOT IN over a non-null key is an
    * anti join; both the blocklist and the part dimension broadcast, so
    * the only shuffle is the final distinct-count aggregate — and that one
    * is unavoidable and keyed on the output grain. DuckDB keeps the
    * NOT IN spelling. */
  private def q16Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = broadcast(Tables.part(spark, dir)
      .filter($"p_type" =!= "ECONOMY").select($"p_partkey", $"p_brand", $"p_size"))
    val blocked = broadcast(Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey"))
    Tables.lineitem(spark, dir).select($"l_partkey", $"l_suppkey")
      .join(parts, $"l_partkey" === $"p_partkey")
      .join(blocked, $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
  }

  private val q16Sql: String =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'ECONOMY'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2""".stripMargin

  /** Dominant red-part suppliers (`q20_promo_suppliers`, the TPC-H Q20
    * shape: a nested correlated aggregate — suppliers who shipped >30% of
    * a red part's total 1997 volume). The textbook form re-aggregates the
    * fact table once PER GROUP inside HAVING; the Spark plan decorrelates
    * into two aggregation levels where the second REUSES the first's
    * partials (per-part totals are re-aggregated (part, supplier) sums,
    * exact integer quantities), so the fact table is scanned once and the
    * dominance join runs at (part, supplier) grain, never row grain. The
    * DuckDB oracle keeps the correlated-HAVING spelling as the independent
    * formulation. */
  private def q20Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val red = broadcast(Tables.part(spark, dir)
      .filter($"p_name".startsWith("red")).select($"p_partkey"))
    val redLines = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(red, $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_suppkey", $"l_quantity".cast("long").as("qty"))
    val perSupPart = redLines.groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"qty").as("sp_qty"))
    val perPart = perSupPart.groupBy($"l_partkey").agg(sum($"sp_qty").as("p_qty"))
    val dominant = perSupPart.join(perPart, Seq("l_partkey"))
      .filter($"sp_qty" * 10 > $"p_qty" * 3)
      .select($"l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(dominant, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_name")
  }

  private val q20Sql: String =
    """SELECT s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey
      |  FROM lineitem l JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY l_partkey, l_suppkey
      |  HAVING sum(l_quantity::BIGINT) * 10 > 3 * (
      |    SELECT sum(l2.l_quantity::BIGINT)
      |    FROM lineitem l2 JOIN part p2 ON l2.l_partkey = p2.p_partkey
      |    WHERE p2.p_partkey = l.l_partkey AND p2.p_name LIKE 'red%'
      |      AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
      |      AND l2.l_shipdate < TIMESTAMP '1998-01-01'))""".stripMargin

  /** Customer order-count distribution (`q13_custdist`, the TPC-H Q13
    * shape: the histogram-of-group-sizes). The LEFT OUTER join is the
    * point — customers with ZERO qualifying orders must appear in the
    * c_count = 0 bin, which an inner join silently drops; the exclusion
    * filter ('5-LOW' priority standing in for the comment pattern the
    * trimmed schema lacks) prunes the orders side BEFORE the join. Two
    * aggregates: per-customer count over the outer join, then the
    * distribution over the (bounded) count domain. */
  private def q13Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "5-LOW")
      .select($"o_orderkey", $"o_custkey")
    val perCust = Tables.customer(spark, dir).select($"c_custkey")
      .join(o, $"o_custkey" === $"c_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count")) // count(col): NULLs don't count
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  private val q13Sql: String =
    """WITH pc AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY 1)
      |SELECT c_count, count(*) AS custdist FROM pc GROUP BY 1""".stripMargin

  /** Discounted-revenue with a disjunctive predicate (`q19_disjunct`,
    * the TPC-H Q19 shape: an OR of three conjunctive brand/size/quantity
    * clauses). The planner exercise is that the disjunction spans BOTH
    * tables: per-table conjuncts (brand IN (...), size ranges, quantity
    * envelope) are pushed to each scan as the OR's union bound, while
    * the cross-table clause pairing evaluates as a join residual — one
    * scan each side, no union-of-three-joins rewrite. Exact integer
    * cents; quantities are integral doubles cast to long. */
  private def q19Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity".cast("long").as("qty"),
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
      .filter($"qty" >= 1L && $"qty" <= 35L)
    val p = broadcast(Tables.part(spark, dir)
      .filter($"p_brand".isin("Brand#1", "Brand#2", "Brand#3"))
      .select($"p_partkey", $"p_brand", $"p_size"))
    val clause =
      ($"p_brand" === "Brand#1" && $"p_size".between(1, 10) &&
        $"qty".between(1L, 15L)) ||
      ($"p_brand" === "Brand#2" && $"p_size".between(11, 25) &&
        $"qty".between(10L, 25L)) ||
      ($"p_brand" === "Brand#3" && $"p_size".between(26, 50) &&
        $"qty".between(20L, 35L))
    l.join(p, $"l_partkey" === $"p_partkey" && clause)
      .agg(sum($"cents").as("revenue_cents"), count(lit(1)).as("n_lines"))
  }

  private val q19Sql: String =
    """SELECT
      |  sum(round(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT)::BIGINT
      |    AS revenue_cents,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
      |        AND l_quantity::BIGINT BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
      |        AND l_quantity::BIGINT BETWEEN 10 AND 25)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
      |        AND l_quantity::BIGINT BETWEEN 20 AND 35)""".stripMargin

  /** Forecast-revenue-change (`q6_forecast`, the TPC-H Q6 shape): the
    * pure scan-side query — a three-conjunct range filter and one
    * arithmetic aggregate, no join at all. Its whole value is the plan:
    * all three predicates MUST reach the parquet scan as PushedFilters
    * (spec-asserted) so a 100 TB run reads only the 1997 row groups
    * whose stats overlap the band. Revenue = Σ round(price·discount·100)
    * — one IEEE multiply per row then a half-up round, identical on
    * both engines, summed as exact integers. */
  private def q6Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24.0)
      .agg(sum(round($"l_extendedprice" * $"l_discount" * 100).cast("long"))
        .as("revenue_cents"), count(lit(1)).as("n_lines"))
  }

  private val q6Sql: String =
    """SELECT
      |  sum(round(l_extendedprice * l_discount * 100)::BIGINT)::BIGINT
      |    AS revenue_cents,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Bilateral trade volume (`q7_nation_volume`, the TPC-H Q7 shape):
    * revenue shipped between two chosen nations in either direction,
    * by supplier nation, customer nation and ship year. Both nation
    * dimensions broadcast through supplier/customer; the disjunctive
    * nation-pair predicate is a join residual over the already-pruned
    * (two-nation) sides, so the fact tables shuffle once on their join
    * keys and nothing else. */
  private def q7Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nA = "NATION_3"
    val nB = "NATION_7"
    val sup = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir)
        .filter($"n_name".isin(nA, nB)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation")))
    val cust = broadcast(Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir)
        .filter($"n_name".isin(nA, nB)), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation")))
    val l = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_suppkey",
        year($"l_shipdate").cast("long").as("l_year"),
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
    l.join(sup, $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .filter(($"supp_nation" === nA && $"cust_nation" === nB) ||
        ($"supp_nation" === nB && $"cust_nation" === nA))
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(sum($"cents").as("revenue_cents"))
  }

  private val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate)::BIGINT AS l_year,
      |  sum(round(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT)::BIGINT
      |    AS revenue_cents
      |FROM lineitem
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |GROUP BY 1, 2, 3""".stripMargin

  /** National market share (`q8_market_share`, the TPC-H Q8 shape): of
    * all revenue sold INTO one region per order year, the share supplied
    * by one nation — the numerator is a conditional sum inside the same
    * aggregate as the denominator (never two scans), and the share ships
    * as floor'd basis points of two exact integer sums. */
  private def q8Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shareNation = "NATION_5"
    val cust = broadcast(Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, dir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey"))
    val sup = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation")))
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
      .join(Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_custkey",
          year($"o_orderdate").cast("long").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .groupBy($"o_year")
      .agg(sum(when($"supp_nation" === shareNation, $"cents")
        .otherwise(0L)).as("nation_cents"),
        sum($"cents").as("total_cents"))
      .withColumn("share_bps",
        floor($"nation_cents" * lit(10000.0) / $"total_cents"))
  }

  private val q8Sql: String =
    """SELECT year(o_orderdate)::BIGINT AS o_year,
      |  sum(CASE WHEN n1.n_name = 'NATION_5'
      |           THEN round(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT
      |           ELSE 0 END)::BIGINT AS nation_cents,
      |  sum(round(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT)::BIGINT
      |    AS total_cents,
      |  floor(sum(CASE WHEN n1.n_name = 'NATION_5'
      |             THEN round(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT
      |             ELSE 0 END) * 10000.0 /
      |        sum(round(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT))::BIGINT
      |    AS share_bps
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |JOIN region ON r_regionkey = n2.n_regionkey AND r_name = 'ASIA'
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |GROUP BY 1""".stripMargin

  /** Returned-item ranking (`q10_returns`, the TPC-H Q10 shape): the
    * top 20 customers by revenue REFUNDED in one quarter — the
    * customer-service queue. Quarter filter prunes orders pre-join,
    * returnflag prunes lines at the scan, customer+nation broadcast,
    * and the final top-20 is a `TakeOrderedAndProject` (never a full
    * sort), tie-broken by custkey so the cut is total-order
    * deterministic. */
  private def q10Df(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val l = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
    val cn = broadcast(Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"n_name", $"c_acctbal"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum($"cents").as("refund_cents"))
      .join(cn, $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"n_name",
        round($"c_acctbal", 2).as("c_acctbal"), $"refund_cents")
      .orderBy($"refund_cents".desc, $"c_custkey")
      .limit(20)
  }

  private val q10Sql: String =
    """SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS c_acctbal,
      |  sum(round(l_extendedprice * (1.0 - l_discount) * 100)::BIGINT)::BIGINT
      |    AS refund_cents
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON n_nationkey = c_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY refund_cents DESC, c_custkey
      |LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q6_forecast" -> (q6Df(_, _)),
    "q7_nation_volume" -> (q7Df(_, _)),
    "q8_market_share" -> (q8Df(_, _)),
    "q10_returns" -> (q10Df(_, _)),
    "q13_custdist" -> (q13Df(_, _)),
    "q19_disjunct" -> (q19Df(_, _)),
    "q4_order_priority" -> (q4Df(_, _)),
    "q11_important_stock" -> (q11Df(_, _)),
    "q16_supplier_cnt" -> (q16Df(_, _)),
    "q20_promo_suppliers" -> (q20Df(_, _)),
    "skyline_parts" -> (skylineDf(_, _)),
    "mv_incremental_join" -> (mvIncDf(_, _)),
    "basket_pairs" -> (basketDf(_, _)),
    "orders_cohort" -> (cohortDf(_, _)),
    "q15_top_supplier" -> (q15Df(_, _)),
    "q21_sole_late" -> (q21Df(_, _)),
    "q22_idle_capital" -> (q22Df(_, _)),
    "window_dist" -> (windowDistDf(_, _)),
    "pivot_source_lang" -> (pivotDf(_, _)),
    "set_ops" -> (setOpsDf(_, _)),
    "q1_pricing" -> (q1Df(_, _)),
    "q3_topk" -> (q3Df(_, _)),
    "q5_region_revenue" -> (q5Df(_, _)),
    "join_semi" -> (semiDf(_, _)),
    "join_anti" -> (antiDf(_, _)),
    "join_asof" -> (asofDf(_, _)),
    "join_asof_tol" -> (asofTolDf(_, _)),
    "q17_small_qty" -> (q17Df(_, _)),
    "orders_pareto" -> (paretoDf(_, _)),
    "order_line_array" -> (lineArrayDf(_, _)),
    "join_interval" -> (intervalDf(_, _)),
    "topk_per_group" -> (topkDf(_, _)),
    "agg_rollup" -> (rollupDf(_, _)),
    "agg_cube" -> (cubeDf(_, _)),
    "join_bucketed" -> (bucketedJoinDf(_, _)),
    "q14_promo_share" -> (promoShareDf(_, _)),
    "agg_grouping_sets" -> (groupingSetsDf(_, _)),
    "q18_big_orders" -> (bigOrdersDf(_, _)),
    "customer_rfm" -> (rfmDf(_, _)),
    "orders_monthly" -> (monthlyDf(_, _)),
    "supplier_hhi" -> (supplierHhiDf(_, _)),
    "distinct_proj" -> (distinctDf(_, _)),
    "json_extract_agg" -> (jsonDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q6_forecast" -> q6Sql,
    "q7_nation_volume" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q10_returns" -> q10Sql,
    "q13_custdist" -> q13Sql,
    "q19_disjunct" -> q19Sql,
    "q4_order_priority" -> q4Sql,
    "q11_important_stock" -> q11Sql,
    "q16_supplier_cnt" -> q16Sql,
    "q20_promo_suppliers" -> q20Sql,
    "basket_pairs" -> basketSql,
    "orders_cohort" -> cohortSql,
    "skyline_parts" -> skylineSql,
    "mv_incremental_join" -> mvIncSql,
    "q15_top_supplier" -> q15Sql,
    "q21_sole_late" -> q21Sql,
    "q22_idle_capital" -> q22Sql,
    "window_dist" -> windowDistSql,
    "pivot_source_lang" -> pivotSql,
    "set_ops" -> setOpsSql,
    "q1_pricing" -> q1Sql,
    "q3_topk" -> q3Sql,
    "q5_region_revenue" -> q5Sql,
    "join_semi" -> semiSql,
    "join_anti" -> antiSql,
    "join_asof" -> asofSql,
    "join_asof_tol" -> asofTolSql,
    "q17_small_qty" -> q17Sql,
    "orders_pareto" -> paretoSql,
    "order_line_array" -> lineArraySql,
    "join_interval" -> intervalSql,
    "topk_per_group" -> topkSql,
    "agg_rollup" -> rollupSql,
    "agg_cube" -> cubeSql,
    "join_bucketed" -> bucketedJoinSql,
    "q14_promo_share" -> promoShareSql,
    "agg_grouping_sets" -> groupingSetsSql,
    "q18_big_orders" -> bigOrdersSql,
    "customer_rfm" -> rfmSql,
    "orders_monthly" -> monthlySql,
    "supplier_hhi" -> supplierHhiSql,
    "distinct_proj" -> distinctSql,
    "json_extract_agg" -> jsonSql
  )
}
