package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-rank construction over a unique, orderable long id.
  *
  * `row_number().over(Window.orderBy(id))` funnels the whole frame
  * through ONE task — the single-partition-window anti-pattern this repo
  * bans for anything corpus-sized (README §scale-ops). The fix is the
  * same two-level construction `pipeline_shuffle` and the Z-order layout
  * use: a BOUNDED, MONOTONE cell (a range bucket of the id), a
  * per-cell rank window, and a broadcast exclusive prefix sum of the
  * per-cell counts. Because the cells partition the id order
  * monotonically, `base + within` equals the single-window global rank
  * bit-for-bit on any input where the id is unique.
  *
  * Preconditions (asserted by RanksSpec, documented here):
  *  - `id` is a unique integral column (ties would make the within-cell
  *    order, and thus the rank, nondeterministic);
  *  - the id RANGE satisfies `(hi - lo + 1) * granules < Long.MaxValue`
  *    (range buckets use `((id - lo) * G) div (hi - lo + 1)` in pure
  *    long arithmetic — dense or hash-bounded ids are always safe);
  *  - cells are range buckets, so per-cell sizes track the id
  *    DISTRIBUTION: uniform or dense ids give ~n/G per cell; an
  *    adversarially clustered id would re-concentrate (use a hash rank
  *    like `pipeline_shuffle`'s when order doesn't matter).
  *
  * The prefix-sum window runs over ≤ `granules` rows (bounded by
  * construction), which is the repo's accepted bounded-window form.
  */
object Ranks {

  /** Attach a 1-based global rank `rnCol` (long) ordered by unique long
    * column `idCol`. Equivalent to
    * `row_number().over(Window.orderBy(idCol))` with a scalable plan:
    * no single-partition Exchange appears anywhere in the ranked side.
    */
  def rankById(df: DataFrame, idCol: String, rnCol: String,
      granules: Int = 256): DataFrame = {
    val stats = df.agg(min(col(idCol)).as("_rk_lo"),
      max(col(idCol)).as("_rk_hi"))
    // Runtime enforcement of the documented range precondition (advisor
    // r15): an id span wider than Long.MaxValue/granules would wrap the
    // cell arithmetic and mis-rank SILENTLY — fail loudly instead. The
    // span itself is computed with try_add/try_subtract so a hi-lo that
    // overflows long becomes NULL (ANSI mode would otherwise throw a
    // generic overflow, non-ANSI would wrap) and routes into the same
    // guard. Once span <= Long.MaxValue/granules holds, the cell
    // arithmetic is overflow-free: 0 <= id-lo <= span-1, so
    // (id-lo)*granules < Long.MaxValue. The check folds into the cell
    // CASE (a broadcast 1-row condition per row, codegen'd), not a
    // separate column Catalyst could prune away.
    val maxSpan = Long.MaxValue / granules
    val celled = df.crossJoin(broadcast(stats))
      .withColumn("_rk_span", expr("try_add(try_subtract(_rk_hi, _rk_lo), 1L)"))
      .withColumn("_rk_cell", expr(
        s"""CASE WHEN _rk_span IS NULL OR _rk_span <= 0
           |       OR _rk_span > ${maxSpan}L
           |  THEN CAST(raise_error(
           |    'Ranks.rankById: id span (hi-lo+1) exceeds Long.MaxValue/granules; use a hash-cell rank for hash-wide ids') AS BIGINT)
           |  ELSE (($idCol - _rk_lo) * $granules) div _rk_span
           |END""".stripMargin))
    val wIn = Window.partitionBy(col("_rk_cell")).orderBy(col(idCol))
    // bounded window: ≤ `granules` rows after the groupBy
    val wBase = Window.orderBy(col("_rk_cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = celled.groupBy(col("_rk_cell"))
      .agg(count(lit(1)).as("_rk_n"))
      .withColumn("_rk_base", coalesce(sum(col("_rk_n")).over(wBase), lit(0L)))
      .select(col("_rk_cell"), col("_rk_base"))
    celled
      .withColumn("_rk_rw", row_number().over(wIn).cast("long"))
      .join(broadcast(bases), Seq("_rk_cell"))
      .withColumn(rnCol, col("_rk_base") + col("_rk_rw"))
      .drop("_rk_cell", "_rk_rw", "_rk_base", "_rk_lo", "_rk_hi", "_rk_span")
  }
}
