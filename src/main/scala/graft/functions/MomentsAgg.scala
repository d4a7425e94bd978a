package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass population moments (count, mean, M2) with Welford/Chan
  * parallel merge — the commutative-mergeable form of the reference's
  * z-score population statistics (strategy.py:1024-1032, which rescans
  * its 3000-sample deque per tick).
  *
  * This is the aggregate shape that scales: each partition folds locally,
  * partial states merge associatively at the exchange, and the final
  * (n, mean, stddev_pop) comes out in one shuffle of 24 bytes per
  * partition. It is also exactly the running state the streaming z-score
  * keeps in `flatMapGroupsWithState` (SURVEY §2.9 "running-moments
  * (count, mean, M2) in state — Welford").
  */
case class MomentsBuf(n: Long, mean: Double, m2: Double)

object MomentsAgg extends Aggregator[Double, MomentsBuf, (Long, Double, Double)] {
  type Buf = MomentsBuf
  private def Buf(n: Long, mean: Double, m2: Double) = MomentsBuf(n, mean, m2)

  override def zero: Buf = Buf(0L, 0.0, 0.0)

  override def reduce(b: Buf, x: Double): Buf = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    Buf(n, mean, b.m2 + delta * (x - mean))
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      Buf(n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n)
    }
  }

  /** (n, mean, stddev_pop) — ddof=0 like the reference (strategy.py:1029). */
  override def finish(b: Buf): (Long, Double, Double) =
    (b.n, b.mean, if (b.n > 0) math.sqrt(b.m2 / b.n) else Double.NaN)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
}
