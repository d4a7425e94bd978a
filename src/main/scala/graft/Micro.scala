package graft

import org.apache.spark.sql.SparkSession

/** Throwaway harness micro-probe (not part of the driver contract):
  * quantifies the per-access cost of reading a small localCheckpoint'd
  * frame at different partition counts, and the bare per-job floor. */
object Micro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"$label: ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/op")
    }

    val small32 = spark.range(720).toDF("id").repartition(32).localCheckpoint()
    val small1 = spark.range(720).toDF("id").coalesce(1).localCheckpoint()
    val big32 = spark.range(600000).toDF("id").repartition(32).localCheckpoint()

    time("count small frame @32 parts", 20)(small32.count())
    time("count small frame @1 part ", 20)(small1.count())
    time("count big frame  @32 parts", 20)(big32.count())
    time("agg   small @32 parts     ", 20)(
      small32.groupBy($"id" % 7).count().count())
    time("agg   small @1 part       ", 20)(
      small1.groupBy($"id" % 7).count().count())
    time("bare 1-task job            ", 20)(
      spark.sparkContext.parallelize(Seq(1), 1).count())
    time("bare 32-task job           ", 20)(
      spark.sparkContext.parallelize(1 to 32, 32).count())
    time("parquet scan lineitem count", 20)(
      spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").count())
    time("parquet scan + filter+agg  ", 20)(
      spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .filter($"l_quantity" > 25).groupBy($"l_returnflag").count().count())
    val liShared = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    time("SHARED df scan count       ", 20)(liShared.count())
    time("SHARED df filter+agg       ", 20)(
      liShared.filter($"l_quantity" > 25).groupBy($"l_returnflag")
        .count().count())
    val docsFresh = "/root/testdata/sf0.1/documents.parquet"
    time("parquet docs fresh count   ", 20)(
      spark.read.parquet(docsFresh).count())
    val docsShared = spark.read.parquet(docsFresh)
    time("SHARED docs count          ", 20)(docsShared.count())
    spark.stop()
  }
}
