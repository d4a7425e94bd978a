package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wire-format ingestion (SURVEY §1.2, §2.1): the reference receives
  * string-encoded decimals over JSON (`float(close_str)`,
  * data_manager.py:281-284) and sorts klines by close_time before
  * folding. The engine's cast chain must survive a JSON round trip and
  * disorder. */
class WireFormatSpec extends SparkSpec {

  test("json klines: string decimals cast, disorder sorted, invalid rows dropped") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wire").toString
    // deliberately unsorted, with string-encoded decimals and bad rows
    val json = Seq(
      """{"close_time": 300000, "c": "102.5", "symbol": "S"}""",
      """{"close_time": 100000, "c": "100.0", "symbol": "S"}""",
      """{"close_time": 400000, "c": "bogus", "symbol": "S"}""",
      """{"close_time": 200000, "c": "101.25", "symbol": "S"}""",
      """{"close_time": 500000, "c": "0",     "symbol": "S"}""")
    Files.write(java.nio.file.Paths.get(s"$dir/klines.json"),
      json.mkString("\n").getBytes)

    val schema = StructType(Seq(
      StructField("close_time", LongType),
      StructField("c", StringType),
      StructField("symbol", StringType)))
    val parsed = spark.read.schema(schema).json(s"$dir/klines.json")
      // try_cast: ANSI mode (Spark 4 default) throws on malformed input;
      // the reference wraps float(close_str) in try/except — same policy
      .withColumn("close", expr("try_cast(c AS DOUBLE)"))
      .filter($"close".isNotNull && $"close" > 0.0) // validity gates
      .withColumn("ts", timestamp_millis($"close_time"))
      .orderBy($"close_time") // sort-before-fold (data_manager.py:272-275)
    val rows = parsed.select($"close").as[Double].collect().toSeq
    assert(rows == Seq(100.0, 101.25, 102.5)) // sorted, casts applied, bad rows gone
  }

  test("csv round trip preserves the event grain") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_csv").toString
    val src = graft.sources.Tables.events(spark, sfDir())
      .select($"event_id", $"ts_us", $"event_type", $"value")
    src.coalesce(1).write.option("header", "true").mode("overwrite")
      .csv(s"$dir/events_csv")
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/events_csv")
    assert(back.count() == src.count())
    val a = src.agg(sum($"value")).as[Double].collect().head
    val b = back.agg(sum(col("value"))).collect().head.getDouble(0)
    assert(math.abs(a - b) < 1e-6 * math.abs(a))
  }
}
