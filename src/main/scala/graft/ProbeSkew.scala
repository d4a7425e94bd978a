// quick probe main
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val fact = graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
      .withColumn("skew_key", expr(graft.operators.Layout.skewKeySql))
      .select($"skew_key", $"event_id", $"value")
    val parted = fact.repartition(16, $"skew_key")
    val sizes = parted.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println("ROWS/PART: " + sizes.mkString(","))
    // byte sizes via write
    val tmp = java.nio.file.Files.createTempDirectory("probe").toString
    parted.write.parquet(tmp + "/p")
    spark.stop()
  }
}
