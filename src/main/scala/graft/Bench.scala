package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line (driver contract).
  *
  * Extra env knobs for local iteration (ignored by the driver):
  *  - SPARK_GRAFT_ONLY=a,b,c   run only the named queries
  *  - SPARK_GRAFT_EXPLAIN=1    print each query's formatted plan
  *  - SPARK_GRAFT_REPEAT=n     best-of-n timing per query
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    // best-of-2 by default: the first execution pays codegen + parquet
    // footer reads; the min is the steadier engine number
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = qs.map { case (name, fn) =>
      if (explain) {
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => System.err.println(s"$name: $e") }
      }
      // a failed attempt must NOT masquerade as a fast run: failures
      // report -1 and never contribute a timing
      val times = (1 to repeat).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      name -> times.minOption.getOrElse(-1.0)
    }
    val qsJson = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    if (failed > 0) System.err.println(s"[bench] $failed queries failed")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
