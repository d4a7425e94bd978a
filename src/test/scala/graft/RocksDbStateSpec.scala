package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** The unbounded-key monitors (content-hash dedup, LSH/phash bucket
  * membership, granule append counters) claim their state is "spillable
  * via RocksDB" — at 100 TB the default HDFS-backed HEAP store is the
  * first thing to fall over, so the claim has to be executed, not
  * asserted in a comment. This spec re-runs the cross-micro-batch and
  * checkpoint-restart state proofs with
  * `spark.sql.streaming.stateStore.providerClass =
  * RocksDBStateStoreProvider` and verifies (a) identical semantics and
  * (b) that the RocksDB provider actually engaged (its custom metrics
  * appear in the query progress — a silently ignored conf would
  * otherwise pass on the heap store).
  */
class RocksDbStateSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def underRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  /** Every stateful operator in the query must report RocksDB custom
    * metrics — the proof the provider conf was honored. */
  private def assertRocksDbEngaged(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val keys = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq)
      .flatMap(so => {
        val it = so.customMetrics.keySet().iterator()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next()
        b.result()
      })
    assert(keys.exists(_.toLowerCase.contains("rocksdb")),
      s"no rocksdb metrics in progress — provider not engaged: $keys")
  }

  test("docIngest dedup state lives in RocksDB and survives a restart") {
    import spark.implicits._
    underRocksDb {
      val base =
        java.nio.file.Files.createTempDirectory("graft_rdb_ing").toString
      val srcDir = s"$base/src"
      val outDir = s"$base/out"
      def startQuery() = Streams.docIngest(spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[Streams.RawDoc].schema)
        .parquet(srcDir))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      Seq(Streams.RawDoc(1L, "the quick brown fox", "en", "s1"),
        Streams.RawDoc(2L, "alpha beta gamma", "en", "s1"))
        .toDS().coalesce(1).write.mode("append").parquet(srcDir)
      val q1 = startQuery()
      q1.processAllAvailable()
      assertRocksDbEngaged(q1)
      q1.stop() // the seen-hash set lives only in the RocksDB store now
      // doc 3 repeats doc 1's content: the dedup decision after restart
      // depends on state recovered from the RocksDB checkpoint
      Seq(Streams.RawDoc(3L, "the quick brown fox", "en", "s2"),
        Streams.RawDoc(4L, "delta epsilon zeta words", "en", "s2"))
        .toDS().coalesce(1).write.mode("append").parquet(srcDir)
      val q2 = startQuery()
      q2.processAllAvailable()
      assertRocksDbEngaged(q2)
      q2.stop()
      val ids = spark.read.parquet(outDir).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(ids == Set(1L, 2L, 4L),
        s"dedup state lost across a RocksDB restart: $ids")
    }
  }

  // heavy: provider DEPTH rung — the docIngest restart test above keeps
  // RocksDB provider mechanics in the default loop; this re-proves the
  // same engagement on a second state shape (SPARK_GRAFT_HEAVY=1)
  heavyTest("lshMonitor bucket membership accumulates across batches in RocksDB") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    underRocksDb {
      val text = "the quick brown fox jumps over the lazy dog again and again"
      val input = MemoryStream[Streams.RawDoc]
      val q = Streams.lshMonitor(input.toDF())
        .writeStream.format("memory").queryName("rdb_lsh")
        .outputMode("append").start()
      input.addData(Streams.RawDoc(1L, text, "en", "src"))
      q.processAllAvailable()
      // the exact copy arrives a micro-batch later: the hit can only
      // come from bucket membership persisted in the RocksDB store
      input.addData(Streams.RawDoc(2L, text, "en", "src"))
      q.processAllAvailable()
      assertRocksDbEngaged(q)
      q.stop()
      val hits = spark.table("rdb_lsh").as[Streams.NearDupHit].collect()
      assert(hits.nonEmpty && hits.forall(h =>
        h.doc_a == 1L && h.doc_b == 2L && h.est == 1.0),
        s"cross-batch LSH hit lost under RocksDB: ${hits.toSeq}")
    }
  }

  // heavy: provider depth rung, same rationale as lshMonitor's
  heavyTest("phashMonitor posting lists accumulate across batches in RocksDB") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    underRocksDb {
      val input = MemoryStream[Streams.PhashImg]
      val q = Streams.phashMonitor(input.toDF())
        .writeStream.format("memory").queryName("rdb_phash")
        .outputMode("append").start()
      input.addData(Streams.PhashImg(10L, "rdb-img", 0))
      q.processAllAvailable()
      // pixel-identical twin a batch later: hamming 0 in every band,
      // served from the persisted posting lists
      input.addData(Streams.PhashImg(11L, "rdb-img", 0))
      q.processAllAvailable()
      assertRocksDbEngaged(q)
      q.stop()
      val hits = spark.table("rdb_phash").as[Streams.PhashHit].collect()
      assert(hits.length == graft.operators.Phash.Bands &&
        hits.forall(h => h.img_a == 10L && h.img_b == 11L && h.hamming == 0),
        s"cross-batch phash hits lost under RocksDB: ${hits.toSeq}")
    }
  }

  // heavy: the r13 memory-pressure proof (240k keys vs a 2 MB budget)
  // — unchanged code; run with SPARK_GRAFT_HEAVY=1 whenever the state
  // budget wiring or docIngest state layout changes
  heavyTest("dedup state far past a 2 MB RocksDB budget spills to SST and " +
    "stays exact") {
    // the actual 100 TB failure mode of the HEAP store: per-key state
    // grows past executor memory. Here RocksDB gets a deliberately
    // tiny bounded budget (2 MB shared cache, 1 MB write buffers) and
    // the content-hash dedup state is driven to ~15-20 MB of key
    // material — an order of magnitude past the budget — across
    // multiple commits. The proof is three-sided: (a) semantics stay
    // exact (every distinct content kept once, every re-send dropped,
    // including re-sends of the OLDEST batch, whose keys cannot be
    // memory-resident any more); (b) the state actually left memory
    // (total SST file bytes exceed the whole budget); (c) the pinned
    // block-cache usage respected the bound.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val budgetMb = 2L
    val memConf = Seq(
      "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
      "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" ->
        budgetMb.toString,
      "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB" -> "1",
      "spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber" -> "2")
    val prev = memConf.map { case (k, _) => k -> spark.conf.getOption(k) }
    memConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try underRocksDb {
      val n = 240000
      def doc(i: Int, id: Long) =
        Streams.RawDoc(id, s"unique content $i with stable tail ${i * 7L}",
          "en", "s")
      val input = MemoryStream[Streams.RawDoc]
      val q = Streams.docIngest(input.toDF())
        .writeStream.format("memory").queryName("rdb_pressure")
        .outputMode("append").start()
      (0 until n by 80000).foreach { lo =>
        input.addData((lo until lo + 80000).map(i => doc(i, i.toLong)))
        q.processAllAvailable()
      }
      // re-send the FIRST batch's contents under fresh doc ids: these
      // lookups hit keys written ~160k commits of churn ago — state
      // that a 2 MB cache cannot hold — and must still all dedup
      input.addData((0 until 20000).map(i => doc(i, (n + i).toLong)))
      q.processAllAvailable()
      assertRocksDbEngaged(q)
      val so = q.recentProgress.toSeq.reverse
        .flatMap(_.stateOperators.toSeq).head
      assert(so.numRowsTotal == n.toLong,
        s"dedup state must hold one row per distinct content: " +
          s"${so.numRowsTotal}")
      def metric(name: String): Long =
        so.customMetrics.getOrDefault(name, java.lang.Long.valueOf(-1L))
      val budgetBytes = budgetMb * 1024 * 1024
      val sst = metric("rocksdbSstFileSize")
      assert(sst > budgetBytes,
        s"state must exceed the memory budget on disk: sst=$sst " +
          s"budget=$budgetBytes")
      val pinned = metric("rocksdbPinnedBlocksMemoryUsage")
      assert(pinned >= 0 && pinned <= budgetBytes,
        s"pinned block cache must respect the bounded budget: $pinned")
      q.stop()
      val ids = spark.table("rdb_pressure").select($"doc_id").as[Long]
        .collect()
      assert(ids.length == n && ids.forall(_ < n.toLong),
        s"exactly the $n distinct contents, none of the re-sends: " +
          s"got ${ids.length} rows, dup leaked=${ids.exists(_ >= n.toLong)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("layoutMonitor granule counters accumulate across batches in RocksDB") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    underRocksDb {
      // one-granule standing index covering the whole z-range: every
      // delta routes there, so the final count proves accumulation
      val index = Seq(Streams.GranuleBox(1L, Long.MaxValue,
        0L, 1000L, 0L, 1000L))
      val input = MemoryStream[(Long, Long, Long)]
      val q = Streams.layoutMonitor(
        input.toDF().toDF("event_id", "ts_us", "user_id"),
        0L, 1000L, 0L, 1000L, index)
        .writeStream.format("memory").queryName("rdb_layout")
        .outputMode("update").start()
      input.addData(Seq((1L, 10L, 10L), (2L, 20L, 20L)))
      q.processAllAvailable()
      input.addData(Seq((3L, 30L, 30L), (4L, 40L, 40L), (5L, 2000L, 50L)))
      q.processAllAvailable()
      assertRocksDbEngaged(q)
      q.stop()
      val last = spark.table("rdb_layout").as[Streams.GranuleAppend]
        .collect().filter(_.granule == 1L).maxBy(_.n_new)
      assert(last.n_new == 5L,
        s"counter must accumulate across batches under RocksDB: $last")
      assert(last.n_widen == 1L && last.box_widened,
        s"the out-of-box delta must count as a widen: $last")
    }
  }
}
