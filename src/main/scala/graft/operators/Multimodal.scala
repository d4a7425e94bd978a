package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ColFns
import graft.sources.Tables
import graft.OpModule

/** Multimodal-column plumbing for a training-data pipeline (builder-prompt
  * north star): media lives as an opaque `binary` payload column with
  * typed metadata, and every operator is schema-first so the plan scales
  * like any other column pipeline (scan → project → explode — no UDF in
  * the metadata path, no collect anywhere).
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * codecs): `decodePayload` is the identity and the "parsed" media
  * dimensions are a deterministic hash-derived fake, clearly marked. The
  * Spark-side structure — binary column, metadata struct, per-partition
  * batch feature extraction, frame explosion — is real and tested; a
  * production build swaps `decodePayload` for the codec call and keeps
  * every plan shape.
  *
  * The testdata has no media table, so `documents.text` (UTF-8-encoded)
  * stands in as the payload bytes; `source` hashes to a modality.
  */
object Multimodal extends OpModule {

  val FrameBytes = 32
  val FrameStride = 4
  val FeatureBins = 16

  /** STUB: a real deployment decodes the container here (JPEG/PCM/mp4).
    * Identity keeps the plumbing (and tests) deterministic. */
  def decodePayload(bytes: Array[Byte]): Array[Byte] = bytes

  /** The media table: binary payload + modality + metadata struct.
    * Width/height/duration are hash-derived FAKES standing in for header
    * parsing (documented stub; the schema and plan shape are the point). */
  private def mediaDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id".as("media_id"), $"text", $"source")
      .withColumn("payload", encode($"text", "UTF-8"))
      .withColumn("kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (ColFns.hex32($"source") % 3 + 1).cast("int")))
      .withColumn("width", (ColFns.hex32($"text") % 1920 + 16).cast("long"))
      .withColumn("height", (ColFns.hex32(concat($"text", lit("h"))) % 1080 + 16).cast("long"))
  }

  private val mediaSqlBase: String =
    s"""SELECT doc_id AS media_id, text, source,
       |  encode(text) AS payload,
       |  ['image', 'audio', 'video'][(${ColFns.hex32Sql("source")} % 3 + 1)::INT] AS kind,
       |  ${ColFns.hex32Sql("text")} % 1920 + 16 AS width,
       |  ${ColFns.hex32Sql("(text || 'h')")} % 1080 + 16 AS height
       |FROM documents""".stripMargin

  /** Metadata projection + a resize plan (fit within 512px, aspect kept)
    * — pure column arithmetic over the metadata, no payload decode. */
  private def metaDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaDf(spark, dir)
      .withColumn("n_bytes", octet_length($"payload").cast("long"))
      .withColumn("content_hash", md5($"text"))
      .withColumn("scale",
        least(lit(1.0), lit(512.0) / $"width".cast("double")))
      .withColumn("out_width", floor($"width" * $"scale").cast("long"))
      .withColumn("out_height", floor($"height" * $"scale").cast("long"))
      .select("media_id", "kind", "n_bytes", "content_hash", "width",
        "height", "out_width", "out_height")
  }

  private val metaSql: String =
    s"""WITH m AS ($mediaSqlBase)
       |SELECT media_id, kind, octet_length(payload)::BIGINT AS n_bytes,
       |  md5(text) AS content_hash, width, height,
       |  floor(width * least(1.0, 512.0 / width::DOUBLE))::BIGINT AS out_width,
       |  floor(height * least(1.0, 512.0 / width::DOUBLE))::BIGINT AS out_height
       |FROM m""".stripMargin

  /** Frame sampling: the payload divides into fixed-size frames; every
    * FrameStride-th frame is kept (video keyframe sampling shape: one
    * explode, work proportional to frames kept). */
  private def framesDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaDf(spark, dir)
      .filter($"kind" === "video")
      .withColumn("n_frames",
        ceil(octet_length($"payload").cast("double") / FrameBytes).cast("long"))
      // an empty payload (n_frames = 0) would make sequence(0, -1, 4)
      // throw in Spark; DuckDB's range just yields no rows — skip on both
      .filter($"n_frames" > 0)
      .select($"media_id", $"text", $"n_frames",
        explode(sequence(lit(0L), $"n_frames" - 1, lit(FrameStride.toLong)))
          .as("frame_idx"))
      .withColumn("frame",
        expr(s"substr(text, cast(frame_idx * $FrameBytes + 1 as int), $FrameBytes)"))
      .withColumn("frame_hash", ColFns.hex32($"frame"))
      .select("media_id", "n_frames", "frame_idx", "frame_hash")
  }

  private val framesSql: String =
    s"""WITH m AS ($mediaSqlBase),
       |f AS (SELECT media_id, text,
       |        ceil(octet_length(payload)::DOUBLE / $FrameBytes)::BIGINT AS n_frames
       |      FROM m WHERE kind = 'video'),
       |x AS (SELECT media_id, text, n_frames,
       |        unnest(range(0, n_frames, $FrameStride)) AS frame_idx
       |      FROM f WHERE n_frames > 0)
       |SELECT media_id, n_frames, frame_idx,
       |  ${ColFns.hex32Sql(s"substr(text, (frame_idx * $FrameBytes + 1)::INT, $FrameBytes)")} AS frame_hash
       |FROM x""".stripMargin

  /** Per-partition batched feature extraction — the Scala analog of
    * `mapInPandas`: each partition decodes its payloads (stub) and emits
    * a normalized ${FeatureBins}-bin byte histogram per media row. Rows
    * never leave their partition; the feature vector is fixed-width.
    * Bins are flattened to scalar columns f0..f15 (a fixed-width feature
    * frame downstream trainers consume directly, and checkers can sort
    * scalar columns where they cannot sort array cells). Hash-checked
    * against `featuresSql` while the decode stub is identity (see its
    * doc); with a real codec this reverts to a rows-only check. */
  private def featuresDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = mediaDf(spark, dir)
      .select($"media_id", $"payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val bytes = decodePayload(payload)
          val hist = new Array[Double](FeatureBins)
          bytes.foreach(b => hist((b & 0xff) % FeatureBins) += 1.0)
          val n = math.max(1, bytes.length).toDouble
          (id, hist.map(_ / n).toSeq)
        }
      }
      .toDF("media_id", "features")
    val bins = (0 until FeatureBins).map(i => $"features" (i).as(s"f$i"))
    raw.select($"media_id" +: bins: _*)
  }

  /** SQL twin of the feature extractor. Valid ONLY because the decode
    * stub is the identity and the corpus payloads are ASCII (byte ==
    * char, verified across all SFs), so the per-byte histogram is
    * expressible as a char unnest + conditional pivot. A real codec
    * decode has no SQL twin — swap back to the rows-only check then.
    * Both engines divide exact integer counts by the same n, so the
    * doubles match bitwise. */
  private val featuresSql: String = {
    // LEFT JOIN from documents so an empty payload still yields its row
    // (all-zero bins), matching the Spark side's max(1, length) guard.
    val bins = (0 until FeatureBins)
      .map(b => s"  coalesce(max(CASE WHEN c.bin = $b THEN c.cnt END), 0)::DOUBLE / greatest(max(length(d.text)), 1) AS f$b")
      .mkString(",\n")
    s"""WITH x AS (SELECT doc_id AS media_id, text,
       |             unnest(range(1, length(text) + 1)) AS i
       |           FROM documents),
       |b AS (SELECT media_id,
       |        ascii(substr(text, i::INT, 1)) % $FeatureBins AS bin FROM x),
       |c AS (SELECT media_id, bin, count(*) AS cnt FROM b GROUP BY 1, 2)
       |SELECT d.doc_id AS media_id,
       |$bins
       |FROM documents d LEFT JOIN c ON c.media_id = d.doc_id
       |GROUP BY d.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta" -> (metaDf(_, _)),
    "media_frames" -> (framesDf(_, _)),
    "media_features" -> (featuresDf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "media_meta" -> metaSql,
    "media_frames" -> framesSql,
    "media_features" -> featuresSql
  )
}
