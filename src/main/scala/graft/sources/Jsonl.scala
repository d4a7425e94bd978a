package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document ingestion — the wire format crawl drops actually
  * arrive in (one JSON object per line), parsed against the documents
  * contract with MALFORMED-ROW QUARANTINE instead of job failure: a
  * line that is not valid JSON, or parses but lacks a required field,
  * keeps flowing as `valid = false` with its raw payload intact, so an
  * audit can count, inspect, and re-drive the quarantine without
  * re-reading the drop. (Reference anchor: the engine's file-based
  * ingestion surface, SURVEY §2.1; the reference's own feeds arrive as
  * JSON messages that it validates field-by-field before use.)
  *
  * Plan shape: `text` scan → one `from_json` per line → per-row
  * validity flags. Zero shuffles at any corpus size; the parse is
  * codegen'd and partition-local, and the SAME schema/expressions serve
  * batch (`docs`) and streaming (`docsStream`) so a file-watch ingest
  * and a backfill read cannot drift. `from_json` yields a null struct
  * on malformed input, which the validity flag catches alongside
  * missing required fields — the two failure classes an ingest
  * distinguishes (`err` says which).
  */
object Jsonl {

  /** The documents-table contract a crawl line must satisfy. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  private def parsed(lines: DataFrame): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .select($"value", from_json($"value", schema).as("j"))
      // from_json PERMISSIVE-nulls the fields on BOTH unparseable input
      // and valid JSON missing the contract fields, so the
      // wire-corruption vs schema-drift split (the whole point of the
      // err class) needs its own probe: try_parse_json is null exactly
      // when the line is not JSON. ALL four fields are required for
      // validity: a null lang/source would turn downstream gate
      // booleans (lang === "en") into NULLs that vanish from both the
      // keep and the reject branch of an ingest filter.
      .withColumn("err",
        when(expr("try_parse_json(value)").isNull, "malformed_json")
          .when($"j.doc_id".isNull || $"j.text".isNull ||
            $"j.lang".isNull || $"j.source".isNull, "missing_required")
          .otherwise(lit(null).cast("string")))
      .select($"value", $"j.doc_id", $"j.text", $"j.lang", $"j.source",
        $"err")
      .withColumn("valid", $"err".isNull)
      // the quarantine keeps the raw line; valid rows drop it (no point
      // carrying the serialized form of data we already parsed)
      .withColumn("raw", when(!$"valid", $"value"))
      .drop("value")
  }

  /** Batch read of a JSONL drop: every line becomes a row — `valid`
    * rows satisfy the documents contract, the rest carry `err` +
    * `raw` for the quarantine sink. */
  def docs(spark: SparkSession, path: String): DataFrame =
    parsed(spark.read.text(path))

  /** The same contract as a STREAMING source (file-watch ingest):
    * `docsStream(spark, dir).filter($"valid")` feeds
    * [[graft.streaming.Streams.docIngest]] directly; `!valid` rows
    * route to the quarantine sink. */
  def docsStream(spark: SparkSession, path: String): DataFrame =
    parsed(spark.readStream.text(path))
}
