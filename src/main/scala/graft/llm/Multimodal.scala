package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.core.QueryDef.OrderedOut

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * struct metadata, plus decode / feature-extract / frame-sample operators.
  *
  * The decode step is a DETERMINISTIC STUB — image/audio codec libraries are
  * not in this toolchain, so `decodeStub` derives features with hash/length
  * built-ins. Everything around it (schema, binary slicing, batch shape,
  * partitioning) is the real Spark-side contract a codec UDF would plug
  * into: swap `decodeStub` for a vectorized decode and nothing else moves.
  * All stub features are codegen'd built-ins — no UDF, no driver round-trip.
  */
object Multimodal {

  /** documents → media-shaped table: payload `bin` (utf-8 bytes standing in
    * for an encoded frame) + typed metadata struct. */
  def packDocumentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("bin"),
      struct(
        lit("text/plain").as("mime"),
        col("lang").as("lang"),
        col("n_chars").cast("int").as("n_bytes_claimed")
      ).as("meta")
    )

  /** Stubbed decode: byte length, content hash, first-byte "channel" value,
    * and fake width/height derived from length — stands in for pixel-level
    * features. Deterministic, so the oracle can replay it. */
  def decodeStub(bin: Column): Column =
    struct(
      // int64 feature fields, matching DuckDB's octet_length/% output type
      length(bin).cast("long").as("n_bytes"),
      md5(bin).as("content_md5"),
      ascii(bin.cast("string")).as("first_byte"),
      pmod(length(bin), lit(640)).cast("long").as("fake_w"),
      pmod(length(bin) * 7, lit(480)).cast("long").as("fake_h")
    )

  /** Frame sampling: n fixed-width binary slices of the payload (the batch
    * shape a video frame-sampler produces). Spark `substring` operates
    * directly on binary. `binExpr` is the payload column's SQL expression. */
  def frameSample(binExpr: String, n: Int, width: Int): Column =
    expr(s"transform(sequence(0, ${n - 1}), i -> substring($binExpr, i * $width + 1, $width))")

  /** Catalog query: pack → decode-stub → flatten → frame-sample. The
    * [[frameSample]] slices operate on the BINARY payload (the real
    * video-frame batch shape), then collapse to driver-visible scalars —
    * per-frame md5s and byte lengths, comma-joined — so the slicing sits
    * under the DuckDB hash compare. DuckDB 1.0 has no BLOB
    * substring/md5, so the ORACLE replays the slices on the string side:
    * valid because the stand-in payload is the utf-8 bytes of `text` and
    * the fixture corpus is pure ASCII (byte slice ≡ char slice —
    * verified octet_length(encode(text)) = length(text) over the
    * testdata; a real codec payload would keep the Spark side unchanged
    * and move this query to the rows-only gate). */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    val packed = packDocumentsAsMedia(Tables.documents(s, d))
    val frames = frameSample("bin", nFrames, frameWidth)
    packed
      .withColumn("f", decodeStub(col("bin")))
      .withColumn("frames", frames)
      .select(
        col("doc_id"),
        col("meta.mime").as("mime"),
        col("meta.lang").as("lang"),
        col("f.n_bytes").as("n_bytes"),
        col("f.content_md5").as("content_md5"),
        col("f.first_byte").as("first_byte"),
        col("f.fake_w").as("fake_w"),
        col("f.fake_h").as("fake_h"),
        expr("array_join(transform(frames, x -> md5(x)), ',')").as("frames_md5"),
        expr("array_join(transform(frames, x -> CAST(length(x) AS STRING)), ',')")
          .as("frames_len")
      )
      .orderedBy("doc_id")
  }

  private val nFrames = 4
  private val frameWidth = 32

  val defs: Map[String, QueryDef] = Map(
    "q_multimodal" -> QueryDef(mediaFeatures(_, _), Some(
      s"""SELECT doc_id, 'text/plain' AS mime, lang,
         |       octet_length(CAST(text AS BLOB)) AS n_bytes,
         |       md5(text) AS content_md5,
         |       ascii(substring(text, 1, 1)) AS first_byte,
         |       octet_length(CAST(text AS BLOB)) % 640 AS fake_w,
         |       (octet_length(CAST(text AS BLOB)) * 7) % 480 AS fake_h,
         |       array_to_string(list_transform(range(0, $nFrames),
         |         i -> md5(substring(text, i * $frameWidth + 1, $frameWidth))), ',') AS frames_md5,
         |       array_to_string(list_transform(range(0, $nFrames),
         |         i -> CAST(length(substring(text, i * $frameWidth + 1, $frameWidth)) AS VARCHAR)), ',') AS frames_len
         |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
