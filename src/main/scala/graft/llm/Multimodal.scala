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

  /** A REAL in-engine image decode — no codec libraries required, because
    * the format is binary netpbm (PGM "P5"), parseable with byte
    * arithmetic alone. [[packAsPgm]] writes each document's bytes as a
    * VALID P5 grayscale image (ASCII header `P5\n{w} {h}\n255\n` + raw
    * 8-bit pixels); [[pgmDecode]] then decodes WITHOUT looking at the
    * source text: it parses the dimensions out of the header it finds in
    * the payload, slices the pixel section it declares, and extracts
    * pixel statistics via the native byte folds
    * ([[graft.expr.ByteFold]]). The DuckDB oracle recomputes the same
    * features from the SOURCE text independently — so a header-parsing
    * or slicing bug in the decoder fails the hash gate, which is what
    * makes this a decode rather than a stub. (`decodeStub` remains the
    * honest stand-in for codec formats — JPEG/H.264 need libraries this
    * toolchain lacks — but the decode CONTRACT is now exercised
    * end-to-end on a real format.) */
  private val pgmW = 32

  def packAsPgm(docs: DataFrame): DataFrame = {
    val h = floor(length(col("text")) / pgmW)
    docs
      .filter(h > 0)
      .select(col("doc_id"),
        concat(
          concat(lit(s"P5\n$pgmW "), h.cast("string"), lit("\n255\n")).cast("binary"),
          expr(s"substring(CAST(text AS BINARY), 1, " +
            s"CAST($pgmW * floor(length(text) / $pgmW) AS INT))")).as("img"))
  }

  def pgmDecode(s: SparkSession, d: String): DataFrame = {
    graft.expr.GraftFunctions.register(s)
    decodeImg(packAsPgm(Tables.documents(s, d))).orderedBy("doc_id")
  }

  /** The decode stage alone (parse + stats), over any (doc_id, img)
    * frame — split out so the spec can push a CORRUPTED payload through
    * the real chain. */
  private[llm] def decodeImg(packed: DataFrame): DataFrame =
    decodeImgStats(parsedImg(packed))

  /** Header parse + pixel slice: (doc_id, .., w, h, px). */
  private[llm] def parsedImg(packed: DataFrame): DataFrame = {
    // dims bounded to 9 digits: a decoder enforces format limits — an
    // unbounded \d+ would let a syntactically valid but absurd header
    // (w=h=10^13) overflow the ANSI Long multiply / Int cast below and
    // crash the query instead of degrading (the malformed-payload
    // contract PgmSpec pins)
    val pat = "^P5\\n(\\d{1,9}) (\\d{1,9})\\n255\\n"
    // widest bounded header: "P5\n" + 9 digits + " " + 9 digits + "\n255\n"
    val headWindow = 3 + 9 + 1 + 9 + 5
    packed
      .withColumn("head", substring(col("img"), 1, headWindow).cast("string"))
      .withColumn("hdr", regexp_extract(col("head"), pat, 0))
      // a corrupted header (no regexp match -> '') must decode to NULL
      // dims, not throw under ANSI mode — CaseWhen evaluates the cast
      // branch only on a real match; hdr (group 0) is non-empty iff the
      // pattern matched, so it guards both dim extractions
      .withColumn("w", when(col("hdr") =!= "",
        regexp_extract(col("head"), pat, 1).cast("long")))
      .withColumn("h", when(col("hdr") =!= "",
        regexp_extract(col("head"), pat, 2).cast("long")))
      // 9-digit dims still multiply to ~10^18 (fits Long) but overflow
      // the Int cast; the CASE clamp is NULL-PRESERVING (least() would
      // swallow the null of a corrupted header and decode the whole
      // payload) and truncation is safe — substring stops at payload end
      .withColumn("px",
        expr("substring(img, length(hdr) + 1, CAST(CASE WHEN w * h > 2147483647" +
          " THEN 2147483647 ELSE w * h END AS INT))"))
  }

  /** Pixel statistics over the parsed bitmap — the feature-extract stage. */
  private[llm] def decodeImgStats(parsed: DataFrame): DataFrame =
    parsed
      .select(col("doc_id"), col("w"), col("h"),
        length(col("px")).cast("long").as("px_n"),
        call_function("byte_sum", col("px")).as("px_sum"),
        call_function("byte_min", col("px")).as("px_min"),
        call_function("byte_max", col("px")).as("px_max"))
      .withColumn("px_mean", col("px_sum") / col("px_n"))

  /** A REAL resize — the remaining stage of the advertised multimodal
    * quartet (decode / feature-extract / RESIZE / frame-sample): 2× box
    * downsample of the DECODED bitmap via the native
    * [[graft.expr.PgmShrink]] codegen loop (each 2×2 block's integer
    * floor mean). Output: halved dims, the shrunken image's md5, and its
    * byte-fold statistics — all scalars, so the whole resize sits under
    * the hash gate; the oracle replays the block averaging over the
    * source text's character codes with pure list arithmetic. Requires
    * h ≥ 2 (a one-row image has nothing to average). */
  def pgmResize(s: SparkSession, d: String): DataFrame = {
    graft.expr.GraftFunctions.register(s)
    parsedImg(packAsPgm(Tables.documents(s, d)))
      .filter(col("h") >= 2)
      .withColumn("sh", call_function("pgm_shrink",
        col("px"), col("w").cast("int"), col("h").cast("int")))
      .select(col("doc_id"),
        floor(col("w") / 2).cast("long").as("ow"),
        floor(col("h") / 2).cast("long").as("oh"),
        md5(col("sh")).as("out_md5"),
        call_function("byte_sum", col("sh")).as("out_sum"),
        call_function("byte_min", col("sh")).as("out_min"),
        call_function("byte_max", col("sh")).as("out_max"))
      .orderedBy("doc_id")
  }

  /** Block-average replay over source character codes: output pixel i at
    * (ox, oy) = (i % ow, i // ow) averages input indices
    * (2oy·w + 2ox) .. (+1, +w, +w+1), all 1-based in substr. The md5
    * compares byte-identically because averaged ASCII stays single-byte
    * UTF-8. */
  private def pgmResizeOracle: String = {
    val w = pgmW
    val ow = pgmW / 2
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) // $w AS hh FROM documents
       |  WHERE length(text) // $w >= 2),
       |c AS (
       |  SELECT doc_id, hh,
       |         list_transform(range(1, CAST($w * hh + 1 AS BIGINT)),
       |           i -> ord(substr(text, CAST(i AS INT), 1))) AS codes
       |  FROM d),
       |s AS (
       |  SELECT doc_id, CAST($ow AS BIGINT) AS ow, CAST(hh // 2 AS BIGINT) AS oh,
       |         list_transform(range(0, CAST($ow * (hh // 2) AS BIGINT)), i ->
       |           (codes[CAST((i // $ow) * 2 * $w + (i % $ow) * 2 + 1 AS INT)]
       |          + codes[CAST((i // $ow) * 2 * $w + (i % $ow) * 2 + 2 AS INT)]
       |          + codes[CAST(((i // $ow) * 2 + 1) * $w + (i % $ow) * 2 + 1 AS INT)]
       |          + codes[CAST(((i // $ow) * 2 + 1) * $w + (i % $ow) * 2 + 2 AS INT)]) // 4) AS oc
       |  FROM c)
       |SELECT doc_id, ow, oh,
       |       md5(array_to_string(list_transform(oc, x -> chr(CAST(x AS INT))), '')) AS out_md5,
       |       CAST(list_sum(oc) AS BIGINT) AS out_sum,
       |       CAST(list_min(oc) AS BIGINT) AS out_min,
       |       CAST(list_max(oc) AS BIGINT) AS out_max
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** AUDIO twin of the PGM path — binary RIFF/WAVE, 8-bit mono PCM: a
    * VALID playable WAV (44-byte canonical header, little-endian fields)
    * whose samples are the document's bytes. The decode demonstrates the
    * harder parse: multi-byte LITTLE-ENDIAN integers read from payload
    * bytes (sample rate at offset 25, data length at 41) via single-byte
    * `byte_sum` slices — no codec library, no UDF. Features are the audio
    * staples: sample count, peak deviation from the unsigned-PCM midpoint
    * (derived from the min/max folds), and energy (sum of squares — the
    * `byte_sumsq` fold). The oracle recomputes everything from the source
    * text, so a header-layout or endianness bug fails the hash gate. */
  private val wavRate = 8000

  def packAsWav(docs: DataFrame): DataFrame = {
    // LE32 of the data length, assembled as 4 hex byte pairs -> unhex
    def le32hex(n: Column): Column = concat(
      lpad(lower(hex(pmod(n, lit(256)))), 2, "0"),
      lpad(lower(hex(pmod(floor(n / 256), lit(256)))), 2, "0"),
      lpad(lower(hex(pmod(floor(n / 65536), lit(256)))), 2, "0"),
      lpad(lower(hex(pmod(floor(n / 16777216), lit(256)))), 2, "0"))
    val n = length(col("text"))
    // no NULL payloads: concat(NULL) would null the whole aud while the
    // oracle's constant sample_rate stays non-null — drop such rows on
    // BOTH sides (oracle: WHERE text IS NOT NULL)
    val rateHex = f"${wavRate & 0xff}%02x${(wavRate >> 8) & 0xff}%02x${(wavRate >> 16) & 0xff}%02x${(wavRate >> 24) & 0xff}%02x"
    docs.filter(col("text").isNotNull).select(col("doc_id"),
      concat(
        lit("RIFF").cast("binary"), unhex(le32hex(n + 36)),
        lit("WAVEfmt ").cast("binary"),
        unhex(lit("10000000")),            // fmt chunk size 16
        unhex(lit("01000100")),            // PCM, mono
        unhex(lit(rateHex)),               // sample rate LE32
        unhex(lit(rateHex)),               // byte rate (8-bit mono = rate)
        unhex(lit("01000800")),            // block align 1, bits 8
        lit("data").cast("binary"), unhex(le32hex(n)),
        col("text").cast("binary")).as("aud"))
  }

  def wavDecode(s: SparkSession, d: String): DataFrame = {
    graft.expr.GraftFunctions.register(s)
    decodeAud(packAsWav(Tables.documents(s, d))).orderedBy("doc_id")
  }

  /** The audio decode stage over any (doc_id, aud) frame. */
  private[llm] def decodeAud(packed: DataFrame): DataFrame = {
    // single-byte slice -> its unsigned value (byte_sum over one byte)
    def byteAt(i: Int): Column =
      call_function("byte_sum", expr(s"substring(aud, $i, 1)"))
    def le32(off: Int): Column =
      byteAt(off) + byteAt(off + 1) * 256L +
        byteAt(off + 2) * 65536L + byteAt(off + 3) * 16777216L
    packed
      .withColumn("magic_ok",
        substring(col("aud"), 1, 4).cast("string") === "RIFF" &&
          substring(col("aud"), 9, 8).cast("string") === "WAVEfmt ")
      .withColumn("sample_rate", when(col("magic_ok"), le32(25)))
      .withColumn("n_samples", when(col("magic_ok"), le32(41)))
      // a corrupted LE32 length (up to 2^32-1) must not overflow the
      // ANSI Int cast — null-preserving CASE clamp (least() would swallow
      // the bad-magic null), substring truncates at payload end
      .withColumn("px",
        expr("substring(aud, 45, CAST(CASE WHEN n_samples > 2147483647" +
          " THEN 2147483647 ELSE n_samples END AS INT))"))
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        (col("n_samples") / lit(wavRate.toDouble)).as("duration_sec"),
        greatest(call_function("byte_max", col("px")) - 128L,
          lit(128L) - call_function("byte_min", col("px"))).as("peak"),
        call_function("byte_sumsq", col("px")).as("energy"))
  }

  private def wavOracle: String =
    s"""WITH c AS (
       |  SELECT doc_id, CAST($wavRate AS BIGINT) AS sample_rate,
       |         CAST(length(text) AS BIGINT) AS n_samples,
       |         list_transform(range(1, CAST(length(text) + 1 AS BIGINT)),
       |           i -> ord(substr(text, CAST(i AS INT), 1))) AS codes
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT doc_id, sample_rate, n_samples,
       |       CAST(n_samples AS DOUBLE) / $wavRate AS duration_sec,
       |       greatest(CAST(list_max(codes) AS BIGINT) - 128,
       |                128 - CAST(list_min(codes) AS BIGINT)) AS peak,
       |       CAST(list_sum(list_transform(codes, x -> x * x)) AS BIGINT) AS energy
       |FROM c ORDER BY doc_id""".stripMargin

  /** Ground truth from the SOURCE text (ASCII ⇒ byte ≡ char code), fully
    * independent of the packed payload and the decoder's parsing. */
  private def pgmOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) // $pgmW AS hh FROM documents
       |  WHERE length(text) // $pgmW > 0),
       |c AS (
       |  SELECT doc_id, CAST($pgmW AS BIGINT) AS w, CAST(hh AS BIGINT) AS h,
       |         CAST($pgmW * hh AS BIGINT) AS px_n,
       |         list_transform(range(1, CAST($pgmW * hh + 1 AS BIGINT)),
       |           i -> ord(substr(text, CAST(i AS INT), 1))) AS codes
       |  FROM d)
       |SELECT doc_id, w, h, px_n,
       |       CAST(list_sum(codes) AS BIGINT) AS px_sum,
       |       CAST(list_min(codes) AS BIGINT) AS px_min,
       |       CAST(list_max(codes) AS BIGINT) AS px_max,
       |       CAST(list_sum(codes) AS DOUBLE) / px_n AS px_mean
       |FROM c ORDER BY doc_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_media_decode" -> QueryDef(pgmDecode, Some(pgmOracle)),
    "q_audio_decode" -> QueryDef(wavDecode, Some(wavOracle)),
    "q_media_resize" -> QueryDef(pgmResize, Some(pgmResizeOracle)),
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
