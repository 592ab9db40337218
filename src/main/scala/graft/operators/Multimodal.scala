package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, processed ENTIRELY as codegen'd
  * expressions — [[mediaFeatures]] (container sniffing + byte/PCM
  * statistics), [[patchFeatures]] (ViT-style tiling), and
  * [[audioFrames]] (fixed-window acoustics) are all declarative
  * projections with no UDF and no mapPartitions, so the scan
  * parallelizes across payloads inside whole-stage codegen.
  *
  * The container parsing (PNG IHDR, JPEG SOF marker walk, RIFF/WAVE
  * chunk walk, PCM-16 sample decode) is REAL byte plumbing; the JVM
  * functions [[imageDimensions]] / [[audioMetadata]] / [[pcmStats]] /
  * [[decodeStub]] are the single-record REFERENCE implementations the
  * specs pin the declarative forms against. The only decode out of
  * reach is compressed-codec pixel/sample decode (no codec libraries
  * in this environment) — a real deployment swaps the feature
  * expressions; the scan/partition/codegen shape is what this module
  * pins down.
  */
object Multimodal {
  /** A media record: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], width: Int,
      height: Int, fmt: String)

  /** Extracted features for one record. `detected_fmt` and the parsed
    * container metadata (width/height for images, sample_rate and
    * duration_ms for audio) come from the REAL header parsers; the
    * byte statistics come from the stub. */
  case class MediaFeatures(doc_id: Long, byte_len: Int, mean_byte: Double,
      checksum: Long, frame_hashes: Seq[Long], detected_fmt: Option[String],
      width: Option[Int], height: Option[Int], sample_rate: Option[Int],
      duration_ms: Option[Long], pcm_samples: Option[Long],
      pcm_sum: Option[Long], pcm_peak: Option[Int])

  // ---- declarative byte assembly: ints to binary, inside codegen ----
  /** Low byte of `c` as a two-hex-char string. */
  private def hexPair(c: Column): Column =
    lpad(hex(c.cast("long").bitwiseAND(lit(0xffL))), 2, "0")
  /** `c` as an n-byte big-endian binary column. */
  private def beBytes(c: Column, n: Int): Column =
    to_binary(concat((n - 1 to 0 by -1).map(k =>
      hexPair(shiftright(c.cast("long"), 8 * k))): _*), lit("hex"))
  /** `c` as an n-byte little-endian binary column. */
  private def leBytes(c: Column, n: Int): Column =
    to_binary(concat((0 until n).map(k =>
      hexPair(shiftright(c.cast("long"), 8 * k))): _*), lit("hex"))
  private def bytesLit(xs: Int*): Column = lit(xs.map(_.toByte).toArray)

  /** Build a media table from `documents`: each row becomes a REAL
    * container — a PNG signature + IHDR chunk, a JPEG SOI/APP0/SOF0
    * marker sequence, or a RIFF/WAVE fmt+data chunk pair — wrapping
    * the UTF-8 text payload, with container metadata (dimensions,
    * channels, sample rate) derived deterministically from `n_chars`.
    * The headers are assembled declaratively (hex/lpad/to_binary —
    * all codegen'd), and [[mediaFeatures]]' REAL parsers must read
    * the metadata back out of the bytes: the m1 oracle checks that
    * round trip. Sizes stay u16/u32-safe for any document length.
    *
    * (The WAVE data chunk is written unpadded; the chunk walker
    * handles both padded and unpadded final chunks.) */
  def fromDocuments(documents: DataFrame): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val plen = octet_length(payload)
    val w = (col("n_chars") % 640 + 16).cast("int")
    val h = ((col("n_chars") * 7) % 480 + 16).cast("int")
    val ch = (col("n_chars") % 2 + 1).cast("int")
    val rate = (col("n_chars") % 8 * 1000 + 8000).cast("int")
    val fmt = when(col("source") < "src4", "png")
      .when(col("source") < "src8", "jpg").otherwise("wav")

    val png = concat(
      bytesLit(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      beBytes(lit(13), 4), lit("IHDR".getBytes("US-ASCII")),
      beBytes(w, 4), beBytes(h, 4),
      bytesLit(8, 6, 0, 0, 0), // bit depth, color type, compr/filter/interlace
      payload)
    val jpg = concat(
      bytesLit(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 'J', 'F'), // SOI + APP0
      bytesLit(0xff, 0xc0, 0x00, 0x0b, 0x08),                 // SOF0, len 11, 8-bit
      beBytes(h, 2), beBytes(w, 2),
      bytesLit(0x01, 0x01, 0x11, 0x00),                       // 1 component
      payload)
    val wav = concat(
      lit("RIFF".getBytes("US-ASCII")), leBytes(plen + 36, 4),
      lit("WAVE".getBytes("US-ASCII")),
      lit("fmt ".getBytes("US-ASCII")), leBytes(lit(16), 4),
      leBytes(lit(1), 2), leBytes(ch, 2), leBytes(rate, 4),
      leBytes(rate * ch * 2, 4), leBytes(ch * 2, 2), leBytes(lit(16), 2),
      lit("data".getBytes("US-ASCII")), leBytes(plen, 4),
      payload)

    documents.select(
      col("doc_id"),
      when(fmt === "png", png).when(fmt === "jpg", jpg).otherwise(wav)
        .as("media"),
      w.as("width"), h.as("height"), fmt.as("fmt"))
  }

  /** REAL header parsing (not stubbed): container metadata lives in
    * the first bytes of the payload and needs no codec library.
    * Returns (format, width, height) for PNG (IHDR chunk) and
    * baseline/progressive JPEG (SOF0/SOF2 frame headers), or None for
    * unrecognized payloads. This is the piece of multimodal ingest
    * that is pure byte plumbing — exactly what a 100 TB media crawl
    * runs *before* deciding what to decode. */
  def imageDimensions(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int) = (u16(i).toLong << 16 | u16(i + 2)).toInt
    if (bytes.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        bytes.slice(12, 16).map(_.toChar).mkString == "IHDR") {
      Some(("png", u32(16), u32(20)))
    } else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk JPEG markers to the start-of-frame segment
      var i = 2
      while (i + 9 < bytes.length) {
        if (u8(i) != 0xff) return None
        val marker = u8(i + 1)
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          return Some(("jpg", u16(i + 7), u16(i + 5)))
        }
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) { i += 2 }
        else i += 2 + u16(i + 2)
      }
      None
    } else None
  }

  /** Parsed RIFF/WAVE container metadata (no codec needed for PCM). */
  case class AudioMeta(format_code: Int, channels: Int, sample_rate: Int,
      bits_per_sample: Int, duration_ms: Long)

  /** REAL audio container parsing (not stubbed): RIFF/WAVE chunk walk
    * reading the 'fmt ' header (format code, channels, sample rate,
    * bits/sample) and the 'data' chunk size, from which PCM duration
    * follows arithmetically. Like `imageDimensions`, this is the pure
    * byte plumbing a media crawl runs before deciding what to decode.
    * Returns None for payloads that aren't well-formed WAVE. */
  def audioMetadata(bytes: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int) = bytes(i) & 0xff
    def u16le(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int) = u16le(i).toLong | (u16le(i + 2).toLong << 16)
    if (bytes.length < 36 ||
        !(u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F') ||
        !(u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E'))
      return None
    var fmt: Option[(Int, Int, Long, Int)] = None
    var dataLen = -1L
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val sz = u32le(i + 4)
      if (id == "fmt " && i + 24 <= bytes.length)
        fmt = Some((u16le(i + 8), u16le(i + 10), u32le(i + 12), u16le(i + 22)))
      if (id == "data") dataLen = sz
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks are 16-bit aligned
    }
    fmt.collect { case (code, ch, rate, bits)
        if dataLen >= 0 && ch > 0 && rate > 0 && bits > 0 =>
      AudioMeta(code, ch, rate.toInt, bits,
        dataLen * 8000L / (ch.toLong * bits * rate))
    }
  }

  /** Per-sample statistics of a PCM-16 WAVE payload. */
  case class PcmStats(n_samples: Long, sample_sum: Long, peak: Int)

  /** REAL audio sample decode (not stubbed): a WAVE `data` chunk in
    * format code 1 at 16 bits IS the samples — little-endian signed
    * shorts, no codec needed — so sample-level statistics (count, sum,
    * peak amplitude) are pure byte arithmetic, the loudness/SNR-style
    * screen a media crawl runs without any library. Returns None for
    * non-PCM or non-16-bit payloads (compressed codecs stay stubbed —
    * the ONLY remaining stub surface). A trailing odd byte is not a
    * sample and is ignored; an empty data chunk yields (0, 0, 0). */
  def pcmStats(bytes: Array[Byte]): Option[PcmStats] = {
    def u8(i: Int) = bytes(i) & 0xff
    def u16le(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int) = u16le(i).toLong | (u16le(i + 2).toLong << 16)
    if (bytes.length < 36 ||
        !(u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F') ||
        !(u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E'))
      return None
    var fmtCode = -1; var bits = -1
    var dataOff = -1; var dataLen = -1L
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val sz = u32le(i + 4)
      if (id == "fmt " && i + 24 <= bytes.length) {
        fmtCode = u16le(i + 8); bits = u16le(i + 22)
      }
      if (id == "data") { dataOff = i + 8; dataLen = sz }
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks are 16-bit aligned
    }
    if (fmtCode != 1 || bits != 16 || dataOff < 0) return None
    val end = math.min(dataOff + dataLen, bytes.length.toLong).toInt
    var sum = 0L; var peak = 0; var n = 0L
    var j = dataOff
    while (j + 1 < end) {
      val s = (u8(j) | (u8(j + 1) << 8)).toShort.toInt
      sum += s
      if (math.abs(s) > peak) peak = math.abs(s)
      n += 1; j += 2
    }
    Some(PcmStats(n, sum, peak))
  }

  /** Single-record REFERENCE implementation for the spec suite: the
    * same container sniffing + byte statistics as [[mediaFeatures]]
    * computes declaratively, as plain JVM code (specs assert the two
    * agree record for record). The hash features stand in for
    * COMPRESSED-codec decode (no codec libs in this environment);
    * uncompressed PCM audio is decoded for REAL by [[pcmStats]].
    * Not an API path — the engine-side feature pass is
    * [[mediaFeatures]]. */
  def decodeStub(rec: MediaRecord, frames: Int): MediaFeatures = {
    val bytes = rec.media
    var sum = 0L; var ck = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      ck = ck * 31 + (bytes(i) & 0xff)
      i += 1
    }
    val fh = (0 until frames).map { f =>
      val off = if (bytes.length <= 64) 0 else f * math.max((bytes.length - 64) / math.max(frames - 1, 1), 1)
      var h = 0xcbf29ce484222325L
      var j = off
      val end = math.min(off + 64, bytes.length)
      while (j < end) { h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      h
    }
    val img = imageDimensions(bytes)
    val aud = if (img.isEmpty) audioMetadata(bytes) else None
    val pcm = if (aud.isDefined) pcmStats(bytes) else None
    MediaFeatures(rec.doc_id,
      bytes.length,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
      ck, fh,
      img.map(_._1).orElse(aud.map(_ => "wav")),
      img.map(_._2), img.map(_._3),
      aud.map(_.sample_rate), aud.map(_.duration_ms),
      pcm.map(_.n_samples), pcm.map(_.sample_sum), pcm.map(_.peak))
  }

  /** The media feature pass, fully declarative — no UDF, no
    * mapPartitions, no driver involvement; retires the former
    * `extractFeatures` mapPartitions path. Two declarative pieces:
    * a HEADER projection (bounded per-row reads, however large the
    * payload) and PATCH-SHAPED byte/PCM statistics (the m2
    * discipline: payloads split into 64-byte patch rows, per-patch
    * work over small local strings, partial-aggregated groupBy
    * re-assembly — the byte work distributes across patch rows
    * instead of serializing a whole payload onto one task, which is
    * both the fast local shape, measured, and the right 100 TB shape
    * under skewed payload sizes). Requires `idCol` unique per row.
    *
    * The container parsing is REAL and mirrors the JVM reference
    * parsers bit for bit (spec-asserted against [[imageDimensions]] /
    * [[audioMetadata]] / [[pcmStats]] per record):
    *  - PNG: signature + IHDR dimensions at the fixed offset;
    *  - JPEG: a bounded MARKER WALK (an `aggregate` fold over ≤ 32
    *    segments — real files reach SOF well inside that) skipping
    *    variable-length segments to SOF0/1/2 for (width, height);
    *  - RIFF/WAVE: a bounded CHUNK WALK (≤ 16 chunks) to the last
    *    'fmt ' and 'data' chunks, then format code / channels / rate /
    *    bits and the PCM duration arithmetic;
    *  - PCM-16 payloads additionally fold exact sample statistics
    *    (count, sum, peak) straight off the data chunk, like [[m3:
    *    audioFrames]] but whole-payload.
    * Byte statistics (`byte_len`, exact `byte_sum`, `mean_byte`)
    * replace the former stub's hash features — the only decode still
    * out of reach here is compressed-codec pixel/sample decode (no
    * codec libs in this environment; a real deployment swaps the
    * feature lambda, the scan/partition/codegen shape is the point).
    *
    * @return one row per input row: (idCol, byte_len INT, byte_sum
    *         BIGINT, mean_byte DOUBLE, detected_fmt STRING?, width
    *         INT?, height INT?, sample_rate INT?, duration_ms BIGINT?,
    *         pcm_samples BIGINT?, pcm_sum BIGINT?, pcm_peak INT?,
    *         n_frames INT) */
  def mediaFeatures(media: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", frames: Int = 4): DataFrame = {
    require(frames >= 1)
    // STAGED evaluation — the expression-tree discipline that makes
    // this fast: (1) the payload's hex rides as its OWN column, so a
    // byte read is one substr on an attribute instead of re-hexing
    // the payload per read (interpreted lambda evaluation shares no
    // subexpressions); (2) the JPEG/WAVE walk STRUCTS ride as their
    // own columns, so the ~8 output features derive from two
    // getFields instead of each re-running its walk. Catalyst keeps
    // both stages: CollapseProject never inlines a non-cheap alias
    // used more than once.
    val m = col("__m")
    val blen = col("__blen")
    val hx = col("__hx")
    val pre = media.select(col(idCol), col(mediaCol).as("__m"),
      hex(col(mediaCol)).as("__hx"),
      octet_length(col(mediaCol)).cast("long").as("__blen"))
    def b(p: Column): Column =
      conv(hx.substr((p * 2 - 1).cast("int"), lit(2)), 16, 10).cast("long")
    def u16be(p: Column): Column = b(p) * 256L + b(p + 1)
    def u32be(p: Column): Column =
      ((b(p) * 256L + b(p + 1)) * 256L + b(p + 2)) * 256L + b(p + 3)
    def u16le(p: Column): Column = b(p) + b(p + 1) * 256L
    def u32le(p: Column): Column =
      b(p) + b(p + 1) * 256L + b(p + 2) * 65536L + b(p + 3) * 16777216L
    def ascii4(p: Column): Column = m.substr(p.cast("int"), lit(4))

    // ---- PNG: signature + IHDR at the fixed offset (imageDimensions)
    val isPng = blen >= 24L && b(lit(1)) === 0x89L &&
      m.substr(2, 3) === lit("PNG".getBytes("US-ASCII")) &&
      ascii4(lit(13)) === lit("IHDR".getBytes("US-ASCII"))
    val pngW = u32be(lit(17))
    val pngH = u32be(lit(21))

    // ---- JPEG: marker walk to SOF0/1/2 — same step rule as the JVM
    // walker (RST/SOI advance by 2, everything else by 2 + seglen),
    // dead on a non-FF byte or running off the payload
    val isJpgSig = blen >= 4L && b(lit(1)) === 0xffL && b(lit(2)) === 0xd8L
    val jpgWalk = aggregate(
      sequence(lit(1), lit(32)),
      struct(lit(3L).as("off"), lit(-1L).as("sof")),
      (acc, _) => {
        val off = acc.getField("off")
        val sof = acc.getField("sof")
        val mk = b(off + 1)
        val stepped = when(mk.isin(0xc0L, 0xc1L, 0xc2L),
            struct(off.as("off"), off.as("sof")))
          .when(mk >= 0xd0L && mk <= 0xd9L,
            struct((off + 2).as("off"), lit(-1L).as("sof")))
          .otherwise(struct((off + 2 + u16be(off + 2)).as("off"),
            lit(-1L).as("sof")))
        when(sof =!= -1L || off === -1L, acc)
          .when(off + 8 >= blen || b(off) =!= 0xffL,
            struct(lit(-1L).as("off"), lit(-1L).as("sof")))
          .otherwise(stepped)
      })
    val jpgSof = col("__jw").getField("sof")
    val isJpg = isJpgSig && jpgSof =!= -1L
    val jpgW = u16be(jpgSof + 7)
    val jpgH = u16be(jpgSof + 5)
    val imgOk = isPng || isJpg

    // ---- RIFF/WAVE: chunk walk to the last 'fmt ' and 'data' chunks
    val isRiff = blen >= 36L &&
      ascii4(lit(1)) === lit("RIFF".getBytes("US-ASCII")) &&
      ascii4(lit(9)) === lit("WAVE".getBytes("US-ASCII"))
    val wavWalkExpr = aggregate(
      sequence(lit(1), lit(16)),
      struct(lit(13L).as("off"), lit(-1L).as("fmtOff"),
        lit(-1L).as("dOff"), lit(-1L).as("dLen")),
      (acc, _) => {
        val off = acc.getField("off")
        val sz = u32le(off + 4)
        val isFmt = ascii4(off) === lit("fmt ".getBytes("US-ASCII")) &&
          off + 23 <= blen
        val isData = ascii4(off) === lit("data".getBytes("US-ASCII"))
        when(off === -1L || off + 7 > blen,
          struct(lit(-1L).as("off"), acc.getField("fmtOff").as("fmtOff"),
            acc.getField("dOff").as("dOff"), acc.getField("dLen").as("dLen")))
          .otherwise(struct(
            (off + 8 + sz + pmod(sz, lit(2L))).as("off"), // 16-bit aligned
            when(isFmt, off).otherwise(acc.getField("fmtOff")).as("fmtOff"),
            when(isData, off + 8).otherwise(acc.getField("dOff")).as("dOff"),
            when(isData, sz).otherwise(acc.getField("dLen")).as("dLen")))
      })
    // stage the walks once; everything below reads the struct columns
    val wk = pre.select(col(idCol), m, hx, blen,
      jpgWalk.as("__jw"), wavWalkExpr.as("__ww"))
    val fmtOff = col("__ww").getField("fmtOff")
    val dOff = col("__ww").getField("dOff")
    val dLen = col("__ww").getField("dLen")
    val wFmtCode = u16le(fmtOff + 8)
    val wCh = u16le(fmtOff + 10)
    val wRate = u32le(fmtOff + 12)
    val wBits = u16le(fmtOff + 22)
    val audioOk = isRiff && !imgOk && fmtOff =!= -1L && dLen >= 0L &&
      wCh > 0L && wRate > 0L && wBits > 0L
    val durationMs =
      floor(dLen * 8000L / (wCh * wBits * wRate)).cast("long")

    // ---- PCM-16 window off the data chunk (pcmStats bounds)
    val pcmOk = audioOk && wFmtCode === 1L && wBits === 16L && dOff =!= -1L
    val avail = greatest(least(dLen, blen - dOff + 1), lit(0L))
    val nPairs = floor(avail / 2L).cast("long")

    // ---- header pass: one projection per row — every read above is a
    // BOUNDED number of fixed/walked offsets, so this stays cheap
    // however large the payload. The id must be unique per row (the
    // byte/PCM statistics re-join on it).
    val hdr = wk.select(
      col(idCol), m,
      blen,
      when(isPng, "png").when(isJpg, "jpg").when(audioOk, "wav")
        .otherwise(lit(null).cast("string")).as("detected_fmt"),
      when(isPng, pngW).when(isJpg, jpgW).cast("int").as("width"),
      when(isPng, pngH).when(isJpg, jpgH).cast("int").as("height"),
      when(audioOk, wRate).cast("int").as("sample_rate"),
      when(audioOk, durationMs).as("duration_ms"),
      pcmOk.as("__pcm_ok"), dOff.as("__doff"), nPairs.as("__npairs"))

    // ---- byte / PCM statistics in the PATCH-ROW shape (the measured-
    // fast m2 discipline): whole-payload folds as one giant per-row
    // expression evaluate interpreted and scan long strings from the
    // start, so they are slow AND serialize a payload's work onto one
    // task. Instead each payload splits into 64-byte patches (binary
    // substr — an O(1) slice), per-patch work runs over a SMALL local
    // hex string, and a partial-aggregated groupBy(id) re-assembles
    // the totals — the work distributes across patch rows however
    // skewed the payload sizes (measured: 5.2 s → ~patch cost for m1
    // at sf0.1). 64 bytes = 32 whole PCM-16 samples, so no sample
    // straddles a patch boundary.
    def patchRows(src: DataFrame, payload: Column): DataFrame = {
      val len = octet_length(payload)
      val nPatch = ((len + 63) / lit(64)).cast("int")
      src.where(len > 0)
        .select(col(idCol), payload.as("__pl"),
          posexplode(sequence(lit(0), nPatch - 1)).as(Seq("__pi", "__x")))
        .select(col(idCol),
          col("__pl").substr(col("__pi") * 64 + 1, lit(64)).as("__patch"))
    }
    val bhx = hex(col("__patch"))
    val patchByteSum = aggregate(
      transform(sequence(lit(1), octet_length(col("__patch"))),
        i => conv(bhx.substr(i * 2 - 1, lit(2)), 16, 10).cast("long")),
      lit(0L), _ + _)
    val bstats = patchRows(hdr, col("__m"))
      .select(col(idCol), patchByteSum.as("__ps"))
      .groupBy(idCol).agg(sum("__ps").as("__byte_sum"))

    val pcmSamples = transform(
      sequence(lit(1), (octet_length(col("__patch")) / lit(2)).cast("int")),
      i => {
        val v = conv(bhx.substr(i * 4 - 3, lit(2)), 16, 10).cast("long") +
          conv(bhx.substr(i * 4 - 1, lit(2)), 16, 10).cast("long") * 256L
        when(v >= 32768L, v - 65536L).otherwise(v)
      })
    val pstats = patchRows(
        hdr.where(col("__pcm_ok") && col("__npairs") > 0),
        col("__m").substr(col("__doff").cast("int"),
          (col("__npairs") * 2L).cast("int"))) // odd tail excluded
      .select(col(idCol),
        aggregate(pcmSamples, lit(0L), _ + _).as("__s"),
        aggregate(pcmSamples, lit(0L), (a, x) => greatest(a, abs(x))).as("__p"))
      .groupBy(idCol)
      .agg(sum("__s").as("__pcm_sum"), max("__p").as("__pcm_peak"))

    hdr.drop("__m")
      .join(bstats, Seq(idCol), "left")
      .join(pstats, Seq(idCol), "left")
      .select(
        col(idCol),
        col("__blen").cast("int").as("byte_len"),
        coalesce(col("__byte_sum"), lit(0L)).as("byte_sum"),
        when(col("__blen") < 1L, lit(0.0))
          .otherwise(coalesce(col("__byte_sum"), lit(0L)).cast("double") /
            col("__blen")).as("mean_byte"),
        col("detected_fmt"), col("width"), col("height"),
        col("sample_rate"), col("duration_ms"),
        when(col("__pcm_ok"), col("__npairs")).as("pcm_samples"),
        when(col("__pcm_ok"), coalesce(col("__pcm_sum"), lit(0L)))
          .as("pcm_sum"),
        when(col("__pcm_ok"), coalesce(col("__pcm_peak"), lit(0L)))
          .cast("int").as("pcm_peak"),
        lit(frames).as("n_frames"))
  }

  /** PATCH featurization of an opaque binary column — the plumbing
    * under patch-embedding pipelines (ViT-style tiling, audio
    * chunking): each payload splits into fixed-size byte patches and
    * every patch yields integer features (length, byte sum, max, and
    * a 257-base rolling hash mod 1e9+7), ENTIRELY as codegen'd
    * expressions — substring on binary for the slice, hex-pair
    * extraction for the byte values, an `aggregate` fold for the
    * hash. No UDF, no mapPartitions: the patch grid is one
    * posexplode, so Spark parallelizes across payloads AND keeps
    * whole-stage codegen. A real encoder replaces the feature lambda;
    * the slicing/indexing/shuffle shape — the part that matters at
    * 100 TB — is what this op pins down and the oracle replays. */
  /** AUDIO FRAMING over canonical WAV containers — the fixed-window
    * feature pass (VAD/energy/fingerprint front ends all start here):
    * the PCM-16 LE data section (byte 45 onward in the 44-byte-header
    * canonical layout [[fromDocuments]] writes) splits into frames of
    * `frameSamples`, and each frame reports exact integer acoustics —
    * sample count, Σ|s|, peak |s|, and Σs² (energy; rms = sqrt of it
    * when a float is wanted — kept as the exact BIGINT here). Entirely
    * codegen'd (binary substr + hex-pair sample decode + aggregate
    * folds): no UDF, no mapPartitions, parallel across payloads — the
    * m2 patch discipline applied to signed 16-bit samples. A trailing
    * odd byte is not a full sample and is dropped.
    *
    * @param media rows of WAV containers (filter [[fromDocuments]] to
    *              `fmt = 'wav'` first — the header is assumed, not
    *              sniffed; [[audioMetadata]] is the sniffing path). */
  def audioFrames(media: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", frameSamples: Int = 256): DataFrame = {
    require(frameSamples >= 1)
    val frameBytes = frameSamples * 2
    val nSamples = ((octet_length(col(mediaCol)) - 44) / lit(2)).cast("long")
    val nFrames = ((nSamples + lit(frameSamples - 1)) / lit(frameSamples))
      .cast("int")
    val framed = media
      .where(nSamples > 0)
      .select(col(idCol), col(mediaCol),
        posexplode(sequence(lit(0), nFrames - 1)).as(Seq("frame_idx", "__f")))
      .select(col(idCol), col("frame_idx"),
        col(mediaCol).substr(col("frame_idx") * frameBytes + 45,
          lit(frameBytes)).as("__fr"))
    val hx = hex(col("__fr"))
    val samples = transform(
      sequence(lit(1), (octet_length(col("__fr")) / lit(2)).cast("int")),
      i => {
        val v = conv(hx.substr(i * 4 - 3, lit(2)), 16, 10).cast("long") +
          conv(hx.substr(i * 4 - 1, lit(2)), 16, 10).cast("long") * 256L
        when(v >= 32768L, v - 65536L).otherwise(v)
      })
    framed.select(col(idCol), col("frame_idx"),
      size(samples).as("n_samples"),
      aggregate(samples, lit(0L), (a, s) => a + abs(s)).as("sum_abs"),
      array_max(transform(samples, s => abs(s))).as("peak"),
      aggregate(samples, lit(0L), (a, s) => a + s * s).as("energy"))
  }

  /** ENERGY-GATED ACTIVITY SEGMENTATION over PCM frames — the
    * VAD-shaped pass an audio curation pipeline runs before
    * transcription (keep the spans worth sending to the ASR model,
    * drop the silence): frames from [[audioFrames]] whose mean
    * per-sample energy clears `meanEnergyThreshold` (integer compare
    * `energy ≥ threshold · n_samples` — Σs² is already exact) are
    * ACTIVE, and maximal runs of consecutive active frames merge into
    * segments via the gaps-and-islands discipline (frame_idx minus
    * its per-doc rank is constant exactly on a run). One window pass
    * + one aggregation per doc after the frame explode — the same
    * partition-local shape as the session window operator, entity
    * histories the natural partition unit at scale. A real VAD swaps
    * the energy gate for a model score; the segmentation algebra —
    * the Spark-side plumbing — is identical.
    *
    * @return (id, seg_id, start_frame, end_frame, n_frames,
    *         total_energy) — seg_id 0-based per doc in frame order.
    */
  def voiceSegments(media: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", frameSamples: Int = 256,
      meanEnergyThreshold: Long = 1L): DataFrame = {
    require(meanEnergyThreshold >= 0)
    import org.apache.spark.sql.expressions.Window
    val fr = audioFrames(media, idCol, mediaCol, frameSamples)
    val w = Window.partitionBy(col(idCol)).orderBy(col("frame_idx"))
    fr.where(col("energy") >= lit(meanEnergyThreshold) * col("n_samples"))
      .withColumn("__isl", col("frame_idx") - row_number().over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg(min("frame_idx").as("start_frame"),
        max("frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"), sum("energy").as("total_energy"))
      .withColumn("seg_id",
        row_number().over(Window.partitionBy(col(idCol))
          .orderBy(col("start_frame"))).cast("long") - 1)
      .select(col(idCol), col("seg_id"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("total_energy"))
  }

  /** Build a "video" table from `documents`: each row becomes a REAL
    * RIFF/AVI-shaped container — `RIFF <sz> AVI ` + `LIST <sz> movi`
    * holding `n_frames` uncompressed `00db` frame chunks (the classic
    * AVI DIB-frame stream layout), each frame a fixed-length slice of
    * the UTF-8 payload. Frame count derives from `n_chars`
    * (3..9 frames), frame length is the payload split evenly and
    * FLOORED TO EVEN so RIFF's chunk word-padding never applies —
    * the whole container assembles declaratively (a binary
    * `aggregate` fold over the frame sequence; no UDF). Docs whose
    * payload cannot hold one even-length slice per frame are
    * excluded (the caller's ingest gate). */
  def fromDocumentsVideo(documents: DataFrame): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val plen = octet_length(payload)
    val nf = (col("n_chars") % 7 + 3).cast("int")
    val flen = (((plen / nf).cast("long") / 2L).cast("long") * 2L).cast("int")
    val chunkSz = flen + 8
    val movi = concat(
      lit("LIST".getBytes("US-ASCII")), leBytes(nf * chunkSz + 4, 4),
      lit("movi".getBytes("US-ASCII")),
      aggregate(sequence(lit(0), nf - 1),
        lit(Array.empty[Byte]),
        (acc, i) => concat(acc,
          lit("00db".getBytes("US-ASCII")), leBytes(flen, 4),
          payload.substr(i * flen + 1, flen))))
    documents
      .where(octet_length(encode(col("text"), "UTF-8")) >= 18)
      .select(col("doc_id"),
        concat(lit("RIFF".getBytes("US-ASCII")),
          leBytes(octet_length(movi) + 4, 4),
          lit("AVI ".getBytes("US-ASCII")), movi).as("media"),
        nf.as("n_frames"), flen.as("frame_len"), lit("avi").as("fmt"))
  }

  /** FRAME SAMPLING over the AVI-shaped containers — the "sample
    * 1 fps for the vision encoder" primitive of a video training
    * pipeline: parse the movi stream FROM THE BYTES (frame length
    * read out of the first chunk header, frame count derived from the
    * container size), keep every `stride`-th frame, and report exact
    * integer features per kept frame (length, byte sum, 257-base
    * rolling hash — where a real pipeline runs its decoder). One
    * posexplode parallelizes across frames; everything is substr +
    * hex-pair folds, no UDF, no mapPartitions.
    *
    * @param media rows of [[fromDocumentsVideo]]-shaped containers
    *              (the header is assumed, not sniffed — mirror the
    *              m3 contract). */
  def frameSample(media: DataFrame, stride: Int,
      idCol: String = "doc_id", mediaCol: String = "media"): DataFrame = {
    require(stride >= 1)
    val m = col(mediaCol)
    val hx = hex(m)
    def b(i1: Column): Column = // 1-based byte
      conv(hx.substr(i1 * 2 - 1, lit(2)), 16, 10).cast("long")
    // frame length from the FIRST chunk header (bytes 29..32, u32le)
    val flen = (b(lit(29)) + b(lit(30)) * 256L +
      b(lit(31)) * 65536L + b(lit(32)) * 16777216L).cast("int")
    val nf = ((octet_length(m) - 24) / (flen + 8)).cast("int")
    val framed = media
      .where(m.substr(1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
        m.substr(9, 4) === lit("AVI ".getBytes("US-ASCII")) &&
        m.substr(21, 4) === lit("movi".getBytes("US-ASCII")) && nf > 0)
      .select(col(idCol), m, flen.as("__fl"),
        posexplode(sequence(lit(0), nf - 1)).as(Seq("frame_idx", "__i")))
      .where(col("frame_idx") % stride === 0)
      .select(col(idCol), col("frame_idx"),
        m.substr(col("frame_idx") * (col("__fl") + 8) + 33,
          col("__fl")).as("__frame"))
    val fhx = hex(col("__frame"))
    val bytes = transform(sequence(lit(1), octet_length(col("__frame"))),
      i => conv(fhx.substr(i * 2 - 1, lit(2)), 16, 10).cast("long"))
    framed.select(col(idCol), col("frame_idx"),
      octet_length(col("__frame")).as("frame_len"),
      aggregate(bytes, lit(0L), _ + _).as("frame_sum"),
      aggregate(bytes, lit(0L),
        (acc, x) => (acc * lit(257L) + x) % lit(1000000007L)).as("frame_hash"))
  }

  /** Build a raw GRAYSCALE BITMAP table from `documents`: width/height
    * derive from the payload size (w = ⌊√plen⌋ capped at 48, h =
    * ⌊plen/w⌋ capped at 48 — w·h ≤ plen by construction, so the pixel
    * buffer is always a clean payload prefix), pixels are the raw
    * bytes, and the dimensions ride as TYPED METADATA columns — the
    * uncompressed-image shape a resize kernel actually consumes. */
  def fromDocumentsBitmap(documents: DataFrame): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val plen = octet_length(payload)
    val w = least(floor(sqrt(plen.cast("double"))).cast("int"), lit(48))
    val h = least((plen / w).cast("int"), lit(48))
    documents
      .where(octet_length(encode(col("text"), "UTF-8")) >= 4)
      .select(col("doc_id"), payload.substr(lit(1), w * h).as("media"),
        w.as("width"), h.as("height"))
  }

  /** NEAREST-NEIGHBOR RESIZE (integer downsample): out(y, x) =
    * in(y·f, x·f) over the raw bitmap — the exact-arithmetic core of
    * the thumbnail/downsample stage (a real pipeline swaps in an
    * area/bilinear kernel; the byte indexing, metadata plumbing, and
    * per-payload parallel shape are what this pins). Output features
    * are exact integers — dimensions, pixel sum, and the 257-base
    * rolling hash of the resized buffer IN ROW-MAJOR ORDER, so a
    * single transposed index on either engine hash-mismatches.
    * Declarative throughout: one `transform` over the output pixel
    * sequence, hex-pair byte extraction, fold for the hash. */
  def resizeNearest(media: DataFrame, factor: Int,
      idCol: String = "doc_id", mediaCol: String = "media",
      wCol: String = "width", hCol: String = "height"): DataFrame = {
    require(factor >= 1)
    val w = col(wCol).cast("int")
    val h = col(hCol).cast("int")
    val ow = (w / factor).cast("int")
    val oh = (h / factor).cast("int")
    val hx = hex(col(mediaCol))
    def b(i0: Column): Column = // 0-based byte
      conv(hx.substr(i0 * 2 + 1, lit(2)), 16, 10).cast("long")
    val out = transform(sequence(lit(0), ow * oh - 1),
      i => b(((i / ow).cast("int") * factor) * w + (i % ow) * factor))
    media
      .where(ow > 0 && oh > 0)
      .select(col(idCol), w.as("in_w"), h.as("in_h"),
        ow.as("out_w"), oh.as("out_h"),
        size(out).as("out_len"),
        aggregate(out, lit(0L), _ + _).as("out_sum"),
        aggregate(out, lit(0L),
          (acc, x) => (acc * lit(257L) + x) % lit(1000000007L)).as("out_hash"))
  }

  /** PERCEPTUAL DIFFERENCE HASH (dHash) of a raw grayscale bitmap:
    * nearest-neighbor sample the image onto a 9×8 grid (sy = ⌊y·h/8⌋,
    * sx = ⌊x·w/9⌋ — exact integer arithmetic, any input size ≥ 9×8),
    * then one bit per horizontal neighbor pair: bit(y,x) = 1 iff
    * g(y,x) < g(y,x+1). The 64 bits pack MSB-first into TWO
    * non-negative 32-bit halves (`hi` = bits 63..32, `lo` = 31..0) so
    * every downstream shift/divide/popcount is sign-free on both the
    * engine and the oracle. Gradient-sign bits survive brightness and
    * scale changes, which is why dHash is the standard cheap
    * image-near-dup signature.
    *
    * Declarative throughout: one staged 72-sample array column per
    * row (interpreted HOF lambdas share no subexpressions — the
    * samples are computed ONCE, the two packing folds only index it),
    * hex-pair byte extraction, fold for the MSB-first pack. */
  def dhash(media: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", wCol: String = "width",
      hCol: String = "height"): DataFrame = {
    // the payload's hex rides as its OWN staged column (the m1
    // discipline): a sample read is one substr on an attribute.
    // Embedding hex(media) inside the 72-sample lambda re-hexed the
    // whole payload PER SAMPLE (interpreted lambdas share no
    // subexpressions) — the r9 bench caught m6 spending 370 s here
    val pre = media
      .where(col(wCol).cast("int") >= 9 && col(hCol).cast("int") >= 8)
      .select(col(idCol), col(wCol).cast("int").as("__g_w"),
        col(hCol).cast("int").as("__g_h"),
        hex(col(mediaCol)).as("__g_hx"))
    val w = col("__g_w")
    val h = col("__g_h")
    def b(i0: Column): Column = // 0-based byte of the bitmap
      conv(col("__g_hx").substr(i0 * 2 + 1, lit(2)), 16, 10).cast("long")
    // 9 cols × 8 rows of samples, row-major: sample k = (y=k/9, x=k%9)
    val px = transform(sequence(lit(0), lit(71)), k =>
      b(((k / 9).cast("int") * h / 8).cast("int") * w +
        ((k % 9).cast("int") * w / 9).cast("int")))
    val sampled = pre.select(col(idCol), px.as("__g_px"))
    // bit i (y=i/8, x=i%8) compares samples y*9+x and y*9+x+1
    def bit(i: Column): Column = {
      val base = (i / 8).cast("int") * 9 + (i % 8).cast("int")
      when(element_at(col("__g_px"), base + 1) <
        element_at(col("__g_px"), base + 2), lit(1L)).otherwise(lit(0L))
    }
    def pack(msb: Int, lsb: Int): Column =
      aggregate(sequence(lit(msb.toLong), lit(lsb.toLong), lit(-1L)),
        lit(0L), (acc, i) => acc * 2 + bit(i))
    sampled.select(col(idCol), pack(63, 32).as("hi"), pack(31, 0).as("lo"))
  }

  /** dHash NEAR-DUPLICATE pairs — the multimodal twin of the MinHash
    * banding discipline (d2): split each 64-bit hash into four 16-bit
    * bands; candidates are band-equal pairs (a pure equi-join — the
    * only shuffle key is (band_idx, band_val)); verify is an exact
    * popcount on the candidate set only. Pigeonhole gives the recall
    * guarantee: Hamming distance ≤ 3 across 4 bands forces at least
    * one untouched band, so no pair within `maxHamming` ≤ 3 is missed.
    *
    * Scale ladder (same tradeoff as d2's `minhashBandsFor`): 16-bit
    * bands hold the per-(band, value) bucket near n/2^16 rows under a
    * uniform hash — fine to ~10^6 images; past that, fewer/wider bands
    * (2×32 ⇒ guarantee ≤ 1) or a second banding level keep the
    * candidate join linear. Structured media makes band skew REAL
    * (flat images all hash to 0), so an in-plan `assert_true` budget
    * fails LOUDLY when any bucket exceeds `maxBucket` instead of
    * letting one hub turn the join quadratic. */
  def dhashNearDup(media: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 1 << 14, idCol: String = "doc_id",
      mediaCol: String = "media", wCol: String = "width",
      hCol: String = "height"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit banding only guarantees Hamming <= 3 (got $maxHamming)")
    // MATERIALIZE the signatures before the banding self-join: the
    // join consumes the dhash relation on four subtree copies (a/b
    // sides + both budget aggregates), and without a boundary each
    // copy re-evaluates the 72-sample interpreted expression — worse,
    // column pruning lets CollapseProject fold the staged sample
    // array back into the 64-bit pack folds on the pruned copies,
    // turning O(samples) per row into O(bits × samples) payload
    // re-reads (the r9 bench caught m6 at 370 s this way; 17 bytes ×
    // n rows of checkpointed signatures is nothing at any scale —
    // materializing the sketch is the same move every index build
    // makes)
    val hashes = org.apache.spark.sql.graftshim.SparkShims
      .localCheckpointKeepingLayout(dhash(media, idCol, mediaCol, wCol, hCol))
    val bands = hashes.select(col(idCol).as("id"), col("hi"), col("lo"),
      posexplode(array(
        shiftright(col("hi"), 16), col("hi").bitwiseAND(lit(65535L)),
        shiftright(col("lo"), 16), col("lo").bitwiseAND(lit(65535L))))
        .as(Seq("band_idx", "band_val")))
    val budget = bands.groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("__g_bucket_n"))
      .select(col("band_idx"), col("band_val"),
        assert_true(col("__g_bucket_n") <= maxBucket,
          concat(lit("dhash band bucket over budget: "),
            col("__g_bucket_n"), lit(s" > $maxBucket"))).as("__g_guard"))
    val guarded = bands.join(budget, Seq("band_idx", "band_val"))
      .where(col("__g_guard").isNull)
    val a = guarded.select(col("band_idx"), col("band_val"),
      col("id").as("a_id"), col("hi").as("a_hi"), col("lo").as("a_lo"))
    val bb = guarded.select(col("band_idx"), col("band_val"),
      col("id").as("b_id"), col("hi").as("b_hi"), col("lo").as("b_lo"))
    val cand = a.join(bb, Seq("band_idx", "band_val"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_hi", "a_lo", "b_hi", "b_lo")
      .distinct()
    cand
      .select(col("a_id"), col("b_id"),
        (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("a_lo").bitwiseXOR(col("b_lo"))))
          .cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  def patchFeatures(media: DataFrame, idCol: String = "doc_id",
      mediaCol: String = "media", patchBytes: Int = 64): DataFrame = {
    require(patchBytes >= 1)
    val len = octet_length(col(mediaCol))
    val nPatches = ((len + lit(patchBytes - 1)) / lit(patchBytes)).cast("int")
    val patched = media
      // guard: sequence(0, -1) would DESCEND for an empty payload
      .where(len > 0)
      .select(col(idCol), col(mediaCol),
        posexplode(sequence(lit(0), nPatches - 1)).as(Seq("patch_idx", "__p")))
      .select(col(idCol), col("patch_idx"),
        col(mediaCol).substr(col("patch_idx") * patchBytes + 1,
          lit(patchBytes)).as("__patch"))
    val hx = hex(col("__patch"))
    val bytes = transform(sequence(lit(1), octet_length(col("__patch"))),
      i => conv(hx.substr(i * 2 - 1, lit(2)), 16, 10).cast("long"))
    patched.select(col(idCol), col("patch_idx"),
      octet_length(col("__patch")).as("patch_len"),
      aggregate(bytes, lit(0L), _ + _).as("patch_sum"),
      array_max(bytes).as("patch_max"),
      aggregate(bytes, lit(0L),
        (acc, b) => (acc * lit(257L) + b) % lit(1000000007L)).as("patch_hash"))
  }
}
