package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * IMAGE decode is REAL ([[decodeImages]] — `javax.imageio` header parse,
  * in the JDK), as are AUDIO metadata ([[decodeAudio]], RIFF chunk walk),
  * AUDIO PCM content fingerprinting ([[audioFingerprints]], round 15),
  * and VIDEO container metadata ([[decodeVideos]], ISO-BMFF box walk).
  * Only compressed-codec sample decode remains stubbed (no codec
  * libraries in this environment): `decodeStub` derives deterministic fake dimensions
  * from the md5 of the bytes, so the schema, partition-preserving
  * `mapPartitions` execution path, and batch shape are real and testable,
  * and a SQL oracle can replay the fake exactly. Swapping the stub body for
  * a real JNI/lib decode changes nothing about the plan — [[decodeImages]]
  * is that swap, performed for images.
  *
  * Scale notes: both decode paths are narrow per-partition maps (no
  * shuffle, no driver collect); the blob column rides along only as far as
  * the decode and is dropped immediately after, so downstream stages
  * shuffle metadata, not media bytes.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_sha", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  private val formats = Array("jpeg", "png", "webp")

  private def hex(bytes: Array[Byte]): String = bytes.map("%02x".format(_)).mkString

  /** The deterministic fake decode — REPLACE THIS BODY for real media:
    * width/height/format are functions of md5(blob) so every engine agrees.
    */
  def stubDecode(id: Long, blob: Array[Byte]): Row = {
    val md5h = hex(MessageDigest.getInstance("MD5").digest(blob))
    val sha = hex(MessageDigest.getInstance("SHA-256").digest(blob))
    val w = 64 + Integer.parseInt(md5h.substring(0, 2), 16) % 192 * 4
    val h = 64 + Integer.parseInt(md5h.substring(2, 4), 16) % 192 * 4
    val fmt = formats(Integer.parseInt(md5h.substring(4, 6), 16) % 3)
    Row(id, blob.length, sha, w, h, fmt)
  }

  /** Imperative decode path: `mapPartitions` over (id, blob) rows — the
    * Scala analogue of a Pandas-UDF `mapInPandas` decode stage. Partition
    * count and ordering are preserved; one `MessageDigest` pair per row keeps
    * the stub allocation-light (real decoders would amortize codec init per
    * partition here, which is the point of mapPartitions over a per-row UDF).
    */
  def decodeStub(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val src = df.select(col(idCol).cast(LongType), col(blobCol).cast(BinaryType))
    src.mapPartitions { rows =>
      rows.map(r => stubDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(RowEncoder.encoderFor(metaSchema))
  }

  /** Declarative twin of [[decodeStub]] — same metadata from pure codegen'd
    * Column math (md5/sha2/conv), for when the "decode" is cheap enough to
    * inline. Keeping both proves the stub and the plan agree.
    */
  def metaColumns(id: Column, blob: Column): Seq[Column] = {
    val md5h = md5(blob)
    val hx = (from: Int, len: Int) => conv(substring(md5h, from, len), 16, 10).cast("int")
    Seq(
      id.cast(LongType).as("doc_id"),
      length(blob).cast(IntegerType).as("n_bytes"),
      sha2(blob, 256).as("content_sha"),
      (lit(64) + hx(1, 2) % 192 * 4).as("width"),
      (lit(64) + hx(3, 2) % 192 * 4).as("height"),
      element_at(lit(formats), (hx(5, 2) % 3) + 1).as("format"))
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_sha", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** JPEG dimensions from a raw SOF marker scan (public JPEG/JFIF layout:
    * SOI `FFD8`, then `FF mk [len:2] payload` segments; any SOF marker
    * `C0–CF` except DHT `C4` / JPG `C8` / DAC `CC` carries
    * `[precision:1][height:2][width:2]` big-endian at the payload head).
    * This is the cheapest possible metadata path — a linear scan over the
    * segment table, typically < 1 KB of the blob, with ZERO reader/stream
    * allocation — which is what you want per-row on a 100 TB media pass;
    * [[decodeImageMeta]] uses it as the JPEG fast path before falling back
    * to the `ImageIO` reader machinery. Returns None on anything malformed
    * (no SOF before SOS/EOI, truncated segment, zero dimension).
    */
  def jpegSofDimensions(blob: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = blob(i) & 0xff
    if (blob.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
    var i = 2
    while (i + 1 < blob.length) {
      if (u8(i) != 0xFF) return None
      var j = i + 1 // skip fill bytes: a marker may be padded with extra FFs
      while (j < blob.length && u8(j) == 0xFF) j += 1
      if (j >= blob.length) return None
      val mk = u8(j)
      if (mk == 0x01 || (mk >= 0xD0 && mk <= 0xD9)) {
        if (mk == 0xD9) return None // EOI before any SOF
        i = j + 1                   // standalone marker, no length word
      } else {
        if (j + 2 >= blob.length) return None
        val len = (u8(j + 1) << 8) | u8(j + 2)
        if (len < 2) return None
        if (mk >= 0xC0 && mk <= 0xCF && mk != 0xC4 && mk != 0xC8 && mk != 0xCC) {
          if (j + 7 >= blob.length) return None
          val h = (u8(j + 4) << 8) | u8(j + 5)
          val w = (u8(j + 6) << 8) | u8(j + 7)
          return if (w > 0 && h > 0) Some((w, h)) else None
        }
        if (mk == 0xDA) return None // entropy-coded data begins: no SOF seen
        i = j + 1 + len
      }
    }
    None
  }

  /** REAL image metadata decode: JPEG rides [[jpegSofDimensions]] (a raw
    * marker scan, no reader allocation); everything else goes through
    * `javax.imageio` (ships in the JDK — no new dependency), whose HEADER
    * reader (`ImageReader.getWidth(0)` parses the PNG IHDR etc., it does
    * NOT decompress pixels) keeps the per-row cost at a few hundred bytes
    * of parsing regardless of image size — the right scale shape for a
    * metadata pass over 100 TB of media. Bytes no path recognizes — AND
    * bytes a reader claims but chokes on (valid magic, truncated/garbled
    * header: inevitable in a crawl corpus) — degrade to `decoded = false`
    * with null dimensions rather than failing the partition: one corrupt
    * blob must never kill a 100 TB metadata pass. (A JPEG whose SOF scan
    * fails still falls to ImageIO before degrading, so the fast path can
    * only add coverage, never subtract it.)
    */
  def decodeImageMeta(id: Long, blob: Array[Byte]): Row = {
    val sha = hex(MessageDigest.getInstance("SHA-256").digest(blob))
    val sof = jpegSofDimensions(blob)
    if (sof.isDefined)
      return Row(id, blob.length, sha, sof.get._1, sof.get._2, "jpeg", true)
    val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(in)
          Row(id, blob.length, sha, r.getWidth(0), r.getHeight(0),
            r.getFormatName.toLowerCase(java.util.Locale.ROOT), true)
        } catch {
          case scala.util.control.NonFatal(_) =>
            Row(id, blob.length, sha, null, null, null, false)
        } finally r.dispose()
      } else Row(id, blob.length, sha, null, null, null, false)
    } finally if (in != null) in.close()
  }

  /** [[decodeImageMeta]] over a frame: same partition-preserving
    * `mapPartitions` shape as [[decodeStub]] (blob dropped right after the
    * decode, so downstream shuffles carry metadata only).
    */
  def decodeImages(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val src = df.select(col(idCol).cast(LongType), col(blobCol).cast(BinaryType))
    src.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams; no temp-file cache
      rows.map(r => decodeImageMeta(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(RowEncoder.encoderFor(decodedSchema))
  }

  /** Deterministic grayscale PNG — FIXTURE encoder for gates/specs: real
    * bytes through the real `ImageIO` PNG writer, dimensions and pixels a
    * pure function of the arguments, so a decode gate can assert the
    * round-trip (`decodeImages` must recover exactly these dimensions) with
    * an oracle that knows only the dimension formula, never the bytes.
    */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, "png dims must be positive")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.getRaster.setSample(x, y, 0, (((seed + 31L * x + 17L * y) % 256L) + 256L) % 256L)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic grayscale JPEG — the JPEG sibling of [[syntheticPng]]:
    * real bytes through the JDK's `ImageIO` JPEG writer (SOI/JFIF/SOF0
    * layout), so [[jpegSofDimensions]] and the decode gate exercise a real
    * marker table. JPEG is lossy in PIXELS, never in the SOF dimensions,
    * so the dimension round-trip is exact.
    */
  def syntheticJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg dims must be positive")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.getRaster.setSample(x, y, 0, (((seed + 31L * x + 17L * y) % 256L) + 256L) % 256L)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  /** Fixture frame: one synthetic image per input id with dimensions derived
    * from the id (`width = 1 + id % 37`, `height = 1 + id % 23`) — executed
    * distributed (mapPartitions; the encoder init amortizes per partition),
    * never on the driver. Odd ids encode as JPEG, even as PNG, so a decode
    * gate exercises BOTH real header layouts from one generator.
    */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    df.select(col(idCol).cast(LongType)).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = (1 + (id % 37).toInt, 1 + (id % 23).toInt)
        Row(id, if (id % 2 != 0) syntheticJpeg(w, h, id) else syntheticPng(w, h, id))
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** PNG-only fixture frame (kept for spec call sites; [[syntheticImages]]
    * is the mixed-format generator the gate uses).
    */
  def syntheticPngs(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    df.select(col(idCol).cast(LongType)).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticPng(1 + (id % 37).toInt, 1 + (id % 23).toInt, id))
      }
    }(RowEncoder.encoderFor(schema))
  }

  val phashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("ahash_lo", LongType, nullable = true),
    StructField("ahash_hi", LongType, nullable = true),
    StructField("dhash_lo", LongType, nullable = true),
    StructField("dhash_hi", LongType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** PERCEPTUAL image hashes from a REAL pixel decode — the image-dedup
    * primitive (aHash: 8×8 nearest-sample grid, bit = cell above the grid
    * mean; dHash: 9×8 grid, bit = horizontal gradient sign). Both are
    * invariant under uniform brightness shift — `(g+c)·64 > S+64c ⟺ g·64 >
    * S`, gradients unchanged — which is the property that makes them
    * near-dup detectors rather than byte hashes (re-encoded or
    * re-brightened copies collide; `content_sha` does not). All-integer
    * math: the sample grid is `x_i = ⌊(2i+1)·w/16⌋` (dHash columns /18) and
    * the mean test multiplies through by 64, so a SQL oracle replays every
    * bit exactly — no floating point anywhere.
    *
    * Each 64-bit hash ships as two 32-bit halves in BIGINTs (`*_lo` bits
    * 0–31, `*_hi` bits 32–63): ANSI engines overflow on `1 << 63` sums, and
    * the split is what the banded pair join wants anyway. Band 0 of the
    * raster is hashed (the fixtures are grayscale; a production color path
    * would luma-convert first — same plan, one more per-pixel multiply).
    * Undecodable blobs degrade to `decoded = false`, never fail.
    */
  def perceptualHashRow(id: Long, blob: Array[Byte]): Row = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      if (img == null) return Row(id, null, null, null, null, false)
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      def g(x: Int, y: Int): Int = raster.getSample(x, y, 0)
      val ax = Array.tabulate(8)(i => (2 * i + 1) * w / 16)
      val ay = Array.tabulate(8)(j => (2 * j + 1) * h / 16)
      val ag = Array.tabulate(64)(k => g(ax(k % 8), ay(k / 8)))
      val s = ag.sum
      val abits = ag.map(v => v * 64 > s)
      val dx = Array.tabulate(9)(i => (2 * i + 1) * w / 18)
      val dbits = Array.tabulate(64)(k => g(dx(k % 8 + 1), ay(k / 8)) > g(dx(k % 8), ay(k / 8)))
      def pack(bits: Array[Boolean], from: Int): Long =
        (0 until 32).foldLeft(0L)((acc, k) => if (bits(from + k)) acc | (1L << k) else acc)
      Row(id, pack(abits, 0), pack(abits, 32), pack(dbits, 0), pack(dbits, 32), true)
    } catch {
      case scala.util.control.NonFatal(_) => Row(id, null, null, null, null, false)
    }
  }

  private val patchSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("px", IntegerType, nullable = true),
    StructField("py", IntegerType, nullable = true),
    StructField("x0", IntegerType, nullable = true),
    StructField("y0", IntegerType, nullable = true),
    StructField("pw", IntegerType, nullable = true),
    StructField("ph", IntegerType, nullable = true),
    StructField("pix_sum", LongType, nullable = true),
    StructField("n_pix", LongType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** ViT-style PATCH EXTRACTION from a REAL pixel decode: the image grid
    * is cut into `patch`×`patch` tiles (edge tiles truncated), and each
    * tile reports its exact INTEGER pixel sum and size — the tokenizer
    * step of a vision pipeline, with the heavy tensor handoff represented
    * by the loss-free integer statistics a SQL oracle can replay (the
    * production path would emit the raw tile tensor through the same
    * row shape; the grid arithmetic, truncation, ordering and the decode
    * channel are what the engine owns and what the gate pins).
    *
    * One `flatMap` over the blob frame — per-image fan-out is the tile
    * count, no shuffle introduced; undecodable blobs degrade to a single
    * `decoded = false` row so corpus membership is preserved (the
    * [[decodeImages]] channel discipline).
    */
  def imagePatches(df: DataFrame, idCol: String, blobCol: String, patch: Int): DataFrame = {
    require(patch >= 1, "patch must be positive")
    val src = df.select(col(idCol).cast(LongType), col(blobCol).cast(BinaryType))
    src.flatMap { r =>
      javax.imageio.ImageIO.setUseCache(false)
      val id = r.getLong(0)
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        if (img == null) Seq(Row(id, null, null, null, null, null, null, null, null, false))
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          for {
            py <- 0 until (h + patch - 1) / patch
            px <- 0 until (w + patch - 1) / patch
          } yield {
            val x0 = px * patch; val y0 = py * patch
            val pw = math.min(patch, w - x0); val ph = math.min(patch, h - y0)
            var s = 0L
            var y = y0
            while (y < y0 + ph) {
              var x = x0
              while (x < x0 + pw) { s += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            Row(id, px, py, x0, y0, pw, ph, s, pw.toLong * ph, true)
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          Seq(Row(id, null, null, null, null, null, null, null, null, false))
      }
    }(RowEncoder.encoderFor(patchSchema))
  }

  /** [[perceptualHashRow]] over a frame — same partition-preserving
    * `mapPartitions` shape as [[decodeImages]], blob dropped at the decode.
    */
  def perceptualHashes(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val src = df.select(col(idCol).cast(LongType), col(blobCol).cast(BinaryType))
    src.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(r => perceptualHashRow(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(RowEncoder.encoderFor(phashSchema))
  }

  /** Near-duplicate IMAGE pairs by aHash Hamming distance, banded: the four
    * 16-bit words of the hash are LSH bands — two hashes within Hamming
    * `maxHamming ≤ 3` MUST agree on at least one word (pigeonhole), so the
    * word-keyed equi-join finds every such pair with zero false negatives,
    * and `bit_count(xor)` verifies the exact distance. The SimHash banding
    * argument, applied to images.
    *
    * Scale shape: four word-keyed self-join branches over the hash frame
    * (each a keyed shuffle; hot words — e.g. the all-zero word of flat
    * images — are capped loudly at `maxBucket` like every banded join
    * here), distinct-merged, then the O(1)-per-pair popcount verify.
    */
  def imageNearDupPairs(
      hashes: DataFrame,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    hammingBandedPairs(hashes.where(col("decoded")), idCol, "ahash_lo", "ahash_hi",
      maxHamming, maxBucket)

  /** The shared banded-Hamming join behind [[imageNearDupPairs]] and
    * [[audioNearDupPairs]]: a split 64-bit hash (`loCol` bits 0–31,
    * `hiCol` 32–63) keyed by its four 16-bit words.
    */
  private def hammingBandedPairs(
      hashes: DataFrame,
      idCol: String,
      loCol: String,
      hiCol: String,
      maxHamming: Int,
      maxBucket: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band pigeonhole guarantee only holds for maxHamming <= 3")
    val h = hashes.select(col(idCol), col(loCol).as("_lo"), col(hiCol).as("_hi"))
    val words = h.select(col(idCol), explode(array(
      struct(lit(0).as("band"), (col("_lo") % 65536).as("w")),
      struct(lit(1).as("band"), (col("_lo") / 65536).cast("long").as("w")),
      struct(lit(2).as("band"), (col("_hi") % 65536).as("w")),
      struct(lit(3).as("band"), (col("_hi") / 65536).cast("long").as("w")))).as("bw"))
      .select(col(idCol), col("bw.band").as("band"), col("bw.w").as("w"))
    val ok = words.groupBy("band", "w").agg(count(lit(1)).as("_n"))
      .where(col("_n") <= maxBucket).select("band", "w")
    val kept = words.join(ok, Seq("band", "w"))
    val cand = kept.as("a").join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.w") === col("b.w") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b")).distinct()
    val ha = h.select(col(idCol).as("id_a"), col("_lo").as("_alo"), col("_hi").as("_ahi"))
    val hb = h.select(col(idCol).as("id_b"), col("_lo").as("_blo"), col("_hi").as("_bhi"))
    cand.join(ha, "id_a").join(hb, "id_b")
      .withColumn("hamming",
        bit_count(col("_alo").bitwiseXOR(col("_blo"))) +
          bit_count(col("_ahi").bitwiseXOR(col("_bhi"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Frame sampling over a "video" blob: every `step`-th frame index of
    * `n_frames = floor(n_bytes / frameBytes)` frames, exploded to one row per
    * sampled frame. The real pipeline would then `mapPartitions`-decode each
    * (blob, frame_idx) pair; here the index stream itself is the deliverable.
    */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String, frameBytes: Int, step: Int): DataFrame = {
    val nFrames = floor(length(col(blobCol)) / frameBytes).cast(IntegerType)
    df.select(col(idCol), nFrames.as("n_frames"))
      .where(col("n_frames") >= 1)
      .select(col(idCol), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
  }

  // ------------------------------------------------------------------ audio

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_sha", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** WAV metadata from a raw RIFF chunk walk (public RIFF/WAVE layout:
    * `RIFF <size:4 LE> WAVE`, then `<ckId:4> <ckSize:4 LE> <payload>` chunks
    * with odd-sized payloads padded to even; `fmt ` carries
    * `[audioFormat:2][channels:2][sampleRate:4][byteRate:4][blockAlign:2]
    * [bitsPerSample:2]` LE, `data`'s size over blockAlign is the frame
    * count). Same scale shape as [[jpegSofDimensions]]: a linear scan over
    * the chunk table — tens of bytes, zero stream/codec allocation — never
    * a sample decode. Returns None on anything malformed (bad magic,
    * truncated chunk, PCM fields that disagree, zero-channel/rate).
    */
  def wavRiffMeta(blob: Array[Byte]): Option[(Int, Int, Int, Long)] =
    wavRiffFull(blob).map { case (rate, ch, _, bits, _, nSamples) =>
      (rate, ch, bits, nSamples)
    }

  /** The full parse behind [[wavRiffMeta]], additionally exposing the data
    * chunk's byte offset and block align — what the PCM-reading
    * fingerprint path needs. Returns (rate, channels, blockAlign, bits,
    * dataOffset, nSamples).
    */
  private def wavRiffFull(blob: Array[Byte]): Option[(Int, Int, Int, Int, Int, Long)] = {
    def u8(i: Int): Int = blob(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = (u16(i) | (u16(i + 2).toLong << 16)) & 0xffffffffL
    def tag(i: Int): String = new String(blob, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (blob.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, blockAlign, bits
    var data: Option[(Int, Long)] = None // offset, size
    while (i + 8 <= blob.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i)
      val sz = u32(i + 4)
      if (i + 8 + sz > blob.length) return None
      if (id == "fmt ") {
        if (sz < 16) return None
        val channels = u16(i + 10)
        val rate = u32(i + 12)
        val blockAlign = u16(i + 20)
        val bits = u16(i + 22)
        if (channels == 0 || rate == 0 || rate > Int.MaxValue || bits == 0 ||
            blockAlign != channels * ((bits + 7) / 8)) return None
        fmt = Some((channels, rate.toInt, blockAlign, bits))
      } else if (id == "data") data = Some((i + 8, sz))
      i += 8 + sz.toInt + (sz.toInt & 1) // odd payloads pad to even
    }
    for ((channels, rate, blockAlign, bits) <- fmt; (off, dsz) <- data)
      yield (rate, channels, blockAlign, bits, off, dsz / blockAlign)
  }

  val audioFpSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("fp_lo", LongType, nullable = true),
    StructField("fp_hi", LongType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** Audio fingerprint grid: 16 time segments × 4 lag scales = 64 bits. */
  val AudioFpSegments = 16
  val AudioFpLags: Array[Int] = Array(1, 2, 4, 8)

  /** CONTENT fingerprint of a PCM WAV — the audio analogue of
    * [[perceptualHashRow]] and the missing half of the multimodal near-dup
    * symmetry (images had content hashing; audio had metadata only). A
    * chromaprint-style integer time×scale energy map:
    *  - REAL PCM decode (8-bit unsigned / 16-bit signed LE) of the data
    *    chunk, channels mono-mixed by integer SUM (no rounding);
    *  - the sample stream is cut into [[AudioFpSegments]] equal time
    *    segments (`seg(f) = f·16 / n`, integer division — the aHash grid
    *    rule in time), and per segment the energy at each
    *    [[AudioFpLags]] lag L is `Σ |m(f+L) − m(f)|` over pairs that stay
    *    inside the segment — lag differences are integer comb filters, so
    *    the four lags read four frequency scales without an FFT;
    *  - bit(t, b) = cell energy ×64 > total energy — the same
    *    multiply-through trick as aHash's mean test, which makes the
    *    fingerprint invariant under uniform GAIN (every |Δ| scales by the
    *    same factor) the way aHash is invariant under brightness shift.
    * All-integer math end to end, so a SQL oracle replays all 64 bits
    * exactly. Ships as two 32-bit halves in BIGINTs (`fp_lo` bits 0–31,
    * `fp_hi` 32–63) — the shape the banded Hamming join wants. Silence
    * (or n_samples too short for any lag pair) fingerprints to 0.
    * Undecodable or non-8/16-bit-PCM blobs degrade to `decoded = false`.
    */
  def audioFingerprintRow(id: Long, blob: Array[Byte]): Row = {
    wavRiffFull(blob) match {
      case Some((_, channels, blockAlign, bits, off, nSamples))
          if (bits == 8 || bits == 16) && nSamples <= Int.MaxValue =>
        val n = nSamples.toInt
        // Mono mix: integer sum across channels, per frame.
        val m = new Array[Long](n)
        var f = 0
        while (f < n) {
          var s = 0L
          var c = 0
          while (c < channels) {
            if (bits == 8) s += (blob(off + f * blockAlign + c) & 0xff) - 128
            else {
              val base = off + f * blockAlign + 2 * c
              val v = (blob(base) & 0xff) | ((blob(base + 1) & 0xff) << 8)
              s += (if (v >= 32768) v - 65536 else v)
            }
            c += 1
          }
          m(f) = s
          f += 1
        }
        val nSeg = AudioFpSegments
        val nLag = AudioFpLags.length
        val e = new Array[Long](nSeg * nLag)
        var total = 0L
        var b = 0
        while (b < nLag) {
          val lag = AudioFpLags(b)
          var i = 0
          while (i + lag < n) {
            val t = i.toLong * nSeg / n
            if ((i + lag).toLong * nSeg / n == t) {
              val d = math.abs(m(i + lag) - m(i))
              e(t.toInt * nLag + b) += d
              total += d
            }
            i += 1
          }
          b += 1
        }
        var lo = 0L
        var hi = 0L
        var k = 0
        while (k < nSeg * nLag) {
          if (e(k) * 64 > total) {
            if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
          }
          k += 1
        }
        Row(id, lo, hi, nSamples, true)
      case _ => Row(id, null, null, null, false)
    }
  }

  /** [[audioFingerprintRow]] over a frame — same partition-preserving
    * `mapPartitions` shape as [[perceptualHashes]], blob dropped at the
    * decode so downstream near-dup joins shuffle 24-byte rows, not media.
    */
  def audioFingerprints(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val src = df.select(col(idCol).cast(LongType), col(blobCol).cast(BinaryType))
    src.mapPartitions { rows =>
      rows.map(r => audioFingerprintRow(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(RowEncoder.encoderFor(audioFpSchema))
  }

  /** Near-duplicate AUDIO pairs by fingerprint Hamming distance — the
    * [[imageNearDupPairs]] machinery applied to [[audioFingerprints]]
    * (same 4×16-bit-band pigeonhole, same capped-bucket economics).
    */
  def audioNearDupPairs(
      fps: DataFrame,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    hammingBandedPairs(fps.where(col("decoded")), idCol, "fp_lo", "fp_hi",
      maxHamming, maxBucket)

  /** [[wavRiffMeta]] over a frame — the audio sibling of [[decodeImages]]:
    * partition-preserving `mapPartitions`, blob dropped right after the
    * parse, malformed bytes degrade to `decoded = false` with null fields
    * (one corrupt blob must never kill a 100 TB metadata pass). This
    * RETIRES the stub for the audio-metadata surface: the parse is real;
    * only sample DECODE (codec work) remains out of scope in this
    * environment.
    */
  def decodeAudio(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val src = df.select(col(idCol).cast(LongType), col(blobCol).cast(BinaryType))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val blob = r.getAs[Array[Byte]](1)
        val sha = hex(MessageDigest.getInstance("SHA-256").digest(blob))
        wavRiffMeta(blob) match {
          case Some((rate, channels, bits, nSamples)) =>
            Row(id, blob.length, sha, rate, channels, bits, nSamples, true)
          case None => Row(id, blob.length, sha, null, null, null, null, false)
        }
      }
    }(RowEncoder.encoderFor(audioSchema))
  }

  /** Deterministic PCM WAV — FIXTURE encoder for gates/specs, the audio
    * sibling of [[syntheticPng]]: a real RIFF/WAVE byte stream (fmt + data
    * chunks, LE fields, deterministic seed-derived samples) whose header
    * fields are pure functions of the arguments, so a decode gate can
    * assert the round-trip with an oracle that knows only the field
    * formulas, never the bytes.
    */
  def syntheticWav(sampleRate: Int, channels: Int, bits: Int, nSamples: Int,
      seed: Long): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamples >= 0, "invalid wav params")
    require(bits == 8 || bits == 16, "fixture covers 8/16-bit PCM")
    val blockAlign = channels * (bits / 8)
    val dataSize = nSamples * blockAlign
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < dataSize) {
      out.put((((seed + 31L * i) % 256L + 256L) % 256L).toByte)
      i += 1
    }
    out.array()
  }

  /** Fixture frame: one synthetic WAV per input id with header fields
    * derived from the id — executed distributed like [[syntheticImages]].
    * Field formulas (the oracle's contract):
    * `sample_rate = 8000 * (1 + id % 5)`, `channels = 1 + id % 2`,
    * `bits = 8 * (1 + (id / 2) % 2)`, `n_samples = 1 + id % 400`.
    */
  def syntheticWavs(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    df.select(col(idCol).cast(LongType)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticWav(
          8000 * (1 + (id % 5).toInt), 1 + (id % 2).toInt,
          8 * (1 + ((id / 2) % 2).toInt), 1 + (id % 400).toInt, id))
      }
    }(RowEncoder.encoderFor(schema))
  }

  // ------------------------------------------------------------------ video

  val videoSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_sha", StringType, nullable = false),
    StructField("brand", StringType, nullable = true),
    StructField("timescale", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** MP4 container metadata from a raw ISO-BMFF box walk (public ISO/IEC
    * 14496-12 layout: `[size:4 BE][type:4 ASCII][payload]` boxes, size
    * including the 8-byte header, `size==1` → 64-bit largesize follows,
    * `size==0` → box runs to EOF; `ftyp` carries the major brand, `moov`
    * contains `mvhd` (movie timescale + duration; version 0 = 32-bit
    * fields, version 1 = 64-bit) and one `trak`→`tkhd` per track with
    * 16.16 fixed-point width/height). Same scale discipline as
    * [[wavRiffMeta]]/[[jpegSofDimensions]]: a linear walk over the box
    * table reading tens of bytes — never a sample/codec decode, which is
    * exactly what a 100 TB metadata pass can afford. Video dimensions are
    * the FIRST track with nonzero width×height (audio tracks carry 0×0).
    * Returns None on anything malformed (bad magic, truncated box,
    * missing mvhd, zero timescale).
    */
  def mp4Meta(blob: Array[Byte]): Option[(String, Long, Long, Option[Int], Option[Int], Int)] = {
    def u16(i: Int): Int = ((blob(i) & 0xff) << 8) | (blob(i + 1) & 0xff)
    def u32(i: Int): Long = ((u16(i).toLong << 16) | u16(i + 2)) & 0xffffffffL
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def tag(i: Int): String = new String(blob, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // Walk one box level in [from, to); `f` gets (type, payloadStart, payloadEnd).
    def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val size0 = u32(i)
        val tp = tag(i + 4)
        val (payload, end) =
          if (size0 == 1L) {
            if (i + 16 > to) return false
            val sz = u64(i + 8)
            if (sz < 16 || i + sz > to) return false
            (i + 16, i + sz.toInt)
          } else if (size0 == 0L) (i + 8, to)
          else {
            if (size0 < 8 || i + size0 > to) return false
            (i + 8, i + size0.toInt)
          }
        f(tp, payload, end)
        i = end
      }
      i == to || i >= to
    }
    if (blob.length < 8) return None
    var brand: Option[String] = None
    var timescale = 0L
    var duration = -1L
    var nTracks = 0
    var dims: Option[(Int, Int)] = None
    var bad = false
    val okTop = walk(0, blob.length) { (tp, p, e) =>
      tp match {
        case "ftyp" =>
          if (e - p >= 4) brand = Some(tag(p)) else bad = true
        case "moov" =>
          val okMoov = walk(p, e) { (ct, cp, ce) =>
            ct match {
              case "mvhd" =>
                if (ce - cp >= 4) {
                  val v = blob(cp) & 0xff
                  if (v == 0 && ce - cp >= 20) {
                    timescale = u32(cp + 12); duration = u32(cp + 16)
                  } else if (v == 1 && ce - cp >= 32) {
                    timescale = u32(cp + 20); duration = u64(cp + 24)
                  } else bad = true
                } else bad = true
              case "trak" =>
                nTracks += 1
                val okTrak = walk(cp, ce) { (tt, tpp, tpe) =>
                  if (tt == "tkhd" && tpe - tpp >= 4) {
                    val v = blob(tpp) & 0xff
                    // v0 tkhd payload: 4 ver/flags + 4+4 times + 4 id +
                    // 4 res + 4 dur + 8 res + 2+2+2+2 + 36 matrix = 76,
                    // then width/height (the last 8 of the 84-byte
                    // payload); v1 widens the three time/duration fields
                    // by 4 each → offset 88 of a 96-byte payload.
                    val off = if (v == 1) tpp + 88 else tpp + 76
                    if (tpe - off >= 8) {
                      val wpx = (u32(off) >> 16).toInt
                      val hpx = (u32(off + 4) >> 16).toInt
                      if (dims.isEmpty && wpx > 0 && hpx > 0) dims = Some((wpx, hpx))
                    } else bad = true
                  }
                }
                if (!okTrak) bad = true
              case _ => ()
            }
          }
          if (!okMoov) bad = true
        case _ => ()
      }
    }
    if (!okTop || bad || brand.isEmpty || timescale <= 0 || duration < 0) None
    else Some((brand.get, timescale,
      Math.floorDiv(duration * 1000L, timescale),
      dims.map(_._1), dims.map(_._2), nTracks))
  }

  /** [[mp4Meta]] over a frame — the video sibling of [[decodeAudio]]:
    * partition-preserving `mapPartitions`, blob dropped right after the
    * walk, malformed bytes degrade to `decoded = false` with null fields.
    * This retires the stub for the video-METADATA surface; sample decode
    * (codec work) stays out of scope in this environment.
    */
  def decodeVideos(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val src = df.select(col(idCol).cast(LongType), col(blobCol).cast(BinaryType))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val blob = r.getAs[Array[Byte]](1)
        val sha = hex(MessageDigest.getInstance("SHA-256").digest(blob))
        mp4Meta(blob) match {
          case Some((brand, ts, durMs, wpx, hpx, n)) =>
            Row(id, blob.length, sha, brand, ts, durMs,
              wpx.orNull, hpx.orNull, n, true)
          case None => Row(id, blob.length, sha, null, null, null, null, null, null, false)
        }
      }
    }(RowEncoder.encoderFor(videoSchema))
  }

  /** Deterministic minimal MP4 — FIXTURE encoder (real ISO-BMFF byte
    * stream: ftyp + moov(mvhd + n×trak(tkhd)) + a small mdat) whose fields
    * are pure functions of the arguments, so the decode gate's oracle
    * knows only the formulas, never the bytes. Track 1 is the video track
    * (given dims); an optional second track carries 0×0 dims like a real
    * audio tkhd.
    */
  def syntheticMp4(brand: String, timescale: Int, durationS: Int,
      widthPx: Int, heightPx: Int, nTracks: Int, seed: Long): Array[Byte] = {
    require(brand.length == 4 && timescale > 0 && durationS >= 0 && nTracks >= 1,
      "invalid mp4 params")
    val bb = java.nio.ByteBuffer.allocate(4096).order(java.nio.ByteOrder.BIG_ENDIAN)
    def box(tp: String)(body: => Unit): Unit = {
      val at = bb.position(); bb.putInt(0); bb.put(tp.getBytes("US-ASCII"))
      body
      bb.putInt(at, bb.position() - at)
    }
    box("ftyp") { bb.put(brand.getBytes("US-ASCII")); bb.putInt(0); bb.put("isom".getBytes("US-ASCII")) }
    box("moov") {
      box("mvhd") {
        bb.putInt(0) // version 0 + flags
        bb.putInt(0).putInt(0) // ctime mtime
        bb.putInt(timescale).putInt(timescale * durationS)
        bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        bb.putLong(0) // reserved
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
        (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
        bb.putInt(nTracks + 1) // next_track_ID
      }
      (1 to nTracks).foreach { t =>
        box("trak") {
          box("tkhd") {
            bb.putInt(0x000007) // version 0, flags enabled|in-movie|in-preview
            bb.putInt(0).putInt(0) // ctime mtime
            bb.putInt(t) // track_ID
            bb.putInt(0)
            bb.putInt(timescale * durationS)
            bb.putLong(0)
            bb.putShort(0).putShort(0)
            bb.putShort(if (t == 1) 0 else 0x0100.toShort).putShort(0) // volume: audio-style on track 2
            Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
            if (t == 1) { bb.putInt(widthPx << 16).putInt(heightPx << 16) }
            else { bb.putInt(0).putInt(0) }
          }
        }
      }
    }
    box("mdat") {
      (0 until 32).foreach(i => bb.put((((seed + 17L * i) % 256L + 256L) % 256L).toByte))
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  /** Fixture frame: one synthetic MP4 per id. Field formulas (the oracle's
    * contract): `brand = id % 2 == 0 ? "isom" : "mp42"`,
    * `timescale = 600 * (1 + id % 4)`, `duration_ms = (1 + id % 120) * 1000`,
    * `width = 16 * (1 + id % 80)`, `height = 16 * (1 + id % 45)`,
    * `n_tracks = 1 + id % 2`.
    */
  def syntheticMp4s(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    df.select(col(idCol).cast(LongType)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticMp4(
          if (id % 2 == 0) "isom" else "mp42",
          600 * (1 + (id % 4).toInt), 1 + (id % 120).toInt,
          16 * (1 + (id % 80).toInt), 16 * (1 + (id % 45).toInt),
          1 + (id % 2).toInt, id))
      }
    }(RowEncoder.encoderFor(schema))
  }
}
