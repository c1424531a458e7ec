package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads as opaque
  * `BinaryType` columns with a typed metadata struct, plus decode /
  * feature-extract / frame-sample operators.
  *
  * The Spark-side plumbing — schema, partition-preserving `mapPartitions`
  * batching, deterministic output shape — is real and tested. The IMAGE
  * codec is real: payloads whose magic bytes say PNG/JPEG/GIF/BMP decode
  * through `javax.imageio` (in the JDK — no external libraries) to true
  * width × height. VIDEO METADATA is real for MP4/MOV: a pure-Scala
  * ISO BMFF `moov/trak/tkhd` + `stsz` header parse ([[mp4Decode]]) yields
  * true presentation dimensions and frame count with zero external deps.
  * AUDIO METADATA is real for WAV: a RIFF chunk walk ([[wavDecode]])
  * yields true channels/rate/bits/sample-count. Only pixel/sample-level
  * A/V decode remains STUBBED (no codec libs in this container): a
  * deterministic fake derives pseudo-dimensions from the payload bytes.
  * Swapping in a real A/V codec changes only the marked function body,
  * not the plan shape.
  *
  * Scale notes: payloads stay in executor memory one partition at a time;
  * `mapPartitions` amortizes per-batch codec setup exactly like a Pandas
  * UDF's batch loop; frame extraction is a generator (one row in, N rows
  * out) so no whole-video materialization.
  */
object Multimodal {

  /** Asset row: payload + typed metadata (the schema a 100 TB media lake
    * would carry; metadata extracted once at ingest, filterable without
    * touching bytes).
    */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType, nullable = false),
      StructField("sha256", StringType, nullable = false),
      StructField("source", StringType, nullable = true))), nullable = true)))

  /** Wrap any table with a string column into asset shape (test/demo
    * carrier: text bytes stand in for media payloads).
    */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String,
                     sourceCol: String): DataFrame =
    // Materialize the payload bytes ONCE in a separate projection, then
    // derive byte_len/sha256 from that column. Inlining `encode(text)`
    // three times is not reliably CSE'd — profiled 4x slower (the UTF-8
    // encode, not the sha256, dominated). The two selects stay one
    // codegen stage; CollapseProject keeps them separate because payload
    // is referenced three times.
    df.select(
        col(idCol).cast("long").as("asset_id"),
        encode(col(textCol), "UTF-8").as("payload"),
        col(sourceCol).as("source"))
      .select(
        col("asset_id"),
        lit("application/octet-stream").as("media_type"),
        col("payload"),
        struct(
          octet_length(col("payload")).cast("long").as("byte_len"),
          lower(sha2(col("payload"), 256)).as("sha256"),
          col("source").as("source")).as("meta"))

  case class DecodedMeta(asset_id: Long, width: Int, height: Int,
                         n_frames: Int, fingerprint: Long)

  /** Rolling polynomial hash of a byte range — the ONE fingerprint kernel
    * shared by whole-payload hashing and frame sampling (two inline copies
    * could drift and break cross-operator comparability).
    */
  def hashRange(payload: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = (h * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
    h
  }

  /** Deterministic payload fingerprint (rolling polynomial hash). */
  def payloadHash(payload: Array[Byte]): Long =
    hashRange(payload, 0, payload.length)

  /** Magic-byte sniff for the formats `javax.imageio` ships decoders for. */
  def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP):
    * true pixel dimensions, payload-hash fingerprint. None for payloads
    * that aren't images or fail to parse — callers fall back to the stub.
    */
  def imageDecode(assetId: Long, payload: Array[Byte]): Option[DecodedMeta] =
    if (!looksLikeImage(payload)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else Some(DecodedMeta(assetId, img.getWidth, img.getHeight, 1, payloadHash(payload)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** ISO BMFF (MP4/MOV) sniff: the first box is conventionally `ftyp`. */
  def looksLikeMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** REAL video METADATA decode: a pure-Scala ISO/IEC 14496-12 box-tree
    * walk (no codec library — the container header layout is public
    * spec). Per `trak`: the `tkhd` track header carries 16.16 fixed-point
    * presentation width/height, and the sample-table `stsz`/`stz2` box
    * carries the sample (frame) count. The first track with non-zero
    * dimensions is the video track. Returns None when no parseable
    * moov/trak/tkhd exists (truncated or exotic container) — callers fall
    * back to the stub. Frame PIXELS are not decoded (that genuinely needs
    * a codec); dimensions + frame count cover the metadata-filter and
    * frame-budgeting paths a curation pipeline runs before any decode.
    */
  /** Shared ISO BMFF box-tree walker for [[mp4Decode]] and
    * [[mp4VideoFeatures]].
    * NOTE: descent happens only along explicit find() paths, and every
    * box type on those paths (moov/trak/mdia/minf/stbl) is a PURE
    * container in ISO BMFF — none is a full-box like `meta`, whose
    * version/flags prefix would misparse as a child header.
    */
  private final class BmffWalk(payload: Array[Byte]) {
    def be32(o: Int): Long =
      ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def boxType(o: Int): String =
      new String(payload, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // (size, headerLen) of the box at o, or None if malformed/truncated
    def boxAt(o: Int, until: Int): Option[(Long, Int)] = {
      if (o + 8 > until) return None
      be32(o) match {
        case 0 => Some(((until - o).toLong, 8)) // box runs to end of range
        case 1 => if (o + 16 > until) None else Some((be64(o + 8), 16))
        case n => Some((n, 8))
      }
    }
    // depth-first: find direct/nested children of a given type
    def children(from: Int, until: Int): Iterator[(String, Int, Int)] =
      Iterator.unfold(from) { o =>
        if (o >= until) None
        else boxAt(o, until) match {
          case Some((size, hdr)) if size >= hdr && o + size <= until =>
            Some(((boxType(o), o + hdr, o + size.toInt), o + size.toInt))
          case _ => None // malformed size: stop walking this level
        }
      }
    def find(from: Int, until: Int, path: List[String]): Option[(Int, Int)] =
      path match {
        case Nil => Some((from, until))
        case t :: rest =>
          children(from, until).collectFirst { case (`t`, f, u) => (f, u) }
            .flatMap { case (f, u) => find(f, u, rest) }
      }
  }

  def mp4Decode(assetId: Long, payload: Array[Byte]): Option[DecodedMeta] = {
    if (!looksLikeMp4(payload)) return None
    val walk = new BmffWalk(payload)
    import walk.{be32, boxAt, children, find}
    def tkhdDims(from: Int, until: Int): Option[(Int, Int)] = {
      if (from >= until) return None
      val v = payload(from) & 0xff
      val widthOff = from + (if (v == 1) 88 else 76)
      if (widthOff + 8 > until) return None
      // 16.16 fixed point; integer part only
      val w = (be32(widthOff) >> 16).toInt
      val h = (be32(widthOff + 4) >> 16).toInt
      if (w > 0 && h > 0) Some((w, h)) else None
    }
    def sampleCount(trakFrom: Int, trakUntil: Int): Option[Int] =
      Iterator("stsz", "stz2").flatMap(b =>
        find(trakFrom, trakUntil, List("mdia", "minf", "stbl", b))).nextOption()
        .collect { case (f, u) if f + 12 <= u => be32(f + 8).toInt }
    try {
      val all = boxAt(0, payload.length).iterator
        .flatMap(_ => children(0, payload.length))
      all.collectFirst { case ("moov", mf, mu) =>
        children(mf, mu).collect { case ("trak", tf, tu) =>
          find(tf, tu, List("tkhd")).flatMap { case (f, u) => tkhdDims(f, u) }
            .map { case (w, h) =>
              DecodedMeta(assetId, w, h,
                math.max(sampleCount(tf, tu).getOrElse(1), 1),
                payloadHash(payload))
            }
        }.flatten.nextOption()
      }.flatten
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB decode for media with neither an imageio codec nor a parseable
    * BMFF header: derives deterministic pseudo-dimensions from the
    * payload — replace the body with a real A/V codec (e.g. a jcodec-
    * style library) when available. This is the LAST fallback; MP4/MOV
    * containers get real dimensions from [[mp4Decode]].
    */
  def stubDecode(assetId: Long, payload: Array[Byte]): DecodedMeta = {
    // STUB — a real implementation would decode the bitstream here.
    val h = payloadHash(payload)
    val w = 16 + (h % 1024).toInt
    val ht = 16 + ((h / 1024) % 1024).toInt
    DecodedMeta(assetId, w, ht, 1 + (payload.length / 64), h)
  }

  /** Decode operator: batched per partition (codec init once per
    * partition, like a Pandas UDF batch loop). Images decode for real
    * ([[imageDecode]]); other payloads take the deterministic stub path.
    */
  def decode(assets: DataFrame): Dataset[DecodedMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec setup goes here (ImageIO is stateless; an
        // A/V codec would init once per partition)
        it.map { case (id, bytes) =>
          val payload = Option(bytes).getOrElse(Array.emptyByteArray)
          imageDecode(id, payload)
            .orElse(mp4Decode(id, payload))
            .getOrElse(stubDecode(id, payload))
        }
      }
  }

  /** 64-bit average hash (aHash) of a decoded image: 8x8 box-averaged
    * grayscale, one bit per cell — bit set iff the cell mean clears the
    * global mean. All-integer arithmetic (luma in per-mille, threshold by
    * exact cross-multiplication so uneven cell areas never divide), so the
    * hash is bit-deterministic across JVMs. Perceptually-close images
    * land within a few bits of hamming distance — the image analog of
    * SimHash, and it reuses the same banded-LSH blocking downstream.
    */
  def averageHash(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val cellSum = Array.ofDim[Long](64)
    val cellArea = Array.ofDim[Long](64)
    var y = 0
    while (y < h) {
      val cy = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val cx = math.min(x * 8 / w, 7)
        val rgb = img.getRGB(x, y)
        val luma = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
          (rgb & 0xff) * 114).toLong
        cellSum(cy * 8 + cx) += luma
        cellArea(cy * 8 + cx) += 1
        x += 1
      }
      y += 1
    }
    val totalSum = cellSum.sum
    val totalArea = cellArea.sum
    // 128-bit unsigned compare a*b >= c*d: a 64-bit product of luma sums
    // and pixel areas wraps for images above ~48 MP, silently inverting
    // threshold bits — Math.multiplyHigh keeps the compare exact for any
    // image the JVM can hold.
    def geProd(a: Long, b: Long, c: Long, d: Long): Boolean = {
      val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
      val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
      if (hi1 != hi2) hi1 > hi2
      else java.lang.Long.compareUnsigned(lo1, lo2) >= 0
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      // cell mean >= global mean  <=>  cellSum/cellArea >= totalSum/totalArea
      if (cellArea(i) > 0 && geProd(cellSum(i), totalArea, totalSum, cellArea(i)))
        hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Deterministic 8x8 grayscale PNG heatmap of a 64-dim vector (the
    * test/demo image carrier, as [[assetsFromText]] is for bytes): each
    * dim becomes one pixel, min-max scaled to 0..255. Nearby vectors
    * render as perceptually-close images, so the image pipeline can be
    * ground-truthed against vector geometry. r=g=b keeps the decoded
    * luma exactly equal to the written gray level.
    */
  def pngFromVector(v: Array[Float]): Array[Byte] = {
    var lo = Float.MaxValue
    var hi = Float.MinValue
    v.foreach { x => if (x < lo) lo = x; if (x > hi) hi = x }
    val span = if (hi > lo) hi - lo else 1.0f
    pngFromGray(v.map(x => math.round((x - lo) / span * 255.0f)))
  }

  /** 8x8 grayscale PNG from 64 explicit gray levels (0..255). Pixel k is
    * (k%8, k/8), r=g=b — so [[averageHash]] bit k is decided by level k
    * alone: for an 8x8 image each hash cell is exactly one pixel, the
    * cell luma is `g*1000`, and bit k = (64*g_k >= Σg). That makes the
    * render→decode→hash round trip PREDICTABLE from the levels by pure
    * integer arithmetic — the hook the oracle-checked image-hash queries
    * hang on (an oracle engine with no image codec can still compute the
    * expected hash).
    */
  def pngFromGray(g: Array[Int]): Array[Byte] =
    new PngCodec().encode(grayImage(g))

  /** The raw 8x8 r=g=b render behind [[pngFromGray]] (levels → image). */
  def grayImage(g: Array[Int]): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var k = 0
    while (k < 64) {
      img.setRGB(k % 8, k / 8, g(k) << 16 | g(k) << 8 | g(k))
      k += 1
    }
    img
  }

  /** Per-partition PNG codec. `ImageIO.read`/`ImageIO.write` resolve
    * their reader/writer through a STATIC, synchronized service registry
    * and consult the (also synchronized) disk-cache settings on every
    * call — at one call per image those JVM-global locks serialize the
    * whole decode stage under many cores (multimodal_image_ahash measured
    * ~4 s at 32 cores vs 1.4 s at 4 after the data was spread — classic
    * lock-convoy inversion). Resolving the codec ONCE per partition and
    * feeding it memory-cache streams directly keeps the per-image path
    * lock-free. Bytes are identical to the ImageIO one-shot path: the
    * convenience methods delegate to exactly this reader/writer with
    * default params (LlmDataSpec pins the render→decode→hash parity).
    * NOT thread-safe — one instance per partition iterator (= per task).
    */
  final class PngCodec {
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()

    def decode(b: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try { reader.setInput(iis, true, true); reader.read(0) }
      finally iis.close()
    }

    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try { writer.setOutput(ios); writer.write(img) }
      finally ios.close()
      bos.toByteArray
    }
  }

  /** Min-max gray quantization of a DOUBLE array to 0..255 integer
    * levels, in DOUBLE arithmetic only (one subtraction, one division,
    * one multiplication, one positive-half-up round per element — every
    * step correctly rounded IEEE and identically defined in any engine).
    * This is the float-free twin of [[pngFromVector]]'s internal scaling:
    * computing the levels in SQL lets an oracle reproduce them bit-exactly
    * where float32 expression semantics would be engine-specific.
    */
  def grayFromDoubles(dv: Column): Column = {
    val lo = array_min(dv)
    val span = when(array_max(dv) > lo, array_max(dv) - lo).otherwise(lit(1.0))
    transform(dv, x => round((x - lo) / span * lit(255.0)).cast("int"))
  }

  /** (id, gray[64]) → (id, ahash): render a REAL PNG from the levels,
    * decode it back through `javax.imageio`, and average-hash the decoded
    * pixels — one codec-batched pass, same shape as [[decode]]. The
    * output hash equals the pure-integer prediction from the levels iff
    * the render→decode round trip preserved every pixel, which is exactly
    * what the oracle gate on the registered queries proves per row.
    */
  def grayRenderHashes(gray: DataFrame): DataFrame = {
    val spark = gray.sparkSession
    import spark.implicits._
    // repartition BEFORE the codec pass: the embeddings corpus often scans
    // as one row-group = one partition, and per-row PNG encode+decode is
    // CPU work that must spread across cores (measured 4.2 s single-task
    // vs ~0.6 s spread at sf0.1 — the shuffle moves only (id, 64 ints)
    // rows, trivially cheaper than the codec CPU it unlocks)
    gray.repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Seq[Int])]
      .mapPartitions { it =>
        val codec = new PngCodec() // once per task: see PngCodec scaladoc
        it.map { case (id, g) =>
          (id, averageHash(codec.decode(codec.encode(grayImage(g.toArray)))))
        }
      }
      .toDF("id", "ahash")
  }

  /** Image near-duplicate pairs: decode -> aHash (one mapPartitions pass,
    * codec batched per partition) -> 4x16-bit banded self-join (identical
    * blocking to SimHash: <=3 flipped bits CANNOT miss every band) ->
    * exact hamming verify. The corpus is never compared all-pairs; the
    * quadratic term is bounded per band bucket. The default threshold
    * matches the banding guarantee: with 4 bands, <= 3 flipped bits
    * CANNOT miss every band (pigeonhole) — a higher threshold would
    * silently drop pairs whose flips straddle all four bands.
    */
  def imageNearDupPairs(assets: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    // same single-input-partition repair as grayRenderHashes: the decode
    // pass is the CPU; spread it before paying it
    val hashes = assets.select(col("asset_id"), col("payload"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new PngCodec() // once per task: see PngCodec scaladoc
        it.flatMap { case (id, bytes) =>
          val payload = Option(bytes).getOrElse(Array.emptyByteArray)
          if (!looksLikeImage(payload)) Iterator.empty
          else try {
            // PNG payloads take the registry-free per-partition codec;
            // the other sniffed formats (JPEG/GIF/BMP) fall back to the
            // one-shot path — rare in this pipeline, same output
            val img =
              if (payload(0) == 0x89.toByte) codec.decode(payload)
              else javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload))
            if (img == null) Iterator.empty
            else Iterator((id, averageHash(img)))
          } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
        }
      }
      .toDF("id", "ahash")
      // EAGER: a lazy localCheckpoint re-materializes its upstream stages
      // on downstream plan construction under AQE (the pagerank_parts
      // lesson) — the per-image codec pass must run exactly once
      .localCheckpoint(eager = true)
    bandedHammingPairs(hashes, maxHamming)
  }

  /** The post-hash half of image near-dup: 4×16-bit banded self-join over
    * a `(id, ahash)` frame + exact hamming verify. Shared by the decode
    * pipeline ([[imageNearDupPairs]]) and the oracle-checked gray-level
    * pipeline — never all-pairs; the quadratic term is bounded per band
    * bucket, and ≤3 flipped bits cannot miss all four bands (pigeonhole).
    * Callers pass an already-materialized (checkpointed) hash frame so the
    * per-image codec pass upstream runs exactly once.
    */
  def bandedHammingPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = hashes.select(col("id"), col("ahash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          (shiftright(col("ahash"), b * 16).bitwiseAND(lit(0xffffL))).as("bh"))): _*))
        .as("bb"))
      .select(col("id"), col("ahash"), col("bb.band"), col("bb.bh"))
    val x = bands.select(col("band"), col("bh"), col("id").as("a"), col("ahash").as("ha"))
    val y = bands.select(col("band"), col("bh"), col("id").as("b"), col("ahash").as("hb"))
    x.join(y, Seq("band", "bh")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb")).distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  // -------------------------------------------------------------------------
  // ASCII-PGM (NetPBM P2): the one image format whose DECODE is plain text
  // processing — header magic + dimensions + maxval + whitespace-separated
  // decimal pixels, '#' comments to end-of-line. That makes the decode
  // math itself oracle-expressible (regexp + split in any SQL engine), so
  // the registered PGM query gates the parser end to end, not just the
  // post-decode features. Reference analog: the custom per-field
  // serializer discipline of the XML renderer (SURVEY §2.5,
  // /root/reference/src/s3_json_to_xml.py:158-221).

  /** Decoded ASCII-PGM image: dimensions + row-major raster. */
  case class PgmImage(width: Int, height: Int, maxval: Int, pixels: Array[Int])

  /** Canonical ASCII-PGM payload from SQL-expressible integer parameters:
    * `w = 4 + id%5`, `h = 4 + id%3`, pixel k `= (id*31 + 7k) % 256`, one
    * raster row per text line, one `#` comment line after the magic. The
    * oracle rebuilds the identical text with string concatenation and the
    * registered query's `pay_hash` column gates the bytes 1:1.
    */
  def pgmFromParams(id: Long): Array[Byte] = {
    val w = (4 + java.lang.Math.floorMod(id, 5L)).toInt
    val h = (4 + java.lang.Math.floorMod(id, 3L)).toInt
    val sb = new java.lang.StringBuilder(64 + w * h * 4)
    sb.append("P2\n# graft synthetic pgm\n")
    sb.append(w).append(' ').append(h).append('\n').append("255\n")
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        if (c > 0) sb.append(' ')
        sb.append(java.lang.Math.floorMod(id * 31 + (r.toLong * w + c) * 7, 256L))
        c += 1
      }
      sb.append('\n')
      r += 1
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** REAL generic NetPBM P2 parser — not tied to [[pgmFromParams]]'s
    * layout: `#` comments anywhere between tokens, arbitrary whitespace
    * runs (space/tab/CR/LF), token-count and 0..maxval range validation.
    * None on any malformed input (wrong magic, short raster, non-numeric
    * or out-of-range pixel) — callers treat that like any codec failure.
    */
  def pgmDecode(payload: Array[Byte]): Option[PgmImage] = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    def flush(): Unit = if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
    var i = 0
    val n = payload.length
    while (i < n) {
      val c = (payload(i) & 0xff).toChar
      if (c == '#') { flush(); while (i < n && payload(i) != '\n') i += 1 }
      else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') { flush(); i += 1 }
      else { sb.append(c); i += 1 }
    }
    flush()
    if (toks.length < 4 || toks(0) != "P2") None
    else try {
      val w = toks(1).toInt
      val h = toks(2).toInt
      val mv = toks(3).toInt
      if (w <= 0 || h <= 0 || mv <= 0 || toks.length != 4 + w * h) None
      else {
        val px = Array.tabulate(w * h)(k => toks(4 + k).toInt)
        if (px.exists(p => p < 0 || p > mv)) None
        else Some(PgmImage(w, h, mv, px))
      }
    } catch { case _: NumberFormatException => None }
  }

  case class Frame(asset_id: Long, frame_idx: Int, frame_hash: Long)

  /** Frame sampling: one row per sampled frame (every `stride`-th 64-byte
    * block stands in for a decoded frame; the generator shape — flatMap,
    * no full materialization — is the real thing).
    */
  def sampleFrames(assets: DataFrame, stride: Int = 4): Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val payload = Option(bytes).getOrElse(Array.emptyByteArray)
        (0 until payload.length by 64 * stride).iterator.map { off =>
          Frame(id, off / 64,
            hashRange(payload, off, math.min(off + 64, payload.length)))
        }
      }
  }

  // -------------------------------------------------------------------------
  // Audio: REAL metadata via a pure-Scala RIFF/WAVE chunk walk. Like
  // mp4Decode, the CONTAINER layout is public spec (RIFF little-endian
  // chunks; PCM `fmt ` carries channels/rate/bits, `data` carries the
  // sample bytes) — no codec library needed for the metadata a curation
  // pipeline filters on (duration, channel count, sample rate) before any
  // sample-level decode.

  case class AudioMeta(asset_id: Long, channels: Long, sample_rate: Long,
                       bits_per_sample: Long, n_samples: Long,
                       duration_ms: Long)

  /** Canonical 44-byte-header PCM WAV payload: RIFF/WAVE + `fmt ` (PCM,
    * audioFormat=1) + `data` with `nSamples * channels * bits/8` bytes of
    * deterministic content (a sawtooth over the byte range — not silence,
    * so fingerprints differ per shape). The builder is the test-side
    * inverse of [[wavDecode]].
    */
  def wavBuild(channels: Int, sampleRate: Int, bitsPerSample: Int,
               nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataLen = nSamples * blockAlign
    val byteRate = sampleRate * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < dataLen) { buf.put((i % 251).toByte); i += 1 }
    buf.array()
  }

  def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** REAL audio METADATA decode: walk the RIFF chunk list, read PCM
    * params from `fmt ` and the payload size from `data`;
    * n_samples = dataLen / blockAlign, duration = n_samples·1000/rate
    * (integer ms). Returns None for non-WAV or truncated payloads —
    * callers fall back to the stub, same contract as [[mp4Decode]].
    */
  def wavDecode(assetId: Long, payload: Array[Byte]): Option[AudioMeta] = {
    if (!looksLikeWav(payload)) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var channels = 0L; var rate = 0L; var bits = 0L; var dataLen = -1L
    var off = 12
    try {
      while (off + 8 <= payload.length && (dataLen < 0 || channels == 0)) {
        val tag = new String(payload, off, 4, "US-ASCII")
        val len = buf.getInt(off + 4).toLong & 0xffffffffL
        tag match {
          case "fmt " if off + 24 <= payload.length =>
            channels = buf.getShort(off + 10).toLong
            rate = buf.getInt(off + 12).toLong & 0xffffffffL
            bits = buf.getShort(off + 22).toLong
          case "data" => dataLen = math.min(len, payload.length - off - 8L)
          case _ => ()
        }
        // chunks are word-aligned. The length field is untrusted: the old
        // `len.toInt` step truncated values near 2^32 to a zero/negative
        // advance and spun this walk forever on one hostile payload. Keep
        // the arithmetic in Long and stop at the first chunk that
        // overruns the payload (nothing after it can be well-formed).
        val step = 8L + len + (len & 1)
        if (len > payload.length.toLong - off - 8) off = payload.length
        else off += step.toInt
      }
      val blockAlign = channels * bits / 8
      if (channels <= 0 || rate <= 0 || bits <= 0 || dataLen < 0) None
      else {
        val n = dataLen / blockAlign
        Some(AudioMeta(assetId, channels, rate, bits, n, n * 1000L / rate))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Audio metadata operator: batched per partition like [[decode]];
    * non-WAV payloads are dropped (a lake scan keeps media it can type).
    */
  def audioMeta(assets: DataFrame): Dataset[AudioMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavDecode(id, Option(bytes).getOrElse(Array.emptyByteArray))
      })
  }

  /** Quantize one embedding coordinate to a 16-bit PCM sample with the
    * exact arithmetic the DuckDB oracle mirrors: float → double, ×8192,
    * floor, clamp to int16. Mono synthesis keys the audio feature path to
    * the same codec-free-oracle trick as the image average hash.
    */
  def pcmSample(v: Float): Int =
    math.max(-32768L, math.min(32767L,
      math.floor(v.toDouble * 8192.0).toLong)).toInt

  /** Real mono 16-bit 8 kHz WAV from an embedding vector — a valid RIFF
    * container [[wavDecode]] parses back losslessly (samples are already
    * int16, so the codec round trip is exact).
    */
  def wavFromVector(v: Array[Float]): Array[Byte] = {
    val n = v.length
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(8000).putInt(16000)
      .putShort(2.toShort).putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(pcmSample(v(i)).toShort); i += 1 }
    buf.array()
  }

  final case class AudioFeatures(asset_id: Long, n_samples: Long,
                                 sum_abs: Long, max_abs: Long,
                                 zero_crossings: Long, energy: Long)

  /** PCM samples of a parsed WAV payload (16-bit mono only — the
    * [[wavFromVector]] contract): chunk-walk to `data`, read int16 LE.
    */
  def wavSamples(payload: Array[Byte]): Option[Array[Int]] = {
    if (!looksLikeWav(payload)) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    try {
      while (off + 8 <= payload.length) {
        val tag = new String(payload, off, 4, "US-ASCII")
        val len = buf.getInt(off + 4).toLong & 0xffffffffL
        if (tag == "data") {
          val avail = math.min(len, payload.length.toLong - off - 8)
          val n = (avail / 2).toInt
          val out = new Array[Int](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort(off + 8 + i * 2).toInt; i += 1 }
          return Some(out)
        }
        val step = 8L + len + (len & 1)
        if (len > payload.length.toLong - off - 8) return None
        off += step.toInt
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-asset signal features computed from the DECODED samples (sum/max
    * of |s|, strict sign-change zero crossings, Σs² energy — all int64;
    * 32768²·n overflows past ~8.6e9 samples, far beyond any real clip).
    * The oracle computes the identical integers straight from the
    * quantized vector, so the parity gate proves the whole
    * synthesize → RIFF container → parse → extract path end to end.
    */
  def audioFeatures(assets: DataFrame): Dataset[AudioFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavSamples(Option(bytes).getOrElse(Array.emptyByteArray)).map { s =>
          var sumAbs = 0L; var maxAbs = 0L; var zc = 0L; var energy = 0L
          var i = 0
          while (i < s.length) {
            val a = math.abs(s(i).toLong)
            sumAbs += a; if (a > maxAbs) maxAbs = a
            energy += s(i).toLong * s(i)
            if (i + 1 < s.length && s(i).toLong * s(i + 1) < 0) zc += 1
            i += 1
          }
          AudioFeatures(id, s.length.toLong, sumAbs, maxAbs, zc, energy)
        }
      })
  }

  /** Minimal valid ISO BMFF container: ftyp + moov/trak with a v0 `tkhd`
    * carrying 16.16 presentation dimensions and an `stsz` sample-size
    * table with explicit per-frame entries — exactly the boxes the real
    * parser walks. Same synthesize-then-really-parse discipline as
    * [[wavFromVector]]/[[pngFromVector]].
    */
  def mp4FromParams(w: Int, h: Int, sizes: Array[Int]): Array[Byte] = {
    def box(t: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(t.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84) // v0 layout; width at +76
      b.position(76); b.putInt(w << 16); b.putInt(h << 16); b.array()
    }
    val stsz = {
      val b = java.nio.ByteBuffer.allocate(12 + 4 * sizes.length)
      b.putInt(0).putInt(0).putInt(sizes.length) // v+flags, size=0, count
      sizes.foreach(b.putInt); b.array()
    }
    val mdia = box("mdia", box("minf", box("stbl", box("stsz", stsz))))
    val trak = box("trak", box("tkhd", tkhd) ++ mdia)
    box("ftyp", "isom".getBytes("US-ASCII")) ++ box("moov", trak)
  }

  final case class VideoFeatures(asset_id: Long, width: Long, height: Long,
                                 n_frames: Long, total_bytes: Long,
                                 max_frame_bytes: Long)

  /** Per-asset frame-size features from the REAL box walk: tkhd
    * dimensions plus the `stsz` entry table (sample_size == 0 → explicit
    * per-sample entries, the layout every camera/muxer writes for video).
    * This is the frame-budgeting pass a curation pipeline runs before
    * paying for any pixel decode — which frames fit the byte budget,
    * where the keyframe-sized outliers are.
    */
  def mp4VideoFeatures(assetId: Long, payload: Array[Byte]): Option[VideoFeatures] = {
    if (!looksLikeMp4(payload)) return None
    val walk = new BmffWalk(payload)
    import walk.{be32, children, find}
    try {
      children(0, payload.length).collectFirst { case ("moov", mf, mu) =>
        children(mf, mu).collect { case ("trak", tf, tu) =>
          for {
            (kf, ku) <- find(tf, tu, List("tkhd"))
            if kf + 84 <= ku
            w = (be32(kf + 76) >> 16)
            h = (be32(kf + 80) >> 16)
            if w > 0 && h > 0
            (sf, su) <- find(tf, tu, List("mdia", "minf", "stbl", "stsz"))
            if sf + 12 <= su && be32(sf + 4) == 0 // explicit entries only
            n = be32(sf + 8).toInt
            if sf + 12 + 4L * n <= su
          } yield {
            var tot = 0L; var mx = 0L; var i = 0
            while (i < n) {
              val sz = be32(sf + 12 + 4 * i)
              tot += sz; if (sz > mx) mx = sz
              i += 1
            }
            VideoFeatures(assetId, w, h, n.toLong, tot, mx)
          }
        }.flatten.nextOption()
      }.flatten
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
