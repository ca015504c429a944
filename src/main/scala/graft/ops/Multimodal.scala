package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X4 — multimodal columns (SURVEY §2.8): image/audio/video as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * UDFs.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration shape —
  * is real and tested; the actual codec call is STUBBED behind
  * [[decodeFrame]] with a deterministic fake (no image/audio libraries in
  * this environment). Swapping in a real decoder changes one function, not
  * the pipeline.
  *
  * Scale notes: blobs never enter a shuffle — metadata extraction projects
  * them away before any wide operator; `mapPartitions` amortizes codec
  * init per partition (the same reason PySpark would use `mapInPandas`
  * batches); frame sampling emits rows sized by `stride`, keeping output
  * row width bounded.
  */
object Multimodal {

  /** Attach a binary "media" column + typed metadata struct to a text
    * table — the ingest shape a crawler would produce.
    */
  def attachBlob(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("blob"),
      struct(
        lit("application/octet-stream").as("mime"),
        // octet_length = UTF-8 byte count, matching length(blob) below —
        // char count would diverge on non-ASCII text
        octet_length(col(textCol)).as("n_bytes"),
        (col(idCol) % 640).as("width"),
        (col(idCol) * 7 % 480).as("height")).as("meta"))

  /** X49 — CONTENT-DEFINED CHUNKING over a binary column: boundaries
    * fall where the hash of a kb-byte sliding window lands in a target
    * set (first `hexZeros` hex chars of md5 all '0' — rate 16^-hexZeros,
    * so expected chunk size ~ 16^hexZeros + kb bytes), the
    * Rabin/gear-CDC family's defining property re-expressed with the
    * repo's engine-portable md5 primitive: an insertion shifts every
    * downstream byte, but boundaries re-align within one chunk because
    * they depend only on local window content — the basis of
    * binary-level dedup for media/blob corpora (LBFS, Muthitacharoen
    * et al. 2001). Deliberately NO min/max chunk clamps: those make the
    * cut sequence stateful (each cut depends on the previous one) and
    * are exactly what this declarative form trades away to stay one
    * scan + one window pass.
    *
    * Output: (id, chunk_idx, start, clen, chunk_md5) — 1-based byte
    * offsets; identical chunk_md5 across rows IS the dedup signal
    * (see the x50 summary query). The final position is always a cut,
    * so chunks tile the blob exactly (spec-pinned).
    *
    * Shape at 100 TB: the window-hash explode is the cost center
    * (len-kb+1 md5s per blob) and happens in the scan stage; only
    * (id, boundary) pairs — content-boundary density × corpus — reach
    * the one window exchange, and the blob is joined back once for the
    * chunk-slice hashes. Blobs never enter a shuffle.
    */
  def cdcChunks(media: DataFrame, idCol: String, blobCol: String,
                kb: Int = 8, hexZeros: Int = 1): DataFrame = {
    require(kb >= 1, s"window bytes must be >= 1: $kb")
    require(hexZeros >= 1 && hexZeros <= 8, s"hexZeros in [1,8]: $hexZeros")
    import org.apache.spark.sql.expressions.Window
    val zeros = "0" * hexZeros
    val m = media.select(col(idCol), col(blobCol).as("blob"))
      .withColumn("len", length(col("blob")))
    // content boundaries: window [i, i+kb-1] hashing into the target set
    // cuts AFTER its last byte; short blobs contribute no window (their
    // single whole-blob chunk comes from the unconditional final cut)
    val bounds = m.filter(col("len") >= kb)
      .select(col(idCol),
        explode(sequence(lit(1), col("len") - (kb - 1))).as("i"),
        col("blob"))
      .filter(substring(md5(expr(s"substring(blob, i, $kb)")), 1, hexZeros)
        === zeros)
      .select(col(idCol), (col("i") + (kb - 1)).as("e"))
    val cuts = bounds
      .unionByName(m.filter(col("len") >= 1)
        .select(col(idCol), col("len").as("e")))
      .distinct()
    val w = Window.partitionBy(col(idCol)).orderBy(col("e"))
    val spans = cuts
      .withColumn("start", coalesce(lag(col("e"), 1).over(w) + 1, lit(1)))
      .withColumn("chunk_idx", row_number().over(w) - 1)
      .select(col(idCol), col("chunk_idx"), col("start"),
        (col("e") - col("start") + 1).as("clen"))
    spans.join(m.select(col(idCol), col("blob")), Seq(idCol))
      .select(col(idCol), col("chunk_idx"), col("start"), col("clen"),
        expr("md5(substring(blob, start, clen))").as("chunk_md5"))
  }

  /** X50 — chunk-level dedup summary over [[cdcChunks]]: content hashes
    * appearing more than once, with copy and document counts — the
    * storage-dedup ledger (shared boilerplate spans across documents
    * produce identical chunks even at different offsets, which is the
    * whole point of content-defined boundaries).
    */
  def chunkDedup(chunks: DataFrame, idCol: String): DataFrame =
    chunks.groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_copies") > 1)

  /** STUB — the real decoder (image resize / audio feature / video frame
    * extraction) goes here. Deterministic fake: per frame index, an 8-byte
    * slice digest. Signature (bytes, frameIdx) => fixed-width feature is
    * what a real codec adapter must satisfy.
    */
  def decodeFrame(blob: Array[Byte], frameIdx: Int): Array[Byte] = {
    val start = math.min(frameIdx * 8, math.max(blob.length - 8, 0))
    java.util.Arrays.copyOfRange(blob, start, math.min(start + 8, blob.length))
  }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_bytes", BinaryType)))

  /** Frame-sample every `stride`-th frame from each blob via
    * `mapPartitions` — one codec context per partition, batch iteration
    * inside, the Scala analog of a `mapInPandas` batch UDF.
    */
  def sampleFrames(withBlobs: DataFrame, stride: Int): DataFrame = {
    val spark = withBlobs.sparkSession
    val rdd = withBlobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { rows =>
      // codec init would happen ONCE here, not per row
      rows.flatMap { r =>
        val id = r.getLong(0)
        val blob = r.getAs[Array[Byte]](1)
        val nFrames = math.max(blob.length / 8, 1)
        (0 until nFrames by stride).map(i => Row(id, i, decodeFrame(blob, i)))
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Render a deterministic binary P6 PPM image per document: header
    * `P6\n<w> <h>\n255\n` + w*h*3 payload bytes derived from the doc id.
    * Gives the decode path a REAL binary format to parse (below) without
    * any codec library.
    */
  def renderPpm(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // typed Dataset boundary, not .rdd + createDataFrame: the encoder
    // generates QUERY-SPECIFIC (de)serializer code, where the generic
    // CatalystTypeConverters path is a megamorphic call site shared by
    // every RDD-boundary query in a long benchmark run — round 18
    // caught it deoptimizing MID-RUN (x4 warm runs 0.29 s -> 0.83 s in
    // one JVM) and never recovering
    docs.select(col(idCol)).as[Long].mapPartitions(_.map { id =>
      val w = (id % 8 + 1).toInt; val h = (id % 5 + 1).toInt
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val px = Array.tabulate(w * h * 3)(i => ((id * 31 + i * 7) % 256).toByte)
      (id, header ++ px)
    }).toDF("doc_id", "image")
  }

  /** REAL binary decode of the P6 PPM header: (width, height, maxval,
    * n_pixel_bytes). This is the genuine decode seam — for jpeg/png/audio
    * the parser body changes, the column contract does not.
    */
  def decodePpmHeader(blob: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (blob.length < 2 || blob(0) != 'P' || blob(1) != '6') return None
    var i = 2
    def skipWs(): Unit = { while (i < blob.length && blob(i).toChar.isWhitespace) i += 1 }
    def readInt(): Int = {
      skipWs(); var v = 0
      while (i < blob.length && blob(i) >= '0' && blob(i) <= '9') { v = v * 10 + (blob(i) - '0'); i += 1 }
      v
    }
    val w = readInt(); val h = readInt(); val mx = readInt()
    i += 1 // single whitespace after maxval
    if (w <= 0 || h <= 0) None else Some((w, h, mx, blob.length - i))
  }

  /** Decode PPM headers across a table of image blobs — a typed
    * mapPartitions (encoder-specialized boundary, see [[renderPpm]]).
    */
  def decodeImages(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("doc_id"), col("image")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        decodePpmHeader(blob).map { case (w, h, mx, n) => (id, w, h, mx, n) }
      })
      .toDF("doc_id", "width", "height", "maxval", "n_pixel_bytes")
  }

  /** Render a deterministic PCM WAV blob per document: the standard
    * 44-byte RIFF/WAVE/fmt/data header plus payload samples derived from
    * the doc id — the audio counterpart of [[renderPpm]], again a REAL
    * binary format with no codec library needed.
    */
  def renderWav(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol)).as[Long].mapPartitions(_.map { id =>
      val channels = (id % 2 + 1).toInt
      val sampleRate = Seq(8000, 16000, 44100)((id % 3).toInt)
      val bits = 16
      val nSamples = (id % 50 + 1).toInt // per channel
      val blockAlign = channels * bits / 8
      val dataLen = nSamples * blockAlign
      val byteRate = sampleRate * blockAlign
      val b = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1) // PCM
      b.putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
      b.putShort(blockAlign.toShort).putShort(bits.toShort)
      b.put("data".getBytes("US-ASCII")).putInt(dataLen)
      (0 until dataLen / 2).foreach(i => b.putShort(((id * 131 + i * 17) % 65536 - 32768).toShort))
      (id, b.array())
    }).toDF("doc_id", "audio")
  }

  /** REAL RIFF/WAVE header decode: (channels, sample_rate,
    * bits_per_sample, n_samples, duration_us). Walks the chunk list (fmt
    * then data) rather than assuming fixed offsets, so WAVs with extra
    * chunks parse too. Only PCM (format tag 1) is accepted — other
    * encodings would make the blockAlign sample math wrong. Duration is
    * TRUNCATING integer µs (floor of n_samples * 1e6 / rate — 44.1 kHz
    * rarely divides evenly); any external verifier must floor-divide the
    * same way. Chunk lengths are untrusted input: negative or
    * past-the-end lengths reject cleanly instead of looping or throwing,
    * and the declared data length is clamped to the bytes actually
    * present (a truncated file reports what it holds, not what the
    * header claims).
    */
  def decodeWavHeader(blob: Array[Byte]): Option[(Int, Int, Int, Long, Long)] =
    wavChunks(blob).map { case (_, channels, sampleRate, bits, blockAlign,
        _, dataLen) =>
      val nSamples = dataLen / blockAlign
      (channels, sampleRate, bits, nSamples, nSamples * 1000000L / sampleRate)
    }

  /** The RIFF chunk walk shared by the header decode and the
    * fingerprint: (fmtCode, channels, sampleRate, bits, blockAlign,
    * dataOff, dataLen) — None under the same rejection rules as before.
    */
  private def wavChunks(blob: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, Int, Long)] = {
    if (blob.length < 12) return None
    val b = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(blob, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L // Long: a hostile 32-bit length must not overflow the cursor
    var fmtCode = 0; var channels = 0; var sampleRate = 0
    var bits = 0; var blockAlign = 0
    var dataLen = -1L; var dataOff = -1
    while (off + 8 <= blob.length && (channels == 0 || dataLen < 0)) {
      val o = off.toInt
      val id = tag(o); val len = b.getInt(o + 4)
      if (len < 0) return None // corrupt length: reject, don't spin
      // a fmt chunk must DECLARE >= 16 bytes: a shorter declared length
      // would make the field reads below spill into the next chunk's
      // bytes and parse garbage as format fields
      if (id == "fmt " && len >= 16 && o + 24 <= blob.length) {
        fmtCode = b.getShort(o + 8)
        channels = b.getShort(o + 10)
        sampleRate = b.getInt(o + 12)
        blockAlign = b.getShort(o + 20)
        bits = b.getShort(o + 22)
      } else if (id == "data") {
        // clamp to bytes actually present — truncated files report content
        dataLen = math.min(len.toLong, math.max(0L, blob.length - (o + 8L)))
        dataOff = o + 8
      }
      off += 8L + len + (len & 1) // chunks are word-aligned
    }
    if (fmtCode != 1 || channels <= 0 || sampleRate <= 0 || blockAlign <= 0 ||
        bits <= 0 || dataLen < 0) None
    else Some((fmtCode, channels, sampleRate, bits, blockAlign, dataOff,
      dataLen))
  }

  /** Decode WAV headers across a table of audio blobs via mapPartitions —
    * same batch shape as [[decodeImages]].
    */
  def decodeAudio(audio: DataFrame): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("doc_id"), col("audio")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        decodeWavHeader(blob).map { case (c, sr, bits, n, us) =>
          (id, c, sr, bits, n, us)
        }
      })
      .toDF("doc_id", "channels", "sample_rate", "bits", "n_samples",
        "duration_us")
  }

  /** Metadata-level query (oracle-checkable): blob length, digest, and the
    * flattened meta fields — blobs projected away before any shuffle.
    */
  def mediaStats(withBlobs: DataFrame): DataFrame =
    withBlobs.select(
      col("doc_id"),
      length(col("blob")).as("n_bytes"),
      md5(col("blob")).as("digest"),
      col("meta.mime").as("mime"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))

  /** X110 — 7-bit energy-delta fingerprint of a decoded PCM WAV
    * (Haitsma & Kalker 2002's sign-of-band-energy-difference recipe
    * collapsed to the time axis): split the int16 word stream into 8
    * equal windows, E_k = Σ s², bit k = E_{k+1} > E_k. Every energy is
    * an exact long (|s| ≤ 2¹⁵ → s² ≤ 2³⁰ per term), so the fingerprint
    * replays in any engine — including an oracle that re-derives the
    * samples from the render rule without parsing a byte.
    */
  def audioFingerprint(blob: Array[Byte]): Option[(Long, Long, Long)] =
    wavChunks(blob).map { case (_, _, _, _, _, dataOff, dataLen) =>
      val b = java.nio.ByteBuffer.wrap(blob)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val nWords = (dataLen / 2).toInt
      val e = new Array[Long](8)
      var total = 0L
      var k = 0
      while (k < 8) {
        var i = k * nWords / 8
        val end = (k + 1) * nWords / 8
        while (i < end) {
          val s = b.getShort(dataOff + 2 * i).toLong
          e(k) += s * s
          i += 1
        }
        total += e(k)
        k += 1
      }
      var fp = 0L
      for (j <- 0 until 7 if e(j + 1) > e(j)) fp |= 1L << j
      (fp, nWords.toLong, total)
    }

  /** X110 — perceptual audio dedup: the [[imagePerceptualDedup]]
    * discipline on the audio key. The group key is (n_words, fp) —
    * sample count AND the 7-bit energy-delta profile: fp alone has 128
    * possible values, so on any corpus beyond a few hundred clips
    * unrelated audio of different lengths would collapse into shared
    * canonical groups (n_words restores the length axis the time-
    * collapsed Haitsma-Kalker profile drops). Total energy is carried
    * for audits but deliberately NOT in the key — requiring equal
    * energy would make the tier exact-dup, not perceptual. Blobs never
    * shuffle; the exchange carries (id, n_words, fp, energy) rows only.
    */
  def audioPerceptualDedup(audio: DataFrame, idCol: String): DataFrame = {
    val spark = audio.sparkSession
    val rdd = audio.select(col(idCol), col("audio")).rdd.mapPartitions {
      rows => rows.flatMap { r =>
        audioFingerprint(r.getAs[Array[Byte]](1)).map {
          case (fp, nWords, total) => Row(r.getLong(0), nWords, fp, total)
        }
      }
    }
    val hashed = spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType), StructField("n_words", LongType),
      StructField("fp", LongType), StructField("energy", LongType))))
      .localCheckpoint(false) // same double-decode pin as the image path
    val groups = hashed.groupBy("n_words", "fp")
      .agg(count(lit(1)).as("group_n"), min("doc_id").as("canonical_id"))
    hashed.join(groups, Seq("n_words", "fp"))
      .select(col("doc_id"), col("n_words"), col("fp"), col("energy"),
        col("group_n"), col("canonical_id"))
  }

  /** X109 — 16-bit average hash of a decoded PPM: grayscale the pixels,
    * nearest-sample a 4x4 grid (source index (i·h) div 4 — defined for
    * every h ≥ 1, no interpolation so every step is exact integer),
    * threshold each cell against the integer mean of the 16 samples.
    * The standard perceptual-hash recipe (aHash, as popularized by the
    * pHash family) restricted to exact arithmetic so any engine —
    * including an oracle that RE-DERIVES pixels from the render rule
    * instead of parsing bytes — reproduces the hash bit-for-bit.
    */
  def aHash16(blob: Array[Byte]): Option[(Int, Int, Long)] =
    decodePpmHeader(blob).map { case (w, h, _, n) =>
      val off = blob.length - n
      def gray(si: Int, sj: Int): Int = {
        val p = off + 3 * (si * w + sj)
        ((blob(p) & 0xff) + (blob(p + 1) & 0xff) + (blob(p + 2) & 0xff)) / 3
      }
      val cells = for (i <- 0 until 4; j <- 0 until 4)
        yield gray(i * h / 4, j * w / 4)
      val avg = cells.sum / 16
      var hash = 0L
      for (k <- cells.indices if cells(k) > avg) hash |= 1L << k
      (w, h, hash)
    }

  /** X115 — 64-bit average hash: [[aHash16]]'s recipe at the standard
    * production grid (8x8 — the width the pHash family and every
    * image-dedup pipeline actually ship, and the width
    * [[graft.ops.Dedup.simhash64]]'s scaladoc argues for: at 16 bits
    * unrelated content collides constantly; at 64 bits proximity means
    * near-duplication). Same exact-integer contract: nearest-sample
    * grid, integer mean threshold, reproducible bit-for-bit by an
    * oracle re-deriving pixels from the render rule. Bit 63 arrives
    * via `1L << 63` (the sign bit) — two's complement on both engines.
    */
  def aHash64(blob: Array[Byte]): Option[(Int, Int, Long)] =
    decodePpmHeader(blob).map { case (w, h, _, n) =>
      val off = blob.length - n
      def gray(si: Int, sj: Int): Int = {
        val p = off + 3 * (si * w + sj)
        ((blob(p) & 0xff) + (blob(p + 1) & 0xff) + (blob(p + 2) & 0xff)) / 3
      }
      val cells = for (i <- 0 until 8; j <- 0 until 8)
        yield gray(i * h / 8, j * w / 8)
      val avg = cells.sum / 64
      var hash = 0L
      for (k <- cells.indices if cells(k) > avg) hash |= 1L << k
      (w, h, hash)
    }

  /** X115 — pinned (idCol, width, height, simhash) signature table over
    * image blobs: the column is named `simhash` so the frame feeds
    * [[Dedup.hammingBands]]/[[Dedup.hammingPairs]] unchanged. Pinned
    * because the banded self-join consumes the frame TWICE (probe and
    * index) — without the pin every blob would decode twice (the
    * x109/x110 double-decode discipline).
    */
  def imageSignatures(images: DataFrame, idCol: String): DataFrame = {
    val spark = images.sparkSession
    val rdd = images.select(col(idCol), col("image")).rdd.mapPartitions {
      rows => rows.flatMap { r =>
        aHash64(r.getAs[Array[Byte]](1)).map { case (w, h, hash) =>
          Row(r.getLong(0), w, h, hash)
        }
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField(idCol, LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("simhash", LongType))))
      .localCheckpoint(false)
  }

  /** X115 — Hamming-banded near-duplicate image pairs at DOC grain:
    * the x79 pigeonhole multi-index over 64-bit aHash signatures — the
    * loosening knob x109's exact-equality tier documents. All pairs
    * within Hamming distance `maxDist`, found by banded equi-join +
    * popcount verify (lossless by the pigeonhole argument). Doc-grain
    * output is quadratic in per-signature copy counts — use
    * [[imageHammingCanonical]] at corpus scale; this form exists for
    * bounded inputs and the spec's all-pairs equivalence pin.
    */
  def imageHammingPairs(images: DataFrame, idCol: String,
                        maxDist: Int): DataFrame =
    Dedup.hammingPairs(imageSignatures(images, idCol), idCol, maxDist)

  /** X115 — the SCALE form: exact-equal signatures collapse FIRST
    * (the x109 tier — min-id canonical + member count per distinct
    * 64-bit hash), then the x79 banded Hamming join runs over
    * CANONICALS only. Output (d1, d2, dist, n1, n2): canonical doc
    * pairs within `maxDist`, each carrying its group size — every
    * doc-grain pair is recoverable as a product of member counts, but
    * the enumerated output is bounded by DISTINCT-signature pairs, not
    * doc pairs (on a corpus with heavy duplication that is the
    * difference between thousands and tens of millions of rows; the
    * same two-tier shape as x30's canonical-probe dedup). Blobs decode
    * partition-local and never shuffle; the band join carries one
    * BIGINT per distinct signature.
    */
  def imageHammingCanonical(images: DataFrame, idCol: String,
                            maxDist: Int): DataFrame = {
    val sig = imageSignatures(images, idCol)
    val canon = sig.groupBy(col("simhash"))
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("n_members"))
      .localCheckpoint(false) // feeds the band join twice + two rejoins
    val pairs = Dedup.hammingPairs(
      canon.select(col(idCol), col("simhash")), idCol, maxDist)
    pairs
      .join(canon.select(col(idCol).as("d1"),
        col("n_members").as("n1")), Seq("d1"))
      .join(canon.select(col(idCol).as("d2"),
        col("n_members").as("n2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("dist"), col("n1"), col("n2"))
  }

  /** X115 — one decode pass emitting BOTH perceptual hashes per image:
    * (idCol, h16, h64). The audit needs the two grids on identical
    * pixels; two separate scans would decode every blob twice.
    */
  def imageHashes(images: DataFrame, idCol: String): DataFrame = {
    val spark = images.sparkSession
    val rdd = images.select(col(idCol), col("image")).rdd.mapPartitions {
      rows => rows.flatMap { r =>
        val blob = r.getAs[Array[Byte]](1)
        for {
          (_, _, h16) <- aHash16(blob)
          (_, _, h64) <- aHash64(blob)
        } yield Row(r.getLong(0), h16, h64)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField(idCol, LongType), StructField("h16", LongType),
      StructField("h64", LongType))))
      .localCheckpoint(false)
  }

  /** X115 — tier audit (the x82 precision/recall idea) computed at
    * SIGNATURE-GROUP grain: doc-pair counts are exact products/
    * binomials of group sizes, so NO doc pair is ever enumerated —
    * the form that survives a corpus where popular signatures carry
    * thousands of copies. Truth = exact 64-bit equality pairs;
    * methods = the 16-bit exact tier (precision measures how often the
    * coarse grid lumps 64-distinct content) and the Hamming-d tier
    * (recall 1 by construction — it is a superset of equality; its
    * precision prices the loosening). Same output contract as
    * [[Dedup.pairAudit]]: (method, n_pairs, n_hits, n_truth,
    * precision_ppm, recall_ppm), exact integer ppm.
    */
  def imageTierAudit(images: DataFrame, idCol: String,
                     maxDist: Int): DataFrame = {
    val spark = images.sparkSession
    val hashes = imageHashes(images, idCol)
    // C(m, 2) over a group-size column
    def pairsOf(m: Column): Column = (m * (m - 1) / 2).cast("long")
    val g64 = hashes.groupBy(col("h64")).agg(count(lit(1)).as("m"))
      .localCheckpoint(false) // feeds truth, the band join, and h64 pairs
    val truth = g64.agg(coalesce(sum(pairsOf(col("m"))), lit(0L))
      .as("n_truth"))
    // h64_d3 doc pairs: within-signature binomials + cross-signature
    // products over the banded canonical pairs (one row per signature
    // pair within maxDist — the bounded enumeration)
    val cross = Dedup.hammingPairs(
        g64.select(col("h64").as(idCol), col("h64").as("simhash")),
        idCol, maxDist)
      .join(g64.select(col("h64").as("d1"), col("m").as("m1")), Seq("d1"))
      .join(g64.select(col("h64").as("d2"), col("m").as("m2")), Seq("d2"))
      .agg(coalesce(sum(col("m1") * col("m2")), lit(0L)).as("n_cross"))
    val within64 = g64.agg(coalesce(sum(pairsOf(col("m"))), lit(0L))
      .as("n_within"))
    val h64Rows = within64.crossJoin(cross)
      .select(lit("h64_d3").as("method"),
        (col("n_within") + col("n_cross")).as("n_pairs"),
        col("n_within").as("n_hits")) // equality pairs are all at d=0
    // a16_exact doc pairs: 16-bit groups; hits are pairs equal in BOTH
    // grids = binomials of the joint (h16, h64) groups
    val p16 = hashes.groupBy(col("h16")).agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(pairsOf(col("m"))), lit(0L)).as("n_pairs"))
    val joint = hashes.groupBy(col("h16"), col("h64"))
      .agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(pairsOf(col("m"))), lit(0L)).as("n_hits"))
    val a16Rows = p16.crossJoin(joint)
      .select(lit("a16_exact").as("method"), col("n_pairs"), col("n_hits"))
    a16Rows.unionByName(h64Rows).crossJoin(broadcast(truth))
      .select(col("method"), col("n_pairs"), col("n_hits"), col("n_truth"),
        expr("CASE WHEN n_pairs > 0 THEN n_hits * 1000000L div n_pairs " +
          "ELSE 0L END").as("precision_ppm"),
        // empty truth makes recall undefined: abort loudly like
        // Dedup.pairAudit's require, not a silent NULL (non-ANSI div)
        expr("CASE WHEN n_truth = 0 THEN CAST(raise_error(" +
          "'imageTierAudit: exact-equality truth is empty — nothing " +
          "to measure against') AS BIGINT) " +
          "ELSE n_hits * 1000000L div n_truth END").as("recall_ppm"))
  }

  /** X109 — perceptual image dedup: group images by their exact aHash
    * (identical 16-bit signature = near-identical content under this
    * grid), pick the min-id canonical per group. 100 TB shape: the
    * blobs never shuffle — decode and hash are partition-local, the
    * exchange carries (id, w, h, hash) rows, and the dedup is a plain
    * hash group-by (the x1 exact-dedup discipline on a perceptual key).
    * The Hamming-banded tier over the 64-bit hash
    * ([[imageHammingPairs]]) is the loosening knob when exact equality
    * is too strict, with the x82 audit ([[Dedup.pairAudit]]) measuring
    * what the loosening admits.
    */
  def imagePerceptualDedup(images: DataFrame, idCol: String): DataFrame = {
    val spark = images.sparkSession
    val rdd = images.select(col(idCol), col("image")).rdd.mapPartitions {
      rows => rows.flatMap { r =>
        aHash16(r.getAs[Array[Byte]](1)).map { case (w, h, hash) =>
          Row(r.getLong(0), w, h, hash)
        }
      }
    }
    // pinned: hashed feeds both the group table and the join — without
    // the pin each consumer re-runs the RDD and decodes every blob twice
    val hashed = spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("ahash", LongType))))
      .localCheckpoint(false)
    val groups = hashed.groupBy("ahash")
      .agg(count(lit(1)).as("group_n"), min("doc_id").as("canonical_id"))
    hashed.join(groups, Seq("ahash"))
      .select(col("doc_id"), col("width"), col("height"), col("ahash"),
        col("group_n"), col("canonical_id"))
  }
}
