package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * resize / frame-sample operator shapes a training-data pipeline needs.
  *
  * ====== STUB BOUNDARY ======
  * This container has no media libraries, so the byte-level decoders are
  * STUBS: [[StubDecoder]] produces deterministic fake pixels/frames from
  * the content hash. The Spark-side plumbing — schema, batch iteration
  * via `mapPartitions`, size-bucketed repartitioning, feature-vector
  * shape — is real and tested; swap [[Decoder]] for a JNI/FFI
  * implementation in production.
  *
  * Scale notes: media blobs skew partition sizes badly (a 4 GB video
  * next to 10 kB thumbnails), so [[repartitionBySize]] salts rows into
  * byte-balanced partitions before per-row CPU-heavy decode; decode
  * runs once per partition iterator (amortized codec init, the same
  * batch shape `mapInPandas` gives Python pipelines).
  */
object Multimodal {

  case class MediaMeta(mimeType: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(id: Long, embedding: Array[Float], frames: Int)

  /** Pluggable byte decoder — production swaps in a real codec. */
  trait Decoder extends Serializable {
    def decodeMeta(content: Array[Byte]): MediaMeta
    def extractFeatures(content: Array[Byte], dim: Int): Array[Float]
    def sampleFrames(content: Array[Byte], everyMs: Long): Seq[Array[Byte]]
    def resize(content: Array[Byte], width: Int, height: Int): Array[Byte]
  }

  /** Deterministic fake decoder (STUB — see object doc): every output is
    * a pure function of the content bytes via md5, so tests and re-runs
    * are stable. */
  object StubDecoder extends Decoder {
    private def h(content: Array[Byte], salt: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(salt.toByte)
      val d = md.digest(content)
      java.nio.ByteBuffer.wrap(d, 0, 8).getLong & Long.MaxValue
    }
    def decodeMeta(content: Array[Byte]): MediaMeta =
      MediaMeta("application/x-stub", (h(content, 1) % 1280).toInt,
        (h(content, 2) % 720).toInt, h(content, 3) % 600000)
    def extractFeatures(content: Array[Byte], dim: Int): Array[Float] =
      Array.tabulate(dim)(i => ((h(content, 16 + i) % 2000003).toFloat / 1000001.5f) - 1f)
    def sampleFrames(content: Array[Byte], everyMs: Long): Seq[Array[Byte]] = {
      val n = math.max(1, (decodeMeta(content).durationMs / math.max(1, everyMs)).toInt)
      (0 until math.min(n, 32)).map(i => java.security.MessageDigest
        .getInstance("MD5").digest(content ++ Array(i.toByte)))
    }
    def resize(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
      // stub: a deterministic (w*h/64)-byte payload derived from the
      // content — size scales with the target like a real thumbnail
      val out = new Array[Byte](math.max(16, width * height / 64))
      var i = 0
      while (i < out.length) {
        out(i) = (h(content, 32 + i / 16) >> (8 * (i % 8)) & 0xff).toByte
        i += 1
      }
      out
    }
  }

  /** Resize/thumbnail pass: binary → binary at target dimensions, the
    * same partition-amortized batch shape as the other decode steps. */
  def resizeAll(rows: Dataset[MediaRow], width: Int, height: Int,
                decoder: Decoder = StubDecoder): Dataset[(Long, Array[Byte])] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map(r => (r.id, decoder.resize(r.content, width, height))))
  }

  /** Attach decoded metadata to a binary content column. Runs the
    * decoder once per partition iterator (amortized init). */
  def withMetadata(df: DataFrame, idCol: String, contentCol: String,
                   decoder: Decoder = StubDecoder): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => MediaRow(id, bytes, decoder.decodeMeta(bytes)) }
      }
  }

  /** Feature extraction: binary → fixed-dim Float embedding, the input
    * shape for `operators.Similarity`. */
  def extractFeatures(rows: Dataset[MediaRow], dim: Int,
                      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val frames = decoder.sampleFrames(r.content, 1000L)
        MediaFeatures(r.id, decoder.extractFeatures(r.content, dim), frames.size)
      }
    }
  }

  /** Byte-balanced repartitioning: bucket rows so every partition holds
    * ≈ targetBytes of content, preventing giant-blob stragglers. */
  def repartitionBySize(df: DataFrame, contentCol: String,
                        targetBytes: Long, partitions: Int): DataFrame = {
    val sized = df.withColumn("__bytes", length(col(contentCol)).cast("long"))
    // weight-salted key: large blobs spread over more buckets
    val salted = sized.withColumn("__bucket",
      pmod(hash(col(contentCol)) +
        (col("__bytes") / lit(targetBytes)).cast("int"), lit(partitions)))
    salted.repartition(partitions, col("__bucket"))
      .drop("__bytes", "__bucket")
  }

  /** Column-level stub decode for SQL pipelines (no typed API needed):
    * deterministic fake dimensions from the content hash. */
  def stubWidth(content: Column): Column =
    pmod(conv(substring(md5(content), 1, 8), 16, 10).cast("long"), lit(1280L))
  def stubHeight(content: Column): Column =
    pmod(conv(substring(md5(content), 9, 8), 16, 10).cast("long"), lit(720L))
}
