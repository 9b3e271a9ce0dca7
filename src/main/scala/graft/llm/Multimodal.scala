package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.2.5): media as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so [[FakeDecoder]] is a
  * clearly-marked deterministic stand-in — but everything Spark-level is
  * real: binary column + metadata struct schema, partition-parallel decode
  * via mapPartitions (one decoder instantiation per partition, the same
  * batch shape a JNI/FFmpeg binding would need), and pruning-friendly
  * metadata columns so scans that only need width/height never touch bytes.
  */
object Multimodal {

  /** Decoded-media feature row produced by the per-partition decode pass. */
  case class MediaFeatures(doc_id: Long, byte_len: Long, width: Int,
                           height: Int, mean_byte: Double, feature_crc: Long)

  /** STUB decoder — deterministic fake in place of a real codec.
    * A production build swaps `decode` for the real library call; the
    * signature (bytes in, fixed-shape features out) is the real contract.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Double, Long) = {
      // fake "image dims" derived from leading bytes; deterministic
      val w = 16 + (if (payload.length > 0) (payload(0) & 0x7f) % 48 else 0)
      val h = 16 + (if (payload.length > 1) (payload(1) & 0x7f) % 48 else 0)
      var sum = 0L
      var crc = 1469598103934665603L // FNV-1a 64 offset basis
      var i = 0
      while (i < payload.length) {
        sum += payload(i) & 0xff
        crc = (crc ^ (payload(i) & 0xff)) * 1099511628211L
        i += 1
      }
      val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
      (w, h, mean, crc)
    }
  }

  /** STUB resize — the Spark-side contract of an image resize stage:
    * fixed target dims in the schema, per-partition execution, output
    * byte length proportional to target area. A real build swaps the body
    * for the codec call; everything around it stays.
    */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(1, targetW * targetH / 64))
    var i = 0
    while (i < out.length) {
      out(i) = if (payload.isEmpty) 0 else payload(i % payload.length)
      i += 1
    }
    out
  }

  /** STUB frame sampling — treat the payload as a "video" of fixed-size
    * chunks and keep every `stride`-th chunk; real decoders replace the
    * chunking with container parsing. Output shape (array of frames per
    * row) is the real contract a frame-level feature extractor needs.
    */
  def sampleFramesStub(payload: Array[Byte], frameBytes: Int,
                       stride: Int): Seq[Array[Byte]] =
    payload.grouped(frameBytes).zipWithIndex
      .collect { case (chunk, i) if i % stride == 0 => chunk }
      .toSeq

  /** Decoded frame-sample row: doc_id, frame index, frame bytes, mean. */
  case class FrameRow(doc_id: Long, frame_idx: Int, frame_len: Int,
                      mean_byte: Double)

  /** Partition-parallel resize + frame-sample over the binary column —
    * same mapPartitions batch shape as [[decodeFeatures]].
    */
  def frameFeatures(spark: SparkSession, docs: DataFrame,
                    frameBytes: Int = 16, stride: Int = 2,
                    partitions: Int = 32): DataFrame = {
    // defaults matter: the 64×64 resize emits a 64-byte buffer, so
    // frameBytes=16 yields 4 chunks and stride 2 keeps frames 0 and 2 —
    // frameBytes=64 would collapse to one frame and make stride dead
    // code in the harness query
    import spark.implicits._
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .repartition(partitions, col("doc_id"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        sampleFramesStub(resizeStub(payload, 64, 64), frameBytes, stride)
          .zipWithIndex.map { case (f, i) =>
            val mean = if (f.isEmpty) 0.0
                       else f.map(b => (b & 0xff).toDouble).sum / f.length
            FrameRow(id, i, f.length, mean)
          }
      }
      .toDF()
  }

  /** Attach an opaque binary payload + typed metadata to each document.
    * (The corpus has no real media; utf-8 bytes of the text stand in. With
    * real data this is the parquet binary column as-read.)
    */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).cast("bigint").as("byte_len"),
        sha2(encode(col("text"), "UTF-8"), 256).as("sha")).as("meta"))

  /** Partition-parallel decode: repartition by id (spreads decode cost
    * evenly regardless of upstream layout — media rows are often clustered
    * by source), then mapPartitions so a real decoder would be constructed
    * once per partition, not per row.
    */
  def decodeFeatures(spark: SparkSession, docs: DataFrame,
                     partitions: Int = 32): DataFrame = {
    import spark.implicits._
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .repartition(partitions, col("doc_id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codec init would happen here, once per partition
        rows.map { case (id, payload) =>
          val (w, h, mean, crc) = FakeDecoder.decode(payload)
          MediaFeatures(id, payload.length.toLong, w, h, mean, crc)
        }
      }
      .toDF()
  }
}
