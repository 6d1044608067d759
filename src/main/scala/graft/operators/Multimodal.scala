package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * executor-side code.
  *
  * The Spark-side plumbing is real — binary payload column, typed
  * Dataset of media rows, `mapPartitions` with explicit batch shape (the
  * Scala analogue of `mapInPandas` batches), flat typed output — while
  * the codec itself is a clearly-marked DETERMINISTIC STUB
  * ([[Multimodal.decodeStub]]): this container has no image/audio
  * libraries, so "decoding" derives dimensions and features from a
  * rolling hash of the payload bytes. Because the stub is pure integer
  * math, DuckDB can recompute it from the source text, giving the whole
  * encode → decode → extract chain an exact oracle.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String,
      payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, media_type: String,
      byte_len: Int, width: Int, height: Int, feat0: Double, feat1: Double)
  final case class FrameRow(doc_id: Long, frame_idx: Long, frame_sig: Long)

  val DecodeBatchSize = 64
  private val Mod = 1000000007L

  /** The media table: payload = UTF-8 bytes of the document text (the
    * corpus has no real media; the bytes are opaque to everything
    * downstream), media_type assigned deterministically.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    documents(s, d)
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Rolling hash over raw bytes — the deterministic core of the stub. */
  private def byteHash(payload: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < payload.length) {
      h = (h * 31 + (payload(i) & 0xFF)) % Mod
      i += 1
    }
    h
  }

  /** STUB DECODER — stands in for an image/audio/video codec (none is
    * available in this environment). Deterministic integer math on the
    * payload bytes; a real deployment replaces only this function (and
    * keeps the batching/plumbing around it).
    */
  def decodeStub(row: MediaRow): DecodedRow = {
    val h = byteHash(row.payload)
    DecodedRow(
      doc_id = row.doc_id,
      media_type = row.media_type,
      byte_len = row.payload.length,
      width = (32 + h % 617).toInt,
      height = (32 + (h * 31 + 7) % 431).toInt,
      feat0 = (h * 13 % 100000L) / 100000.0,
      feat1 = (h * 17 % 100000L) / 100000.0)
  }

  /** Decode + feature-extract over `mapPartitions` in explicit batches:
    * the executor-side pattern for codec work (amortized per-batch codec
    * init, bounded memory per batch), with the task-per-partition
    * parallelism Catalyst already provides. Flat typed output.
    */
  def mmDecodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          // real codecs would init once here, decode the batch, release
          batch.map(decodeStub)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val mmDecodeFeaturesSql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(regexp_split_to_array(text, ''), x -> CAST(ord(x) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS rh,
      |    octet_length(encode(text)) AS blen
      |  FROM documents)
      |SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  CAST(blen AS INTEGER) AS byte_len,
      |  CAST(32 + rh % 617 AS INTEGER) AS width,
      |  CAST(32 + (rh * 31 + 7) % 431 AS INTEGER) AS height,
      |  CAST(rh * 13 % 100000 AS DOUBLE) / 100000.0 AS feat0,
      |  CAST(rh * 17 % 100000 AS DOUBLE) / 100000.0 AS feat1
      |FROM h
      |ORDER BY doc_id""".stripMargin

  /** Pure-Catalyst metadata pass (no decode): byte length + payload
    * fingerprint straight off the binary column — the cheap scan that
    * partition-prunes and prunes columns before any expensive decode.
    */
  def mmMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).toDF()
      .select(
        col("doc_id"), col("media_type"),
        length(col("payload")).as("byte_len"),
        md5(col("payload")).as("payload_md5"))
      .orderBy(col("doc_id"))
  }

  val mmMetaSql: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
      |  md5(text) AS payload_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Frame sampling for the `video` rows: every 5th frame of
    * `byte_len DIV 100 + 1` fake frames, one output row per sampled
    * frame with a deterministic per-frame signature. The flatMap shape
    * (1 blob → N frame rows) is the real operator; the signature stands
    * in for a per-frame embedding.
    */
  def mmFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .filter(_.media_type == "video")
      .flatMap { row =>
        val h = byteHash(row.payload)
        val nFrames = row.payload.length / 100 + 1
        (0 until nFrames by 5).map { idx =>
          FrameRow(row.doc_id, idx.toLong, (h + idx * 2654435761L) % 1000003L)
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val mmFrameSampleSql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(regexp_split_to_array(text, ''), x -> CAST(ord(x) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS rh,
      |    octet_length(encode(text)) AS blen
      |  FROM documents
      |  WHERE CAST(doc_id % 3 AS INTEGER) = 2)
      |SELECT doc_id, frame_idx,
      |  (rh + frame_idx * 2654435761) % 1000003 AS frame_sig
      |FROM (SELECT doc_id, rh,
      |        unnest(range(0, blen // 100 + 1, 5)) AS frame_idx
      |      FROM h) t
      |ORDER BY doc_id, frame_idx""".stripMargin

  final case class ResizedRow(doc_id: Long, width: Int, height: Int,
      new_w: Int, new_h: Int, resized_bytes: Long)

  /** Resize pass for the `image` rows: fit into a 256×256 box preserving
    * aspect ratio (integer math — `new = dim * 256 / max(w, h)`), with
    * the output byte size of an RGB buffer. Decode + resize run in the
    * same `mapPartitions` batch (a real pipeline fuses them to avoid
    * re-decoding); the pixel work is the same deterministic stub as
    * [[decodeStub]], the batching/fusion shape is the real operator.
    */
  def mmResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .filter(_.media_type == "image")
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.map { row =>
            val dec = decodeStub(row)
            val longSide = math.max(dec.width, dec.height)
            val nw = dec.width * 256 / longSide
            val nh = dec.height * 256 / longSide
            ResizedRow(row.doc_id, dec.width, dec.height, nw, nh,
              nw.toLong * nh * 3)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val mmResizeSql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(regexp_split_to_array(text, ''), x -> CAST(ord(x) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS rh
      |  FROM documents
      |  WHERE CAST(doc_id % 3 AS INTEGER) = 0),
      |dims AS (
      |  SELECT doc_id,
      |    CAST(32 + rh % 617 AS INTEGER) AS width,
      |    CAST(32 + (rh * 31 + 7) % 431 AS INTEGER) AS height
      |  FROM h)
      |SELECT doc_id, width, height,
      |  CAST(width * 256 // greatest(width, height) AS INTEGER) AS new_w,
      |  CAST(height * 256 // greatest(width, height) AS INTEGER) AS new_h,
      |  CAST(width * 256 // greatest(width, height) AS BIGINT)
      |    * (height * 256 // greatest(width, height)) * 3 AS resized_bytes
      |FROM dims
      |ORDER BY doc_id""".stripMargin

  final case class AudioWindowRow(doc_id: Long, win_idx: Long,
      n_samples: Int, energy: Long)

  val AudioWindowBytes = 400

  /** Windowed energy for the `audio` rows: the payload bytes stand in
    * for PCM samples (the stub decode — a real deployment swaps in the
    * codec and keeps this framing), cut into fixed
    * [[AudioWindowBytes]]-sample windows, each emitting its sample
    * count and the integer energy Σ(s−128)² — the map-side 1→N frame
    * shape of every audio featurizer (VAD, loudness, fingerprinting).
    * Integer math end to end, so the oracle reproduces it exactly.
    */
  def mmAudioEnergy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .filter(_.media_type == "audio")
      .flatMap { row =>
        val bytes = row.payload
        val nWins = (bytes.length + AudioWindowBytes - 1) / AudioWindowBytes
        (0 until nWins).map { w =>
          val start = w * AudioWindowBytes
          val end = math.min(start + AudioWindowBytes, bytes.length)
          var e = 0L
          var i = start
          while (i < end) {
            val v = (bytes(i) & 0xFF).toLong - 128L
            e += v * v
            i += 1
          }
          AudioWindowRow(row.doc_id, w.toLong, end - start, e)
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("win_idx"))
  }

  val mmAudioEnergySql: String =
    s"""WITH b AS (
       |  SELECT doc_id,
       |    list_transform(regexp_split_to_array(text, ''), x -> CAST(ord(x) AS BIGINT)) AS bs
       |  FROM documents
       |  WHERE CAST(doc_id % 3 AS INTEGER) = 1),
       |w AS (
       |  SELECT doc_id, bs,
       |    unnest(range(0, (len(bs) + ${AudioWindowBytes - 1}) // $AudioWindowBytes)) AS win_idx
       |  FROM b)
       |SELECT doc_id, win_idx,
       |  CAST(LEAST((win_idx + 1) * $AudioWindowBytes, len(bs)) - win_idx * $AudioWindowBytes AS INTEGER) AS n_samples,
       |  CAST(list_sum(list_transform(
       |    bs[win_idx * $AudioWindowBytes + 1 : LEAST((win_idx + 1) * $AudioWindowBytes, len(bs))],
       |    v -> (v - 128) * (v - 128))) AS BIGINT) AS energy
       |FROM w
       |ORDER BY doc_id, win_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta"            -> mmMeta _,
    "mm_decode_features" -> mmDecodeFeatures _,
    "mm_frame_sample"    -> mmFrameSample _,
    "mm_resize"          -> mmResize _,
    "mm_audio_energy"    -> mmAudioEnergy _,
  )

  val oracles: Map[String, String] = Map(
    "mm_meta"            -> mmMetaSql,
    "mm_decode_features" -> mmDecodeFeaturesSql,
    "mm_frame_sample"    -> mmFrameSampleSql,
    "mm_resize"          -> mmResizeSql,
    "mm_audio_energy"    -> mmAudioEnergySql,
  )
}
