package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the decode / feature-extract / frame-sample
  * stages a training-data pipeline runs over them.
  *
  * The DECODE STEP IS A DETERMINISTIC STUB — this container has no media
  * codecs, so [[FakeCodec.decode]] derives pseudo-dimensions from the
  * payload bytes. Everything AROUND the stub is the real Spark shape and is
  * tested: binary columns through parquet scan/write, a typed
  * `Dataset[MediaAsset].mapPartitions` batch-decode boundary (the Scala
  * analog of `mapInPandas` — one iterator per partition, codec state
  * amortized across the partition's rows, narrow stage that scales with
  * splits), and relational frame-offset sampling.
  *
  * Two equivalent feature paths:
  *  - [[featuresSql]]: pure column expressions (codegen, oracle-checkable);
  *  - [[featuresBatch]]: the `mapPartitions` boundary running [[FakeCodec]].
  * They compute the same formulas, which the unit test asserts — proving the
  * opaque-codec plumbing without losing the DuckDB oracle.
  */
object Multimodal {

  /** A row crossing the batch-decode boundary. */
  case class MediaAsset(asset_id: Long, modality: String, payload: Array[Byte])

  /** Decoded features (stub codec output). */
  case class MediaFeatures(asset_id: Long, modality: String, n_bytes: Long,
                           content_md5: String, width: Long, height: Long,
                           est_frames: Long)

  /** STUB codec: deterministic pseudo-decode from payload bytes. A real
    * pipeline would replace this object with JNI/codec calls — the Spark
    * plumbing does not change.
    */
  object FakeCodec {
    def decode(a: MediaAsset): MediaFeatures = {
      val n = a.payload.length.toLong
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(a.payload).map("%02x".format(_)).mkString
      MediaFeatures(a.asset_id, a.modality, n, md5hex,
        width = n % 640 + 1, height = n % 480 + 1, est_frames = n % 8 + 1)
    }

    /** Stub resize: keep the byte prefix proportional to the pixel ratio
      * (target ÷ fake-decoded dims), clamped to [1, n] — output size tracks
      * target resolution the way a real rescale's would, deterministically.
      * The double math runs in one declared order (n · t / wh) so the
      * column path and the oracle floor the same value.
      */
    def resize(a: MediaAsset, tw: Long, th: Long): ResizedAsset = {
      val f = decode(a)
      val n0 = math.floor(f.n_bytes.toDouble * (tw * th).toDouble /
        (f.width * f.height).toDouble).toLong
      val newN = math.min(f.n_bytes, math.max(1L, n0))
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(a.payload.take(newN.toInt)).map("%02x".format(_)).mkString
      ResizedAsset(a.asset_id, a.modality, f.width, f.height, tw, th,
        f.n_bytes, newN, md5hex)
    }
  }

  /** Resized-asset record crossing the typed boundary. */
  case class ResizedAsset(asset_id: Long, modality: String,
                          width: Long, height: Long,
                          new_width: Long, new_height: Long,
                          n_bytes: Long, new_n_bytes: Long, resized_md5: String)

  /** Synthesize a multimodal asset table from `documents` (the container
    * has no media testdata): payload = utf-8 bytes of the text, modality
    * round-robins image/audio/video.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "utf-8").as("payload"))

  /** Feature extraction as column expressions (mirrors [[FakeCodec]]). */
  def featuresSql(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("modality"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("content_md5"),
      (length(col("payload")) % 640 + 1).cast("long").as("width"),
      (length(col("payload")) % 480 + 1).cast("long").as("height"),
      (length(col("payload")) % 8 + 1).cast("long").as("est_frames"))

  /** Feature extraction across the typed batch-decode boundary. */
  def featuresBatch(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(FakeCodec.decode))
  }

  /** Resize as column expressions (mirrors [[FakeCodec.resize]]): the
    * prefix slice runs as a binary substring in codegen, no boundary
    * crossing. Byte-prefix md5 equals the oracle's char-prefix md5 because
    * the synthetic payloads are ASCII (same declared equivalence the
    * content_md5 oracle already uses).
    */
  def resizeSql(assets: DataFrame, tw: Long, th: Long): DataFrame = {
    val n = length(col("payload")).cast("long")
    val w = n % 640 + 1
    val h = n % 480 + 1
    assets
      .select(col("asset_id"), col("modality"), col("payload"),
        w.as("width"), h.as("height"), n.as("n_bytes"))
      .withColumn("new_n_bytes",
        least(col("n_bytes"), greatest(lit(1L),
          floor(col("n_bytes").cast("double") * lit((tw * th).toDouble) /
            (col("width") * col("height")).cast("double")).cast("long"))))
      .select(col("asset_id"), col("modality"), col("width"), col("height"),
        lit(tw).as("new_width"), lit(th).as("new_height"),
        col("n_bytes"), col("new_n_bytes"),
        md5(expr("substring(payload, 1, CAST(new_n_bytes AS INT))"))
          .as("resized_md5"))
  }

  /** Resize across the typed batch boundary (real pipelines put the codec
    * call here; the plumbing is identical).
    */
  def resizeBatch(assets: Dataset[MediaAsset], tw: Long, th: Long): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(FakeCodec.resize(_, tw, th)))
  }

  /** Uniform frame/sample offsets per asset: est_frames offsets at integer
    * stride through the payload — the relational shape of video
    * frame-sampling / audio windowing (posexplode keeps it one narrow
    * stage; floor-division in doubles is exact below 2^52 and matches the
    * oracle bit-for-bit).
    */
  def frameSamples(assets: DataFrame): DataFrame = {
    val n = length(col("payload")).cast("long")
    val frames = (n % 8 + 1).cast("long")
    val stride = floor(n.cast("double") / frames).cast("long")
    assets
      .select(col("asset_id"), frames.as("n_frames"), stride.as("stride"),
        posexplode(sequence(lit(0L), frames - 1)).as(Seq("frame_idx", "f")))
      .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx"),
        (col("f") * col("stride")).as("byte_offset"))
  }
}
