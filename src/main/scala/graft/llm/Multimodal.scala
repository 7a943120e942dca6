package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  object FakeCodec {
    /** The stub's fake decoded dimensions, from the payload size — ONE
      * definition for the JVM paths (the column paths mirror it via
      * [[widthCol]]/[[heightCol]]).
      */
    def dims(nBytes: Long): (Long, Long) = (nBytes % 640 + 1, nBytes % 480 + 1)

    def decode(a: MediaAsset): MediaFeatures = {
      val n = a.payload.length.toLong
      val (w, h) = dims(n)
      MediaFeatures(a.asset_id, a.modality, n, md5Hex(a.payload),
        width = w, height = h, est_frames = n % 8 + 1)
    }

    /** Stub resize: keep the byte prefix proportional to the pixel ratio
      * (target ÷ fake-decoded dims), clamped into [min(1, n), n] — output
      * size tracks target resolution the way a real rescale's would, and an
      * empty payload stays empty. The double math runs in one declared
      * order (n · t / wh) so the column path and the oracle floor the same
      * value. Only the dims are derived here — no full-payload hash on the
      * resize path.
      */
    def resize(a: MediaAsset, tw: Long, th: Long): ResizedAsset = {
      val n = a.payload.length.toLong
      val (w, h) = dims(n)
      val n0 = math.floor(n.toDouble * (tw * th).toDouble / (w * h).toDouble).toLong
      val newN = math.min(n, math.max(1L, n0))
      ResizedAsset(a.asset_id, a.modality, w, h, tw, th,
        n, newN, md5Hex(a.payload.take(newN.toInt)))
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

  /** Column mirrors of [[FakeCodec.dims]]. */
  private def widthCol(n: Column): Column = (n % 640 + 1).cast("long")
  private def heightCol(n: Column): Column = (n % 480 + 1).cast("long")

  /** Feature extraction as column expressions (mirrors [[FakeCodec]]). */
  def featuresSql(assets: DataFrame): DataFrame = {
    val n = length(col("payload"))
    assets.select(
      col("asset_id"), col("modality"),
      n.cast("long").as("n_bytes"),
      md5(col("payload")).as("content_md5"),
      widthCol(n).as("width"),
      heightCol(n).as("height"),
      (n % 8 + 1).cast("long").as("est_frames"))
  }

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
    assets
      .select(col("asset_id"), col("modality"), col("payload"),
        widthCol(n).as("width"), heightCol(n).as("height"), n.as("n_bytes"))
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
