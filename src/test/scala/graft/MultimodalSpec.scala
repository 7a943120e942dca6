package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.llm.Multimodal
import graft.llm.Multimodal.MediaAsset

/** The multimodal plumbing: binary columns, the typed batch-decode
  * boundary, frame sampling, and parquet round-trips.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets =
    Multimodal.assetsFromDocuments(Tables(spark, sf).documents.limit(40)).cache()

  test("batch-decode boundary (mapPartitions) equals the column-expression path") {
    val viaSql = Multimodal.featuresSql(assets).collect().map(_.toSeq).toSet
    val viaBatch = Multimodal.featuresBatch(assets.as[MediaAsset]).toDF()
      .select("asset_id", "modality", "n_bytes", "content_md5", "width", "height", "est_frames")
      .collect().map(_.toSeq).toSet
    assert(viaSql === viaBatch)
  }

  test("resize: typed boundary equals the column path, and sizes track the pixel ratio") {
    val cols = Seq("asset_id", "modality", "width", "height", "new_width",
      "new_height", "n_bytes", "new_n_bytes", "resized_md5")
    val viaSql = Multimodal.resizeSql(assets, 96, 96)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val viaBatch = Multimodal.resizeBatch(assets.as[MediaAsset], 96, 96).toDF()
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(viaSql === viaBatch)
    viaSql.foreach { r =>
      val (w, h, n, newN) = (r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
        r(6).asInstanceOf[Long], r(7).asInstanceOf[Long])
      assert(newN >= math.min(1L, n) && newN <= n, "clamped into [min(1,n), n]")
      assert(newN <= math.max(1L, math.ceil(n.toDouble * 9216.0 / (w * h)).toLong))
    }
  }

  test("binary payloads survive a parquet round-trip") {
    val dir = Files.createTempDirectory("graft-mm").toString
    assets.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType.typeName === "binary")
    val a = assets.select("asset_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val b = back.select("asset_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(a === b)
  }

  test("frameSamples emits est_frames offsets per asset, inside the payload") {
    val feats = Multimodal.featuresSql(assets).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(6))).toMap // n_bytes, est_frames
    val frames = Multimodal.frameSamples(assets).collect()
      .groupBy(_.getLong(0))
    assert(frames.keySet === feats.keySet)
    frames.foreach { case (id, rows) =>
      val (nBytes, estFrames) = feats(id)
      assert(rows.length === estFrames)
      assert(rows.map(_.getLong(1)).sorted.toSeq === (0L until estFrames))
      rows.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) < nBytes.max(1)))
    }
  }
}
