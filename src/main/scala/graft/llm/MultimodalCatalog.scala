package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{Catalog, Tables}

/** Driver-contract registrations for the multimodal plumbing (assets
  * synthesized from `documents`; decode stubbed — see [[Multimodal]]).
  */
object MultimodalCatalog extends Catalog {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> ((s, d) =>
      Multimodal.featuresSql(Multimodal.assetsFromDocuments(Tables(s, d).documents))
        .orderBy("asset_id")),

    "frame_samples" -> ((s, d) =>
      Multimodal.frameSamples(Multimodal.assetsFromDocuments(Tables(s, d).documents))
        .orderBy("asset_id", "frame_idx")),

    // stub resize to 96x96: byte-proportional prefix slice (pixel ratio of
    // the fake dims), codegen column path; dual-path parity vs the typed
    // boundary is MultimodalSpec's job
    "media_resized" -> ((s, d) =>
      Multimodal.resizeSql(
          Multimodal.assetsFromDocuments(Tables(s, d).documents), 96, 96)
        .orderBy("asset_id")),
  )

  // DuckDB md5 has no BLOB overload; payload is exactly the utf-8 bytes of
  // text, so md5(text) hashes the same bytes Spark's md5(payload) does.
  private val assetsSql =
    """a AS (SELECT doc_id AS asset_id,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |       ELSE 'video' END AS modality,
      |  encode(text) AS payload,
      |  md5(text) AS content_md5,
      |  text
      |FROM documents)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "media_features" ->
      s"""WITH $assetsSql
         |SELECT asset_id, modality,
         |  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
         |  content_md5,
         |  CAST(octet_length(payload) % 640 + 1 AS BIGINT) AS width,
         |  CAST(octet_length(payload) % 480 + 1 AS BIGINT) AS height,
         |  CAST(octet_length(payload) % 8 + 1 AS BIGINT) AS est_frames
         |FROM a ORDER BY asset_id""".stripMargin,

    "frame_samples" ->
      s"""WITH $assetsSql,
         |f AS (SELECT asset_id,
         |  CAST(octet_length(payload) % 8 + 1 AS BIGINT) AS n_frames,
         |  CAST(floor(CAST(octet_length(payload) AS DOUBLE)
         |    / (octet_length(payload) % 8 + 1)) AS BIGINT) AS stride
         |FROM a)
         |SELECT asset_id,
         |  CAST(unnest(range(0, n_frames)) AS BIGINT) AS frame_idx,
         |  CAST(unnest(range(0, n_frames)) * stride AS BIGINT) AS byte_offset
         |FROM f ORDER BY asset_id, frame_idx""".stripMargin,

    // byte-prefix md5 ≡ char-prefix md5: ASCII payloads (same equivalence
    // as content_md5 above); double math in the same declared order
    "media_resized" ->
      s"""WITH $assetsSql,
         |r AS (SELECT asset_id, modality, text,
         |  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
         |  CAST(octet_length(payload) % 640 + 1 AS BIGINT) AS width,
         |  CAST(octet_length(payload) % 480 + 1 AS BIGINT) AS height
         |FROM a),
         |s AS (SELECT *, least(n_bytes, greatest(1,
         |    CAST(floor(CAST(n_bytes AS DOUBLE) * 9216.0
         |      / CAST(width * height AS DOUBLE)) AS BIGINT))) AS new_n_bytes
         |FROM r)
         |SELECT asset_id, modality, width, height,
         |  CAST(96 AS BIGINT) AS new_width, CAST(96 AS BIGINT) AS new_height,
         |  n_bytes, new_n_bytes,
         |  md5(substring(text, 1, CAST(new_n_bytes AS INTEGER))) AS resized_md5
         |FROM s ORDER BY asset_id""".stripMargin,
  )
}
