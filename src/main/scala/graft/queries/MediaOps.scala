package graft.queries

import graft.multimodal.Multimodal

/** Multimodal operators on the graded surface (see graft.multimodal).
  * m01 is fully oracle-checked (metadata path is pure built-ins over the
  * deterministic synthetic media); m02 exercises the stub-decoder
  * mapPartitions pipeline (rows-only; histogram math is property-tested
  * in MultimodalSpec). */
object MediaOps {

  val defs: Map[String, QueryDef] = Map(
    "m01_media_stats" -> QueryDef(Multimodal.mediaStats _,
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  substr(to_base64(encode(text)), 1, 8) AS prefix_b64
        |FROM documents ORDER BY media_id""".stripMargin),

    "m02_feature_summary" -> QueryDef(Multimodal.featureSummary _, None)
  )
}
