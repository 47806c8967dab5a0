package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Oracle coverage for the multimodal binary-column operators. The
  * payloads are document text bytes (ASCII in the synthetic data, so
  * byte and character offsets coincide and DuckDB can recompute the
  * stub codec's outputs exactly).
  */
object MultimodalQueries {

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1 — metadata extraction over binary payloads (mapPartitions path)
    "m1_media_metadata" -> ((s, d) => {
      Multimodal.extractMetadata(Multimodal.syntheticMedia(s, d))
        .orderBy(col("media_id"))
    }),

    // M2 — frame sampling: one row per sampled frame
    "m2_frame_samples" -> ((s, d) => {
      Multimodal.sampleFrames(Multimodal.syntheticMedia(s, d),
        strideMs = 1000, maxFrames = 5)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // M3 — payload → fixed-dim feature vector (embedding bridge).
    // Features are exact multiples of 1/128; compare ×128 as ints so no
    // decimal formatting can diverge between engines.
    "m3_media_features" -> ((s, d) => {
      Multimodal.extractFeatures(Multimodal.syntheticMedia(s, d), dim = 8)
        .select(col("media_id"),
          array_join(transform(col("features"),
            f => (f * 128).cast("int")), "|").as("features"))
        .orderBy(col("media_id"))
    }),

    // M4 — payload → payload resize with refreshed metadata
    "m4_media_resize" -> ((s, d) => {
      Multimodal.resize(Multimodal.syntheticMedia(s, d), 320, 240)
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("n_bytes"), col("checksum"))
        .orderBy(col("media_id"))
    })
  )

  val sql: Map[String, String] = Map(
    "m1_media_metadata" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    md5(text) AS checksum,
        |    CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS s
        |  FROM documents)
        |SELECT media_id, kind, n_bytes, checksum,
        |  CAST(s % 1920 + 1 AS INT) AS width,
        |  CAST((s // 1920) % 1080 + 1 AS INT) AS height,
        |  n_bytes * 7 AS duration_ms
        |FROM m ORDER BY media_id""".stripMargin,

    "m2_frame_samples" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS len
        |  FROM documents),
        |f AS (
        |  SELECT media_id, text, len,
        |    least(5, greatest(1, CAST((len * 7) // 1000 AS INT))) AS n
        |  FROM m),
        |g AS (
        |  SELECT media_id, text, len,
        |    unnest(generate_series(0, n - 1)) AS i
        |  FROM f)
        |SELECT media_id, CAST(i AS INT) AS frame_idx,
        |  CAST(i AS BIGINT) * 1000 AS offset_ms,
        |  ascii(substr(text, CAST(i % len AS INT) + 1, 1)) / 128.0 AS feature
        |FROM g ORDER BY media_id, frame_idx""".stripMargin,

    "m3_media_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS len
        |  FROM documents)
        |SELECT media_id,
        |  array_to_string(list_transform(generate_series(0, 7), i ->
        |    CAST(ascii(substr(text, CAST((i * 7) % len AS INT) + 1, 1)) AS VARCHAR)),
        |    '|') AS features
        |FROM m ORDER BY media_id""".stripMargin,

    "m4_media_resize" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  320 AS width, 240 AS height,
        |  CAST(least(octet_length(encode(text)), 768) AS BIGINT) AS n_bytes,
        |  md5(substr(text, 1, 768)) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
