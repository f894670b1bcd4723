package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing surfaced through the gate: binary payloads
  * (documents.text re-encoded as the stand-in payload), typed metadata
  * derivation, size-class partitioning, and frame sampling. The decode
  * stub itself (mapPartitions) is covered by MultimodalSpec; here the
  * oracle verifies the metadata/partition/frame arithmetic. */
object MultimodalQueries extends QueryModule {

  private val q70 = QueryDef(
    "q70_multimodal_meta",
    (s, d) => {
      val media = Tables.documents(s, d)
        .filter(col("doc_id") <= 300)
        .select(
          col("doc_id").as("media_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("modality"),
          col("text").cast("binary").as("media"))
      val withMeta = Multimodal.attachMeta(media, "media",
        when(col("modality") === "image", "png")
          .when(col("modality") === "audio", "wav")
          .otherwise("mp4"))
        .withColumn("size_class", Multimodal.sizeClass(col("media")))
        .withColumn("n_frames",
          size(Multimodal.sampleFrames(col("media"), frameBytes = 64, stride = 2)))
      // real decode attempt (ImageIODecoder): these payloads are text
      // bytes, so dims resolve to the -1 sentinel — the decoder path runs
      // for real in the gate; MultimodalSpec covers actual PNG decoding
      Multimodal.attachImageDims(withMeta, "media")
        .select(col("media_id"), col("modality"),
          col("meta.format").as("format"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.sha256").as("sha256"),
          col("size_class"), col("n_frames"),
          col("width"), col("height"))
        .orderBy(col("media_id"))
    },
    Some("""
      WITH media AS (
        SELECT doc_id AS media_id,
               ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
               encode(text) AS media, text
        FROM documents WHERE doc_id <= 300)
      SELECT media_id, modality,
             CASE modality WHEN 'image' THEN 'png' WHEN 'audio' THEN 'wav' ELSE 'mp4' END AS format,
             octet_length(media)::BIGINT AS n_bytes,
             lower(sha256(text)) AS sha256,
             floor(log2(greatest(octet_length(media), 1)))::INT AS size_class,
             -- frames of 64 bytes, keep every 2nd (ceil(n/64) frames, indices 0,2,4,..)
             ((ceil(octet_length(media) / 64.0)::INT + 1) // 2)::INT AS n_frames,
             -- text payloads are not decodable images → the -1 sentinel
             -1::INT AS width, -1::INT AS height
      FROM media
      ORDER BY media_id"""))

  /** Exact payload dedup by content hash
    * ([[Multimodal.payloadDedup]]): byte-identical media collapse per
    * modality, with the wasted-copy bytes totaled — the first pass of a
    * media curation pipeline. Payloads are the q70 stand-in binaries
    * (documents.text re-encoded), and this synthetic corpus genuinely
    * contains duplicate documents, so the dedup numbers are non-trivial.
    * The oracle replays the hashing (DuckDB sha256 over the same bytes),
    * both aggregates, and the byte math. */
  private val q144 = QueryDef(
    "q144_payload_dedup",
    (s, d) => {
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("media"))
      Multimodal.payloadDedup(media, "media_id", "media", Seq("modality"))
        .orderBy(col("modality"))
    },
    Some("""
      WITH media AS (
        SELECT doc_id AS media_id,
               ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
               encode(text) AS media, text
        FROM documents),
      per_hash AS (
        SELECT modality, lower(sha256(text)) AS sha256,
               max(octet_length(media))::BIGINT AS n_bytes,
               count(*) AS n_copies,
               min(media_id) AS keeper_id
        FROM media GROUP BY modality, lower(sha256(text)))
      SELECT modality,
             CAST(sum(n_copies) AS BIGINT) AS n_media,
             count(*) AS n_distinct_payloads,
             CAST(sum((n_copies - 1) * n_bytes) AS BIGINT) AS dup_bytes
      FROM per_hash GROUP BY modality
      ORDER BY modality"""))

  override val entries: Seq[QueryDef] = Seq(q70, q144)
}
