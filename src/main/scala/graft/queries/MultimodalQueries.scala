package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal plumbing: build a deterministic binary media
  * table from `documents` (utf-8 payloads — the fixture bytes), run the real
  * `mapPartitions` decode stage with [[Multimodal.PortableCodec]], and the
  * resize-metadata stage on top. The DuckDB oracle recomputes the same
  * md5-derived dimensions and byte-moment feature directly from the text
  * (the fixture is pure ASCII, so `ascii(substring(text, j, 1))` IS byte
  * j-1 of the payload).
  *
  * This makes the binary-column path — schema, per-partition batch decode,
  * narrow metadata transforms — subject to the same rows/schema/hash gate
  * as every other operator family, not just engine tests.
  */
object MultimodalQueries {

  /** mm_decode_meta — decode + resize metadata for every document-derived
    * media blob: (media_id, kind, n_bytes, width, height, f0, out_width,
    * out_height).
    */
  def decodeMeta(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3).cast("int") + 1)
    val media = Multimodal.mediaFromText(docs, "doc_id", "text", kind, "documents")
    // n_bytes rides through the decode as a passthrough column — no
    // media-sized re-join to recover metadata the frame already had
    val decoded = Multimodal.decode(media, Multimodal.PortableCodec,
      passthrough = Seq(col("meta.n_bytes").as("n_bytes")))
    val resized = Multimodal.resizeMeta(decoded, 256)
    resized
      .select(col("media_id"), col("kind"), col("n_bytes"),
              col("width"), col("height"),
              round(element_at(col("feature"), 1), 4).as("f0"),
              col("out_width"), col("out_height"))
      .orderBy("media_id")
  }

  /** mm_frame_sample — video-kind blobs as 16-byte frames, every 4th frame
    * sampled, per-frame byte-mean feature: (media_id, frame_idx, n_frames,
    * f_mean). The frame fan-out runs in the same per-partition batch shape
    * as the decode stage; the oracle recomputes each sampled frame's mean
    * from the same bytes via `ascii(substring(...))` (ASCII fixture).
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") % 3 === 2)
    val media = Multimodal.mediaFromText(docs, "doc_id", "text", "video", "documents")
    Multimodal.frameFeatures(media, frameBytes = 16, stride = 4)
      .select(col("media_id"), col("frame_idx"), col("n_frames"),
              round(col("f_mean"), 4).as("f_mean"))
      .orderBy("media_id", "frame_idx")
  }

  /** mm_phash_pairs — perceptual-hash near-dup pairs over the media table:
    * every blob gets a 60-bit byte-stripe aHash ([[Multimodal.ahash]], the
    * mapPartitions codec path), and pairs within Hamming distance 3 come
    * from the SAME pigeonhole band blocking the simhash path uses
    * ([[graft.operators.Dedup.hammingPairs]], 4 bands × 15 bits) — the
    * multimodal member of the dedup family: 8-byte fingerprints instead of
    * payload comparisons, band equi-join instead of all pairs, one
    * codegen'd bit_count(xor) per candidate. 60 bits (not a toy 16/32)
    * deliberately: at corpus scale a b-bit fingerprint produces
    * ~n²·V(b,3)/2^(b+1) birthday-accident pairs (V = Hamming-ball volume);
    * 32 bits would drown 500k blobs in ~10⁵ random collisions where 60
    * bits keeps the expected accident count below 10⁻⁵ — the same width
    * the simhash family uses, for the same reason.
    */
  def phashPairs(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromText(
      Tables.documents(s, d), "doc_id", "text", "image", "documents")
    // hashes feed three consumers (band explode + both verify joins);
    // each re-read would re-run the byte-level decode over the corpus
    val hashes = Multimodal.ahash(media, 60)
      .filter(col("n_bytes") > 0).localCheckpoint(true)
    graft.operators.Dedup.hammingPairs(hashes, "media_id", "ahash",
        bits = 60, nBands = 4, maxHamming = 3)
      .select(col("a").as("media_a"), col("b").as("media_b"), col("hamming"))
      .orderBy("media_a", "media_b")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> (decodeMeta _),
    "mm_frame_sample" -> (frameSample _),
    "mm_phash_pairs" -> (phashPairs _),
  )

  val oracle: Map[String, String] = Map(
    "mm_decode_meta" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |         text, length(text) AS n
        |  FROM documents),
        |f AS (
        |  SELECT media_id, kind, CAST(n AS BIGINT) AS n_bytes,
        |    CAST(64 + CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) % 960 AS INTEGER) AS width,
        |    CAST(64 + CAST('0x' || substring(md5(text), 9, 8) AS BIGINT) % 960 AS INTEGER) AS height,
        |    CASE WHEN n = 0 THEN 0.0 ELSE
        |      round(list_sum(list_transform(range(1, n + 1),
        |        j -> CASE WHEN (j - 1) % 8 = 0
        |                  THEN ascii(substring(text, CAST(j AS INTEGER), 1))
        |                  ELSE 0 END)) / n, 4) END AS f0
        |  FROM m)
        |SELECT media_id, kind, n_bytes, width, height, f0,
        |  CAST(ceil(width * least(1.0, 256.0 / greatest(width, height))) AS INTEGER) AS out_width,
        |  CAST(ceil(height * least(1.0, 256.0 / greatest(width, height))) AS INTEGER) AS out_height
        |FROM f ORDER BY media_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT media_id, text, CAST(n // 16 AS BIGINT) AS n_frames
        |  FROM m WHERE n >= 16),
        |idx AS (
        |  SELECT media_id, text, n_frames,
        |         CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx
        |  FROM fr)
        |SELECT media_id, frame_idx, n_frames,
        |  round(list_sum(list_transform(range(1, 17),
        |    j -> ascii(substring(text, CAST(frame_idx * 16 + j AS INTEGER), 1))))
        |    / 16.0, 4) AS f_mean
        |FROM idx ORDER BY media_id, frame_idx""".stripMargin,
    "mm_phash_pairs" ->
      // replays the byte-stripe aHash (exact integer cross-product
      // threshold — no float mean) and the 4x15-bit pigeonhole banding;
      // ascii(substring(...)) IS byte j-1 of the utf-8 payload because the
      // fixture is pure ASCII (same contract as mm_decode_meta)
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, CAST(length(text) AS BIGINT) AS n
        |  FROM documents WHERE length(text) > 0),
        |p AS (SELECT media_id, n, text, unnest(range(1, n + 1)) AS j FROM m),
        |v AS (SELECT media_id, n, CAST((j - 1) % 60 AS INTEGER) AS stripe,
        |        CAST(ascii(substring(text, CAST(j AS INTEGER), 1)) AS BIGINT) AS b
        |      FROM p),
        |st AS (SELECT media_id, n, stripe,
        |         CAST(sum(b) AS BIGINT) AS ssum, CAST(count(*) AS BIGINT) AS scnt
        |       FROM v GROUP BY media_id, n, stripe),
        |tot AS (SELECT media_id, CAST(sum(b) AS BIGINT) AS total
        |        FROM v GROUP BY media_id),
        |h AS (SELECT st.media_id,
        |        CAST(sum(CASE WHEN st.ssum * st.n > tot.total * st.scnt
        |                      THEN (CAST(1 AS BIGINT) << st.stripe) ELSE 0 END) AS BIGINT) AS ahash
        |      FROM st JOIN tot USING (media_id) GROUP BY st.media_id),
        |bl AS (SELECT media_id, (ahash >> CAST(15 * j AS INTEGER)) & 32767 AS bv, j
        |       FROM h, range(0, 4) AS r(j)),
        |cand AS (SELECT DISTINCT x.media_id AS a, y.media_id AS b
        |         FROM bl x JOIN bl y
        |           ON x.j = y.j AND x.bv = y.bv AND x.media_id < y.media_id)
        |SELECT c.a AS media_a, c.b AS media_b,
        |  CAST(bit_count(xor(ha.ahash, hb.ahash)) AS INTEGER) AS hamming
        |FROM cand c
        |JOIN h ha ON c.a = ha.media_id
        |JOIN h hb ON c.b = hb.media_id
        |WHERE bit_count(xor(ha.ahash, hb.ahash)) <= 3
        |ORDER BY media_a, media_b""".stripMargin,
  )
}
