package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (north star / SURVEY.md §2.M): opaque
  * binary payloads + typed metadata, with a feature-extraction stage.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (byte statistics standing in for
  * pixel/sample features); everything around it — binary column handling,
  * schema, typed Dataset pipeline, per-partition batch shape, partition-
  * local execution — is real and tested. At 100 TB the blobs live in
  * parquet binary columns co-partitioned with their metadata; decode is
  * a mapPartitions stage that never shuffles.
  */
object Multimodal {

  /** Case-class row for the typed decode pipeline. */
  final case class MediaRow(doc_id: Long, blob: Array[Byte], mime: String)
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, byte_sum: Long, first_byte: Int,
      entropy_ish: Double)

  /** Metadata projection over the binary payload — oracle-checkable
    * (md5 of the blob == md5 of the utf-8 text on the DuckDB side). */
  val qMmMeta: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        col("text").cast("binary").as("blob"),
        lit("text/plain").as("mime"))
      .select(col("doc_id"), col("mime"),
        length(col("blob")).as("n_bytes"),
        md5(col("blob")).as("checksum"))
      .orderBy(col("doc_id"))
  }

  /** Typed mapPartitions decode stage. The real system would decode
    * image/audio bytes here (codec library per executor, reused across
    * the partition's rows); the stub derives deterministic pseudo-
    * features from the bytes so the pipeline shape is fully testable.
    * Exposed as a Dataset so MultimodalSpec can assert the entropy
    * column directly (entropy has no SQL twin; the other byte stats are
    * DuckDB-oracled through q_mm_features). */
  def mmFeatures(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.Dataset[MediaFeatures] = {
    val spark = s
    import spark.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        col("text").cast("binary").as("blob"),
        lit("text/plain").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // STUB DECODE: stands in for e.g. JPEG decode + feature extract.
        // Deterministic byte statistics keep the contract testable.
        rows.map { m =>
          val bytes = m.blob
          var sum = 0L
          val hist = new Array[Long](256)
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            sum += b
            hist(b) += 1
            i += 1
          }
          var ent = 0.0
          var j = 0
          while (j < 256) {
            if (hist(j) > 0) {
              val p = hist(j).toDouble / bytes.length
              ent -= p * math.log(p)
            }
            j += 1
          }
          MediaFeatures(m.doc_id, bytes.length, sum,
            if (bytes.nonEmpty) bytes(0) & 0xff else -1,
            math.round(ent * 1e6) / 1e6)
        }
      }
  }

  /** Oracle-checkable projection of the decode stage: every column is an
    * exact integer byte statistic DuckDB can recompute from the utf-8
    * text (the fixture is pure ASCII, so char codes == bytes). */
  val qMmFeatures: Q = (s, dir) =>
    mmFeatures(s, dir).toDF()
      .select(col("doc_id"), col("n_bytes"), col("byte_sum"),
        col("first_byte"))
      .orderBy(col("doc_id"))

  /** Frame sampling + resize (the video/image decode analogues on the
    * stub payload): each blob splits into fixed 64-byte frames
    * (generator fan-out, no shuffle), each frame is checksummed and
    * "resized" by 2:1 byte decimation — the per-frame mapPartitions
    * shape a video pipeline runs, with deterministic byte ops standing
    * in for the codec. Fully DuckDB-oracled via substring arithmetic. */
  val qMmFrames: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(expr(
          """transform(sequence(0, CAST(ceil(length(text) / 64.0) AS INT) - 1),
             i -> substring(text, i * 64 + 1, 64))""")))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")
      .select(col("doc_id"), col("frame_no"),
        length(col("frame")).as("frame_len"),
        md5(col("frame").cast("binary")).as("frame_md5"),
        md5(expr(
          """concat_ws('', transform(sequence(1, length(frame), 2),
             j -> substring(frame, j, 1)))""").cast("binary"))
          .as("resized_md5"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** Frame-fingerprint near-dup (the video/image dedup shape: two
    * assets are near-dups when they share many frame checksums —
    * Manku-style fingerprint containment over the decode stub's
    * 64-byte frames). Inverted-index join on the frame hash with the
    * same df-cap discipline as the jaccard shingle join (a boilerplate
    * frame shared by >100 assets is dropped BEFORE the self-join, so
    * no hot-key quadratic blowup at corpus scale); containment =
    * shared / min(frames) as an exact int ratio. */
  val qMmFrameDup: Q = (s, dir) => {
    val frames = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, CAST(ceil(length(text) / 64.0) AS INT) - 1),
           i -> substring(text, i * 64 + 1, 64))""")).as("frame"))
      .select(col("doc_id"), md5(col("frame").cast("binary")).as("fh"))
      .distinct()
    val hot = frames.groupBy(col("fh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 100).select(col("fh"))
    val fr = frames.join(hot, Seq("fh"), "left_anti")
    val sizes = fr.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = fr.as("a").join(fr.as("b"),
        col("a.fh") === col("b.fh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(col("shared") >= 3)
      .select(col("da"), col("db"), col("shared"),
        (col("shared").cast("double") /
          least(col("na"), col("nb")).cast("double")).as("containment"))
      .orderBy(col("da"), col("db"))
  }

  val queries: Map[String, Q] = Map(
    "q_mm_framedup" -> qMmFrameDup,
    "q_mm_meta" -> qMmMeta,
    "q_mm_features" -> qMmFeatures,
    "q_mm_frames" -> qMmFrames)

  val oracle: Map[String, String] = Map(
    "q_mm_framedup" -> """
      WITH f0 AS (
        SELECT doc_id, text,
          unnest(range(0, CAST(ceil(len(text) / 64.0) AS BIGINT))) AS i
        FROM documents),
      fr0 AS (
        SELECT DISTINCT doc_id,
          md5(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS fh
        FROM f0),
      keep AS (SELECT fh FROM fr0 GROUP BY fh HAVING count(*) <= 100),
      fr AS (SELECT fr0.doc_id, fr0.fh FROM fr0 JOIN keep USING (fh)),
      sizes AS (SELECT doc_id, count(*) AS n FROM fr GROUP BY doc_id),
      shared AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
        FROM fr a JOIN fr b ON a.fh = b.fh AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT da, db, shared,
        CAST(shared AS DOUBLE) / least(sa.n, sb.n) AS containment
      FROM shared
      JOIN sizes sa ON da = sa.doc_id
      JOIN sizes sb ON db = sb.doc_id
      WHERE shared >= 3
      ORDER BY da, db""",
    "q_mm_meta" -> """
      SELECT doc_id, 'text/plain' AS mime,
        CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        md5(text) AS checksum
      FROM documents ORDER BY doc_id""",
    "q_mm_features" -> """
      SELECT doc_id,
        CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        CAST(coalesce(list_sum(list_transform(string_split(text, ''),
          c -> unicode(c))), 0) AS BIGINT) AS byte_sum,
        CAST(CASE WHEN len(text) = 0 THEN -1
                  ELSE ascii(substr(text, 1, 1)) END AS INT) AS first_byte
      FROM documents ORDER BY doc_id""",
    "q_mm_frames" -> """
      WITH f0 AS (
        SELECT doc_id, text,
          unnest(range(0, CAST(ceil(len(text) / 64.0) AS BIGINT))) AS i
        FROM documents),
      f AS (
        SELECT doc_id, CAST(i AS INT) AS frame_no,
          substr(text, CAST(i * 64 + 1 AS INT), 64) AS frame
        FROM f0)
      SELECT doc_id, frame_no,
        CAST(len(frame) AS INT) AS frame_len,
        md5(frame) AS frame_md5,
        md5(array_to_string(list_transform(
          range(1, len(frame) + 1, 2),
          j -> substr(frame, CAST(j AS INT), 1)), '')) AS resized_md5
      FROM f ORDER BY doc_id, frame_no""")
}
