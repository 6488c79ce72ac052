package graft.ops

import org.apache.spark.sql.functions._
import graft.ops.H._
import graft.streaming.Streams
import graft.multimodal.Multimodal

/** Streaming twins + multimodal queries (SURVEY.md §2C north stars).
  * Streaming results are produced by real Structured Streaming runs
  * (readStream → watermark → windowed state → memory sink) replayed to
  * completion, so they remain oracle-comparable batch tables.
  */
object Extras {

  /** The stub decoder's payload fold in DuckDB terms: mod-1e9+7 rolling
    * hash over the text bytes (ASCII ⇒ ascii(char) == byte), starting
    * from the same seed residue as Multimodal.stubDecode. (Declared
    * before `qs` — the query seq interpolates it at init.)
    */
  // empty text guard: DuckDB string_split('', '') is [''] (one element,
  // ascii 0) while the byte fold does ZERO iterations — without the
  // CASE an empty doc would diverge by one fold step
  private val mmFoldSql =
    """CASE WHEN length(text) = 0 THEN CAST(1125899906842597 % 1000000007 AS BIGINT)
       ELSE list_reduce(list_prepend(CAST(1125899906842597 % 1000000007 AS BIGINT),
         list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (a, x) -> (a * 31 + x) % 1000000007) END"""

  val qs: Seq[Q] = Seq(

    Q("q_stream_tumble",
      Some(s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events)
               SELECT time_bucket(INTERVAL '10 minutes', ts) AS ws,
                      time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS we,
                      count(*) AS n, ${oSum("value")} AS sum_value
               FROM e GROUP BY 1, 2 ORDER BY 1"""),
      (s, dir) => Streams.tumblingCounts(s, dir)),

    // Spark session_window semantics: a session closes when the next
    // event is >= gap away (events < gap apart merge), matching the
    // >= in the oracle's gap flag.
    Q("q_stream_session",
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
                   g AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                                        THEN 1 ELSE 0 END AS is_new
                         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
                   s AS (SELECT *, SUM(is_new) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid FROM g),
                   sess AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY 1, 2)
              SELECT user_id, count(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events
              FROM sess GROUP BY 1 ORDER BY 1"""),
      (s, dir) => Streams.sessionCounts(s, dir)),

    Q("q_stream_stateful",
      Some("""WITH e AS (SELECT user_id FROM events)
              SELECT user_id, count(*) AS n_events FROM e GROUP BY 1 ORDER BY 1"""),
      (s, dir) => Streams.statefulUserCounts(s, dir).select("user_id", "n_events")),

    // The §2B-declared q_stream_rate: tumbling windows in APPEND mode —
    // only watermark-closed windows emit (the unbounded-safe mode), so
    // the finite replay equals the batch windows ending <= max(ts) - 1h.
    Q("q_stream_rate",
      Some(s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
                    m AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM e)
               SELECT time_bucket(INTERVAL '10 minutes', ts) AS ws,
                      time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS we,
                      count(*) AS n, ${oSum("value")} AS sum_value
               FROM e, m
               GROUP BY 1, 2 HAVING we <= (SELECT wm FROM m) ORDER BY 1"""),
      (s, dir) => Streams.tumblingCountsAppend(s, dir)),

    // Streaming exact dedup (dropDuplicates + watermark, RocksDB state):
    // output is the distinct key set, so the batch oracle is DISTINCT.
    Q("q_stream_dedup",
      Some("""SELECT DISTINCT user_id, event_type FROM events
              ORDER BY user_id, event_type"""),
      (s, dir) => Streams.dedupKeys(s, dir)),

    // Stream⋈static dimension enrichment: the static dim is broadcast
    // once, never re-shuffled per micro-batch.
    Q("q_stream_join",
      Some(s"""SELECT c_mktsegment, count(*) AS n, ${oSum("value")} AS sum_value
               FROM events JOIN customer ON user_id = c_custkey
               GROUP BY 1 ORDER BY 1"""),
      (s, dir) => Streams.enrichedSegmentCounts(s, dir)),

    // Stream⋈stream interval join with two-sided watermarks (bounded
    // join state): click→purchase attribution inside 30 minutes.
    Q("q_stream_sjoin",
      Some("""SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id
              FROM events c JOIN events b
                ON c.user_id = b.user_id
               AND c.event_type = 'click' AND b.event_type = 'purchase'
               AND CAST(b.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
               AND CAST(b.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
              ORDER BY c.user_id, click_id, buy_id"""),
      (s, dir) => Streams.clickPurchaseAttribution(s, dir)),

    // LEFT OUTER stream⋈stream: unmatched clicks emit null buy ids only
    // after watermark-driven state eviction; the oracle restricts
    // unmatched rows to those whose 30-min match window closed before
    // the terminal GLOBAL watermark — which is the MIN of the two
    // sides' watermarks (each side's max event time - 1 h; the
    // multipleWatermarkPolicy default), not the table-wide max. Clicks
    // newer than that are still in state when the replay ends,
    // correctly unemitted.
    Q("q_stream_sjoin_left",
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
                                CAST(ts AS TIMESTAMP) AS ts FROM events),
                   -- Spark's EventTimeStats floors event times to
                   -- MILLISECONDS before tracking the max, so the
                   -- watermark mirror must truncate the same way or a
                   -- click whose window ends inside the sub-ms gap
                   -- diverges
                   wm AS (SELECT least(
                            (SELECT date_trunc('milliseconds', max(ts))
                             FROM e WHERE event_type = 'click'),
                            (SELECT date_trunc('milliseconds', max(ts))
                             FROM e WHERE event_type = 'purchase'))
                          - INTERVAL 1 HOUR AS w),
                   c AS (SELECT user_id, event_id AS click_id, ts
                         FROM e WHERE event_type = 'click'),
                   b AS (SELECT user_id AS bu, event_id AS buy_id, ts AS bts
                         FROM e WHERE event_type = 'purchase'),
                   j AS (SELECT c.user_id, c.click_id, b.buy_id, c.ts
                         FROM c LEFT JOIN b
                           ON c.user_id = b.bu AND b.bts >= c.ts
                          AND b.bts <= c.ts + INTERVAL 30 MINUTE)
              SELECT user_id, click_id, buy_id FROM j, wm
              WHERE buy_id IS NOT NULL OR ts + INTERVAL 30 MINUTE < wm.w
              ORDER BY user_id, click_id, buy_id NULLS FIRST"""),
      (s, dir) => Streams.clickPurchaseAttributionLeft(s, dir)),

    // Streaming incremental dedup: the 10% increment arrives as three
    // files -> three micro-batches, each shingled+signed and joined
    // against the ONCE-BUILT corpus band index (never re-signed), pairs
    // landing exactly-once per batch partition. Same exact-pair oracle
    // as the batch q_dedup_incr: batch boundaries cannot change the
    // union (each doc is in one batch; pairs are corpus-vs-new only).
    Q("q_stream_dedup_incr", Some(Pipeline.incrOracle),
      (s, dir) => {
        // memoized under a key naming this exact parameterization
        // (stream-incr glob, corpus band index, threshold 0.5): the
        // finite replay is deterministic, so one (session, dir) run
        // serves the loaded pass, the unloaded re-run, and Verify alike
        Streams.persistedOp(s, dir, "dedup_incr_t05", 1,
            Seq(Sources.ensureStreamIncr(s, dir), s"$dir/documents.parquet")) {
          val glob = Sources.ensureStreamIncr(s, dir) + "/s*"
          val (index, corpusSh) = Pipeline.corpusBandsSh(s, dir)
          Streams.incrementalDedupReplay(s, glob,
              t(s, dir, "documents").schema, "doc_id", "text",
              corpusSh = corpusSh,
              corpusBands = index, threshold = 0.5)
        }.orderBy("doc_a", "doc_b")
      }),

    // Streaming incremental SEMANTIC dedup: the 5% embedding increment
    // arrives as three ascending-id files -> three micro-batches, each
    // run through semanticDedupIncrement against the ONCE-BUILT corpus
    // cell index plus the previously-processed newcomers (exactly-once
    // partitions for survivors AND the _seen fold). Same oracle as the
    // batch q_dedup_semantic_incr — ascending-id arrival makes the
    // batch-union equal the one-shot result by construction.
    Q("q_stream_sem_incr", Some(Pipeline.semIncrOracle),
      (s, dir) => {
        Streams.persistedOp(s, dir, "sem_incr_t035", 1,
            Seq(Sources.ensureStreamSemIncr(s, dir),
              s"$dir/embeddings.parquet")) {
          val glob = Sources.ensureStreamSemIncr(s, dir) + "/s*"
          import s.implicits._
          val cents = Pipeline.kmeansCents(s, dir).toDF("vec_id", "embedding")
          val emb = t(s, dir, "embeddings")
          val corpusIdx = graft.api.Similarity.ivfIndex(
            emb.filter(col("vec_id") % 20 =!= 0), cents,
            "vec_id", "embedding")
          Streams.semanticDedupReplay(s, glob,
            emb.select("vec_id", "embedding").schema, "vec_id", "embedding",
            corpusIdx, cents, threshold = 0.35)
        }.orderBy("vec_id")
      }),

    // Streaming incremental paragraph dedup: three ascending-id arrival
    // files cut per micro-batch against the frozen corpus segment-hash
    // index plus all earlier batches' hashes (the _seen fold), outputs
    // exactly-once per batch — the union equals the one-shot batch
    // result, so q_dedup_paragraph_incr's oracle applies VERBATIM.
    Q("q_stream_par_incr", Some(Pipeline.parIncrOracle),
      (s, dir) => {
        Streams.persistedOp(s, dir, "par_incr_seg15", 1,
            Seq(Sources.ensureStreamParIncr(s, dir),
              s"$dir/documents.parquet")) {
          val glob = Sources.ensureStreamParIncr(s, dir) + "/s*"
          val docs = t(s, dir, "documents")
          // the replay folds its _seen set over the PERSISTED corpus
          // index — the same attach-don't-rebuild side the batch
          // incremental query uses
          Streams.segmentDedupReplay(s, glob,
            docs.select("doc_id", "text").schema, "doc_id", "text",
            Pipeline.corpusSegIndex(s, dir), segTokens = 15)
        }.orderBy("doc_id")
      }),

    // Count-min sketch as streaming state: the 10% increment streams in
    // three micro-batches and the running (seed, bucket) aggregation IS
    // the sketch — bounded at depth x width rows regardless of volume,
    // the state-boundedness a streaming frequency sketch exists for.
    // Final estimates equal the batch sketch over the same slice, so
    // the same auditable DuckDB oracle applies.
    Q("q_stream_cms", Some(Pipeline.cmsOracleFor("WHERE doc_id % 10 = 0")),
      (s, dir) => {
        val sk = Streams.persistedOp(s, dir, "cms_incr_default", 1,
            Seq(Sources.ensureStreamIncr(s, dir))) {
          val glob = Sources.ensureStreamIncr(s, dir) + "/s*"
          Streams.cmsSketchStream(s, glob,
            t(s, dir, "documents").schema, "text",
            Pipeline.CmsDepth, Pipeline.CmsWidth)
        }
        graft.api.Sketches.cmsEstimate(sk, Pipeline.CmsTerms,
          Pipeline.CmsDepth, Pipeline.CmsWidth)
      }),

    // Bucketed co-located join: both fact sides pre-bucketed on the join
    // key → zero-exchange SortMergeJoin (plan pinned by BucketingSpec);
    // results identical to the plain join the oracle runs.
    Q("q_join_bucketed",
      Some(s"""SELECT c_mktsegment, count(*) AS n,
                      ${oSum("o_totalprice")} AS revenue
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY 1 ORDER BY 1"""),
      (s, dir) => graft.api.Bucketing.colocatedOrdersCustomer(s, dir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")),

    // Aggregation on the bucket key: scan already satisfies the required
    // clustering → single-stage agg, no exchange.
    Q("q_agg_bucketed",
      Some(s"""SELECT o_custkey, count(*) AS n_orders,
                      ${oSum("o_totalprice")} AS total
               FROM orders GROUP BY 1 ORDER BY 1"""),
      (s, dir) => graft.api.Bucketing.bucketedAgg(s, dir)
        .orderBy("o_custkey")),

    // Payload metadata is exact column algebra (byte length, content
    // hash) → oracle-checked; the payload bytes are UTF-8 of `text`, so
    // DuckDB's sha256(text) equals Spark's sha2(payload, 256).
    Q("q_mm_meta",
      Some("""SELECT doc_id,
                     CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                     sha256(text) AS content_hash,
                     CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                          WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type
              FROM documents ORDER BY doc_id"""),
      (s, dir) => Multimodal.withPayload(t(s, dir, "documents"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          sha2(col("payload"), 256).as("content_hash"),
          col("media_type"))
        .orderBy("doc_id")),

    // REAL video container path with a full oracle: each doc's columns
    // parameterize a genuine ISO-BMFF build (ftyp/moov/trak/mdhd/stsz
    // boxes), which Spark parses back through the real Mp4Codec
    // header-only box walk — the video twin of q_mm_audio_energy. The
    // oracle recomputes the expected metadata from the same columns;
    // any parse defect breaks the hash.
    Q("q_mm_video_meta",
      Some("""SELECT doc_id,
                     CAST(16 + (doc_id % 240) * 8 AS BIGINT) AS width,
                     CAST(16 + (n_chars % 135) * 8 AS BIGINT) AS height,
                     CAST(1 + (n_chars % 240) AS BIGINT) AS n_frames,
                     CAST((1 + (n_chars % 240)) * 25 * 1000 // 600
                       AS BIGINT) AS duration_ms
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
              ORDER BY doc_id"""),
      (s, dir) => Multimodal.videoMetaFromCols(s, t(s, dir, "documents"),
        "doc_id", "n_chars")
        .toDF()
        .orderBy("doc_id")),

    // Codec identification through the real stsd box walk: per-row
    // fourcc (id mod 4) round-tripped through genuine container
    // construction + parse, with a leading "mp4a" audio trak the walk
    // must skip. Oracle recomputes the fourcc from the id arithmetic.
    Q("q_mm_video_codec",
      Some("""SELECT doc_id,
                     CASE doc_id % 4 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
                                     WHEN 2 THEN 'mp4v' ELSE 'av01'
                     END AS codec,
                     CAST(16 + (doc_id % 240) * 8 AS BIGINT) AS width,
                     CAST(16 + (n_chars % 135) * 8 AS BIGINT) AS height
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
              ORDER BY doc_id"""),
      (s, dir) => Multimodal.videoCodecFromCols(s, t(s, dir, "documents"),
        "doc_id", "n_chars")
        .toDF()
        .orderBy("doc_id")),

    // The three stub-decode queries carry FULL DuckDB oracles: the stub
    // fold is wrap-free mod-1e9+7 arithmetic over the payload bytes
    // (pure-ASCII text, so bytes == ascii(char)), and the oracle
    // replays dims, thumbnails, and frame expansion in plain SQL —
    // pinning the multimodal batch plumbing cross-engine. Int fields
    // normalize to BIGINT on both sides.
    Q("q_mm_decode",
      Some(s"""WITH h AS (SELECT doc_id, $mmFoldSql AS hv,
                                 CAST(length(text) AS BIGINT) AS n_bytes
                          FROM documents)
               SELECT doc_id,
                      CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                           WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type,
                      n_bytes,
                      CAST(64 + hv % 1024 AS BIGINT) AS width,
                      CAST(64 + (hv >> 10) % 1024 AS BIGINT) AS height,
                      CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + (hv >> 20) % 240
                                ELSE 1 END AS BIGINT) AS n_frames
               FROM h ORDER BY doc_id"""),
      (s, dir) => Multimodal.decodeMeta(s, t(s, dir, "documents"))
        .toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy("doc_id")),

    Q("q_mm_resize",
      Some(s"""WITH h AS (SELECT doc_id, text, $mmFoldSql AS hv FROM documents),
                    d AS (SELECT doc_id, text, 64 + hv % 1024 AS w,
                                 64 + (hv >> 10) % 1024 AS ht FROM h),
                    sc AS (SELECT doc_id, text, w, ht,
                                  CASE WHEN greatest(w, ht) <= 128 THEN 1.0
                                       ELSE 128.0 / greatest(w, ht) END AS scale
                           FROM d)
               SELECT doc_id,
                      CAST(greatest(1, FLOOR(w * scale)) AS BIGINT) AS width,
                      CAST(greatest(1, FLOOR(ht * scale)) AS BIGINT) AS height,
                      hex(encode(substr(text, 1, 64))) AS thumb
               FROM sc ORDER BY doc_id"""),
      (s, dir) => Multimodal.resize(s, t(s, dir, "documents"), maxDim = 128)
        .toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          // hex-project the payload: byte content stays pinned, and the
          // driver harness can sort+hash a string where raw binary cannot
          hex(col("thumb")).as("thumb"))
        .orderBy("doc_id")),

    // frame indices come from a STATIC range(0, 240) anti-aliased by
    // i < frames (DuckDB 1.0 can't lateral-range over a column)
    Q("q_mm_frames",
      Some(s"""WITH h AS (SELECT doc_id, text, $mmFoldSql AS hv FROM documents
                          WHERE doc_id % 3 = 2),
                    v AS (SELECT doc_id, text, 1 + (hv >> 20) % 240 AS frames,
                                 length(text) AS len FROM h)
               SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
                      hex(encode(substr(text,
                        CAST((i % greatest(1, len)) + 1 AS INT), 16))) AS frame
               FROM v JOIN range(0, 240) t(i)
                 ON i < frames AND i % 30 = 0
               ORDER BY doc_id, frame_idx"""),
      (s, dir) => Multimodal.frameSample(s, t(s, dir, "documents"), everyK = 30)
        .toDF()
        .select(col("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          hex(col("frame")).as("frame"))
        .orderBy("doc_id", "frame_idx")),

    // REAL audio path with a full oracle: each doc's UTF-8 bytes become
    // the PCM16 stream of a genuine RIFF/WAVE payload, which Spark
    // parses back through WavCodec (container walk + sample decode);
    // the oracle replays the same little-endian byte-pair arithmetic
    // from the text column (corpus is ASCII, so ascii(char) == byte).
    // All-integer outputs — engine- and partitioning-exact.
    // REAL audio header walk with a full oracle: the text bytes become
    // a genuine mono 8 kHz PCM16 WAV (blockAlign 2, pcm truncated to
    // whole frames), WavCodec.header parses it back, and every field is
    // exact arithmetic over length(text) — ASCII corpus, chars==bytes.
    Q("q_mm_audio_meta",
      Some("""WITH d AS (SELECT doc_id,
                                length(text) - length(text) % 2 AS pcm
                         FROM documents)
              SELECT doc_id,
                     CAST(44 + pcm AS BIGINT) AS n_bytes,
                     CAST(8000 AS INT) AS sample_rate,
                     CAST(1 AS INT) AS channels,
                     CAST(16 AS INT) AS bits_per_sample,
                     CAST(pcm // 2 AS BIGINT) AS n_frames,
                     CAST((pcm // 2) * 1000 // 8000 AS BIGINT) AS duration_ms
              FROM d ORDER BY doc_id"""),
      (s, dir) => Multimodal.audioMetaFromText(s, t(s, dir, "documents"),
        "doc_id", "text")
        .toDF()
        .orderBy("doc_id")),

    Q("q_mm_audio_energy",
      Some("""WITH d AS (SELECT doc_id, text,
                                length(text) // 2 AS ns
                         FROM documents),
                   i AS (SELECT doc_id, text, unnest(range(0, ns)) AS k FROM d),
                   sm AS (SELECT doc_id, k,
                                 ascii(substr(text, CAST(2 * k + 1 AS INT), 1))
                                 + 256 * ascii(substr(text, CAST(2 * k + 2 AS INT), 1)) AS v
                          FROM i),
                   sg AS (SELECT doc_id, k,
                                 CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
                          FROM sm)
              SELECT doc_id, CAST(k // 256 AS INT) AS win_idx,
                     CAST(SUM(s * s) AS BIGINT) AS sum_sq,
                     CAST(MAX(abs(s)) AS INT) AS peak,
                     CAST(count(*) AS INT) AS n_samples
              FROM sg GROUP BY 1, 2 ORDER BY doc_id, win_idx"""),
      (s, dir) => Multimodal.audioEnergyFromText(s, t(s, dir, "documents"),
        "doc_id", "text", windowFrames = 256)
        .toDF()
        .orderBy("doc_id", "win_idx"))
  )
}
