package graft

/** DuckDB oracle SQL — multimodal codecs + WARC/JSONL round-trips.
  * Split verbatim out of SparkEntry.baseOracleSql in r14; graded
  * against the Spark queries by the driver's sorted-column hash.
  */
private[graft] object OraclesMultimodalQ {
  import OracleDsl._

  val sql: Map[String, String] = Map(
    // strlen = BYTE count (the parser reports the WARC Content-Length,
    // written as UTF-8 octets); length() counts characters and would
    // diverge on the first multibyte character
    "warc_roundtrip" ->
      """SELECT doc_id, source, strlen(text)::BIGINT AS content_length, text
         FROM documents""",

    // gzip members are a transparent transport layer: recovery is graded
    // against the identical source-field truth
    "warc_gzip_roundtrip" ->
      """SELECT doc_id, source, strlen(text)::BIGINT AS content_length, text
         FROM documents""",

    // WebDataset shard round trip: every doc must come back as one
    // 3-member sample; the binary member's length is the closed-form
    // BMP size (54-byte headers + 4-padded stride x height) of the
    // id-derived dims the constructor used
    "webdataset_roundtrip" ->
      """SELECT doc_id, source, text, 3::BIGINT AS n_members,
         (54 + ((((2 + doc_id % 5) * 3 + 3) // 4) * 4) * (2 + doc_id % 3))::BIGINT
           AS img_bytes
         FROM documents""",

    // .tar.gz: the gzip layer is transparent transport — identical truth
    "webdataset_gzip_roundtrip" ->
      """SELECT doc_id, source, text, 3::BIGINT AS n_members,
         (54 + ((((2 + doc_id % 5) * 3 + 3) // 4) * 4) * (2 + doc_id % 3))::BIGINT
           AS img_bytes
         FROM documents""",

    // closed-form dHash replay: grid cells from the synthetic pixel
    // formula (never decoding — the Spark side proves the codecs
    // invert), then the same bit-level band blocking + exact Hamming
    // as the dedup_simhash oracle. w≥16, h≥16 keeps every box ≥1
    // pixel so the floored bounds partition the raster exactly as
    // Multimodal.dHash64 computes them.
    "image_phash_neardup" ->
      s"""WITH ${duckDhashCtes}
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
         ham AS (SELECT c.id_a, c.id_b,
                   sum(CASE WHEN fa.fb <> fb2.fb THEN 1 ELSE 0 END)::BIGINT AS hamming
                 FROM cand c JOIN bits fa ON fa.doc_id = c.id_a
                   JOIN bits fb2 ON fb2.doc_id = c.id_b AND fb2.bit = fa.bit
                 GROUP BY 1, 2)
         SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""",

    // incremental twin: the SAME closed-form dHash replay, but the
    // daily batch (doc_id%10=0) banded against the corpus index
    // (%10≠0) — batch×corpus only, never corpus×corpus, mirroring
    // neardup_incremental's split
    "image_phash_incremental" ->
      s"""WITH ${duckDhashCtes}
         cand AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_val = b.band_val
                  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0),
         ham AS (SELECT c.id_new, c.id_old,
                   sum(CASE WHEN fa.fb <> fb2.fb THEN 1 ELSE 0 END)::BIGINT AS hamming
                 FROM cand c JOIN bits fa ON fa.doc_id = c.id_new
                   JOIN bits fb2 ON fb2.doc_id = c.id_old AND fb2.bit = fa.bit
                 GROUP BY 1, 2)
         SELECT id_new, id_old, hamming FROM ham WHERE hamming <= 3""",

    // the composed image flagship: gate -> dHash -> bands -> Hamming
    // pairs -> recursive connected components -> min-id survivors ->
    // Lehmer cluster split, all closed-form (same construction replay
    // as image_phash_neardup; gate applied between construction and
    // fingerprint exactly as the Spark pipeline stages it)
    "curation_image_e2e" ->
      s"""WITH RECURSIVE
         ${duckDhashCtesGated("w * h >= 400 AND 2 * w <= 3 * h")}
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
         ham AS (SELECT c.id_a, c.id_b,
                   sum(CASE WHEN fa.fb <> fb2.fb THEN 1 ELSE 0 END)::BIGINT AS hamming
                 FROM cand c JOIN bits fa ON fa.doc_id = c.id_a
                   JOIN bits fb2 ON fb2.doc_id = c.id_b AND fb2.bit = fa.bit
                 GROUP BY 1, 2),
         pr AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
         e AS (SELECT id_a AS a, id_b AS b FROM pr
               UNION SELECT id_b, id_a FROM pr),
         reach(a, b) AS (SELECT a, b FROM e
           UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
         lab AS (SELECT dk.doc_id,
                   least(dk.doc_id, coalesce(min(r.b), dk.doc_id))::BIGINT AS cluster
                 FROM dk LEFT JOIN reach r ON r.a = dk.doc_id GROUP BY dk.doc_id),
         sz AS (SELECT cluster, count(*)::BIGINT AS n_members FROM lab GROUP BY 1)
         SELECT dk.doc_id, dk.w::BIGINT AS width, dk.h::BIGINT AS height,
           lab.cluster, sz.n_members,
           CASE WHEN ((lab.cluster * 48271 + 11) % 2147483647) % 1000 < 900 THEN 'train'
                WHEN ((lab.cluster * 48271 + 11) % 2147483647) % 1000 < 950 THEN 'val'
                ELSE 'test' END AS split
         FROM dk JOIN lab USING (doc_id) JOIN sz USING (cluster)
         WHERE dk.doc_id = lab.cluster""",

    // frame-level video near-dup: closed-form dHash replay per FRAME
    // (key (doc_id+f) mod nk, fixed 18x16 rasters — the AVI stream
    // header binds one dim to all frames — perturbation on slots
    // divisible by 3), then the same band blocking + exact Hamming as
    // the image channel, frame ids packed doc_id*8+f and split back
    "video_frame_neardup" ->
      """WITH nf AS (SELECT least(greatest(37,
             (SELECT sum(2 + doc_id % 3) FROM documents)::BIGINT // 14),
             2147483647) AS nk),
         vf AS (SELECT doc_id, unnest(generate_series(0, 1 + doc_id % 3)) AS f
                FROM documents),
         vk AS (SELECT doc_id, f, (doc_id + f) % (SELECT nk FROM nf) AS key,
                  ((doc_id + f) % 3 = 0) AS pert, doc_id * 8 + f AS fid
                FROM vf),
         -- videoDupPixel: a = (key*48271 + p*16807 + c*31 + 7) mod M,
         -- v = (a*a mod M) mod 256 — the squared (jointly nonlinear)
         -- mix; vp0/vp1/vp2 materialize a per channel so a*a reads it
         -- once (c offsets 7 / 38 / 69 = c*31 + 7)
         vpx AS (SELECT fid, key, pert, gi.i AS i, gj.j AS j, gy.y AS y, gx.x AS x,
             (key * 48271 + (gy.y * 18 + gx.x) * 16807 + 7) % 2147483647 AS a0,
             (key * 48271 + (gy.y * 18 + gx.x) * 16807 + 38) % 2147483647 AS a1,
             (key * 48271 + (gy.y * 18 + gx.x) * 16807 + 69) % 2147483647 AS a2
           FROM vk, generate_series(0, 7) gi(i), generate_series(0, 8) gj(j),
             generate_series(0, 1) gy0(yy), generate_series(0, 1) gx0(xx),
             LATERAL (SELECT gi.i * 2 + gy0.yy AS y) gy,
             LATERAL (SELECT gj.j * 2 + gx0.xx AS x) gx),
         vgr AS (SELECT fid, i, j,
             (299 * (CASE WHEN pert AND y * 18 + x = key % 288
                     THEN ((a0 * a0 % 2147483647) % 256 + 16) % 256
                     ELSE (a0 * a0 % 2147483647) % 256 END)
              + 587 * ((a1 * a1 % 2147483647) % 256)
              + 114 * ((a2 * a2 % 2147483647) % 256)) // 1000 AS gray
           FROM vpx),
         cells AS (SELECT fid, i, j,
             (sum(gray) // 4)::BIGINT AS cell
           FROM vgr GROUP BY 1, 2, 3),
         bits AS (SELECT a.fid, a.i * 8 + a.j AS bit,
                    CASE WHEN a.cell < b.cell THEN 1 ELSE 0 END AS fb
                  FROM cells a JOIN cells b
                    ON b.fid = a.fid AND b.i = a.i AND b.j = a.j + 1
                  WHERE a.j < 8),
         bands AS (SELECT fid, bit % 4 AS band,
                     sum(fb * (1 << (bit // 4)))::BIGINT AS band_val
                   FROM bits GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.fid AS id_a, b.fid AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_val = b.band_val
                      AND a.fid < b.fid),
         ham AS (SELECT c.id_a, c.id_b,
                   sum(CASE WHEN fa.fb <> fb2.fb THEN 1 ELSE 0 END)::BIGINT AS hamming
                 FROM cand c JOIN bits fa ON fa.fid = c.id_a
                   JOIN bits fb2 ON fb2.fid = c.id_b AND fb2.bit = fa.bit
                 GROUP BY 1, 2)
         SELECT (id_a // 8)::BIGINT AS video_a, (id_a % 8)::BIGINT AS frame_a,
           (id_b // 8)::BIGINT AS video_b, (id_b % 8)::BIGINT AS frame_b, hamming
         FROM ham WHERE hamming <= 3 AND id_a // 8 <> id_b // 8""",

    // audio fingerprint near-dup: the time-axis dHash replayed in
    // closed form (65 floored-bound segments over the Lehmer sample
    // stream, perturbed one sample on ids % 3 = 0, cross-multiplied
    // mean compares), then the same band blocking + exact Hamming
    "audio_fingerprint_neardup" ->
      """WITH nk AS (SELECT least(greatest(37, count(*) // 14), 2147483647) AS nk
                     FROM documents),
         ad AS (SELECT doc_id, doc_id % (SELECT nk FROM nk) AS key,
                  192 + (doc_id % (SELECT nk FROM nk)) % 64 AS n,
                  (doc_id % 3 = 0) AS pert FROM documents),
         segs AS (SELECT doc_id, gj.j AS j,
             (list_sum(list_transform(
                generate_series((gj.j * n) // 65, ((gj.j + 1) * n) // 65 - 1),
                s -> (CASE WHEN pert AND s = key % n
                      THEN ((((key * 48271 + s * 16807 + 11) % 2147483647) * 48271 % 2147483647) % 65536 + 512) % 65536 - 32768
                      ELSE (((key * 48271 + s * 16807 + 11) % 2147483647) * 48271 % 2147483647) % 65536 - 32768 END))))::BIGINT AS ssum,
             (((gj.j + 1) * n) // 65 - (gj.j * n) // 65)::BIGINT AS slen
           FROM ad, generate_series(0, 64) gj(j)),
         bits AS (SELECT a.doc_id, a.j AS bit,
                    CASE WHEN a.ssum * b.slen < b.ssum * a.slen THEN 1 ELSE 0 END AS fb
                  FROM segs a JOIN segs b
                    ON b.doc_id = a.doc_id AND b.j = a.j + 1
                  WHERE a.j < 64),
         bands AS (SELECT doc_id, bit % 4 AS band,
                     sum(fb * (1 << (bit // 4)))::BIGINT AS band_val
                   FROM bits GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
         ham AS (SELECT c.id_a, c.id_b,
                   sum(CASE WHEN fa.fb <> fb2.fb THEN 1 ELSE 0 END)::BIGINT AS hamming
                 FROM cand c JOIN bits fa ON fa.doc_id = c.id_a
                   JOIN bits fb2 ON fb2.doc_id = c.id_b AND fb2.bit = fa.bit
                 GROUP BY 1, 2)
         SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""",

    // pad-invariant audio fingerprint: the same closed-form replay as
    // audio_fingerprint_neardup, but the 65 segments run over the
    // TRIMMED window [i0..i1] — the first/last clip sample with
    // |s| >= 512. The planted pads are strictly sub-threshold, so
    // trim provably removes them and the oracle never materializes a
    // pad sample at all: trim(pad ++ clip ++ pad') == trim(clip) is
    // the invariant under grade
    "audio_fingerprint_padded" ->
      """WITH nk AS (SELECT least(greatest(37, count(*) // 14), 2147483647) AS nk
                     FROM documents),
         ad AS (SELECT doc_id, doc_id % (SELECT nk FROM nk) AS key,
                  192 + (doc_id % (SELECT nk FROM nk)) % 64 AS n,
                  (doc_id % 3 = 0) AS pert FROM documents),
         tb AS (SELECT doc_id, key, n, pert, keep[1] AS i0, keep[-1] AS i1,
                  (keep[-1] - keep[1] + 1) AS m
                FROM (SELECT doc_id, key, n, pert,
                    list_filter(generate_series(0, n - 1), s ->
                      abs(CASE WHEN pert AND s = key % n
                          THEN ((((key * 48271 + s * 16807 + 11) % 2147483647) * 48271 % 2147483647) % 65536 + 512) % 65536 - 32768
                          ELSE (((key * 48271 + s * 16807 + 11) % 2147483647) * 48271 % 2147483647) % 65536 - 32768 END) >= 512) AS keep
                  FROM ad)
                WHERE len(keep) > 0),
         segs AS (SELECT doc_id, gj.j AS j,
             (list_sum(list_transform(
                generate_series((gj.j * m) // 65, ((gj.j + 1) * m) // 65 - 1),
                t -> (CASE WHEN pert AND (i0 + t) = key % n
                      THEN ((((key * 48271 + (i0 + t) * 16807 + 11) % 2147483647) * 48271 % 2147483647) % 65536 + 512) % 65536 - 32768
                      ELSE (((key * 48271 + (i0 + t) * 16807 + 11) % 2147483647) * 48271 % 2147483647) % 65536 - 32768 END))))::BIGINT AS ssum,
             (((gj.j + 1) * m) // 65 - (gj.j * m) // 65)::BIGINT AS slen
           FROM tb, generate_series(0, 64) gj(j)
           WHERE m >= 65),
         bits AS (SELECT a.doc_id, a.j AS bit,
                    CASE WHEN a.ssum * b.slen < b.ssum * a.slen THEN 1 ELSE 0 END AS fb
                  FROM segs a JOIN segs b
                    ON b.doc_id = a.doc_id AND b.j = a.j + 1
                  WHERE a.j < 64),
         bands AS (SELECT doc_id, bit % 4 AS band,
                     sum(fb * (1 << (bit // 4)))::BIGINT AS band_val
                   FROM bits GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
         ham AS (SELECT c.id_a, c.id_b,
                   sum(CASE WHEN fa.fb <> fb2.fb THEN 1 ELSE 0 END)::BIGINT AS hamming
                 FROM cand c JOIN bits fa ON fa.doc_id = c.id_a
                   JOIN bits fb2 ON fb2.doc_id = c.id_b AND fb2.bit = fa.bit
                 GROUP BY 1, 2)
         SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""",

    // shot segmentation: the same closed-form per-frame dHash replay
    // as video_frame_neardup (new key rule: shot = f // shotLen, key
    // = (id*5 + shot*11) mod 97; perturbation pixel varies by frame),
    // then the lag + popcount closed form — boundary iff first frame
    // or bit-distance > 8, shot = running boundary count, keyframe =
    // argmin (popcount, frame_idx) within the shot
    "video_shot_segments" ->
      """WITH vf AS (SELECT doc_id, unnest(generate_series(0, 3 + doc_id % 5)) AS f
                FROM documents),
         vk AS (SELECT doc_id, f,
                  (doc_id * 5 + (f // (2 + doc_id % 2)) * 11) % 97 AS key,
                  ((doc_id + f) % 3 = 0) AS pert
                FROM vf),
         vpx AS (SELECT doc_id, f, key, pert, gi.i AS i, gj.j AS j,
             gy.y AS y, gx.x AS x,
             (key * 48271 + (gy.y * 18 + gx.x) * 16807 + 7) % 2147483647 AS a0,
             (key * 48271 + (gy.y * 18 + gx.x) * 16807 + 38) % 2147483647 AS a1,
             (key * 48271 + (gy.y * 18 + gx.x) * 16807 + 69) % 2147483647 AS a2
           FROM vk, generate_series(0, 7) gi(i), generate_series(0, 8) gj(j),
             generate_series(0, 1) gy0(yy), generate_series(0, 1) gx0(xx),
             LATERAL (SELECT gi.i * 2 + gy0.yy AS y) gy,
             LATERAL (SELECT gj.j * 2 + gx0.xx AS x) gx),
         vgr AS (SELECT doc_id, f, i, j,
             (299 * (CASE WHEN pert AND y * 18 + x = (key + f) % 288
                     THEN ((a0 * a0 % 2147483647) % 256 + 16) % 256
                     ELSE (a0 * a0 % 2147483647) % 256 END)
              + 587 * ((a1 * a1 % 2147483647) % 256)
              + 114 * ((a2 * a2 % 2147483647) % 256)) // 1000 AS gray
           FROM vpx),
         cells AS (SELECT doc_id, f, i, j, (sum(gray) // 4)::BIGINT AS cell
           FROM vgr GROUP BY 1, 2, 3, 4),
         bits AS (SELECT a.doc_id, a.f, a.i * 8 + a.j AS bit,
                    CASE WHEN a.cell < b.cell THEN 1 ELSE 0 END AS fb
                  FROM cells a JOIN cells b
                    ON b.doc_id = a.doc_id AND b.f = a.f
                      AND b.i = a.i AND b.j = a.j + 1
                  WHERE a.j < 8),
         pcs AS (SELECT doc_id, f, sum(fb)::BIGINT AS pc
                 FROM bits GROUP BY 1, 2),
         ham AS (SELECT a.doc_id, a.f,
                   sum(CASE WHEN a.fb <> b.fb THEN 1 ELSE 0 END)::BIGINT AS d
                 FROM bits a JOIN bits b
                   ON b.doc_id = a.doc_id AND b.f = a.f - 1 AND b.bit = a.bit
                 GROUP BY 1, 2),
         bnd AS (SELECT p.doc_id, p.f, p.pc,
                   CASE WHEN h.d IS NULL OR h.d > 8 THEN 1 ELSE 0 END AS boundary
                 FROM pcs p LEFT JOIN ham h
                   ON h.doc_id = p.doc_id AND h.f = p.f),
         sh AS (SELECT doc_id, f, pc,
                  sum(boundary) OVER (PARTITION BY doc_id ORDER BY f) AS shot
                FROM bnd),
         agg AS (SELECT doc_id, shot, min(f)::BIGINT AS shot_start,
                   count(*)::BIGINT AS shot_len
                 FROM sh GROUP BY 1, 2),
         kf AS (SELECT doc_id, shot, f,
                  row_number() OVER (PARTITION BY doc_id, shot
                    ORDER BY pc, f) AS rn
                FROM sh)
         SELECT agg.doc_id, shot_start, shot_len, kf.f::BIGINT AS keyframe_idx
         FROM agg JOIN kf ON kf.doc_id = agg.doc_id AND kf.shot = agg.shot
           AND kf.rn = 1""",

    // Web.canonicalizeUrl replayed step-for-step (duckUrlCanonCtes)
    // over the same manufactured messy urls — the canonical STRING is
    // hash-graded, so every rule (scheme/host case, www, default
    // ports, %xx hex case, trailing slash, tracking-param filter,
    // param sort) is pinned exactly
    "url_canonicalize" ->
      s"""WITH ${duckUrlCanonCtes("doc_id")}
         SELECT doc_id, url_canon, domain FROM canon""",

    // registrable-domain rollup with REAL canonical collisions
    // (path key doc_id % 97): per-domain url/unique/dup census
    "crawl_domain_stats" ->
      s"""WITH ${duckUrlCanonCtes("doc_id % 97")}
         SELECT domain, count(*)::BIGINT AS n_urls,
           count(DISTINCT url_canon)::BIGINT AS n_unique,
           (count(*) - count(DISTINCT url_canon))::BIGINT AS n_dups
         FROM canon GROUP BY 1""",

    // Html.extract replayed step-for-step: the same constructed page,
    // the same container kills, block segmentation, per-block
    // clean/score, and the same integer keep rules (>=30 chars,
    // 3*link_chars <= text_chars) — text_main is hash-graded so every
    // regex pass is pinned exactly
    "html_extract" ->
      """WITH u AS (SELECT doc_id,
           '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
           '</title><style>p { margin:0 }</style>' ||
           '<script>var x = 1 < 2;</script></head><body>' ||
           '<nav><a href="/">Home</a> <a href="/about">About us</a> ' ||
           '<a href="/contact">Contact</a></nav>' ||
           '<div><p>' || text || '</p></div>' ||
           (CASE WHEN doc_id % 3 = 0 THEN
             '<p>Read more: <a href="/rel">a related article from ' || source ||
             '</a> and <a href="/arch">the archive</a> end.</p>' ELSE '' END) ||
           (CASE WHEN doc_id % 4 = 1 THEN '<p>Buy now!</p>' ELSE '' END) ||
           '<footer><a href="/privacy">Privacy policy overview page</a> | ' ||
           '<a href="/terms">Terms of service agreement</a></footer>' ||
           '</body></html>' AS html
         FROM documents),
         k1 AS (SELECT doc_id, regexp_replace(html,
                  '(?is)<script(\s[^>]*)?>.*?</script>', ' ', 'g') AS h FROM u),
         k2 AS (SELECT doc_id, regexp_replace(h,
                  '(?is)<style(\s[^>]*)?>.*?</style>', ' ', 'g') AS h FROM k1),
         k3 AS (SELECT doc_id, regexp_replace(h,
                  '(?is)<title(\s[^>]*)?>.*?</title>', ' ', 'g') AS h FROM k2),
         k4 AS (SELECT doc_id, regexp_replace(h,
                  '(?i)</?(p|div|h[1-6]|ul|ol|li|table|tr|td|nav|header|footer|article|section|br|body|html|head)(\s[^>]*)?/?>',
                  chr(1), 'g') AS h FROM k3),
         bl AS (SELECT doc_id, str_split(h, chr(1)) AS bls FROM k4),
         st AS (SELECT doc_id, list_transform(bls, x -> struct_pack(
             t := trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' ', 'g'),
                   '\s+', ' ', 'g')),
             l := len(trim(regexp_replace(regexp_replace(
                   coalesce(array_to_string(regexp_extract_all(x,
                     '(?is)<a(\s[^>]*)?>(.*?)</a>', 2), ' '), ''),
                   '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))))) AS st
           FROM bl),
         f AS (SELECT doc_id,
             len(list_filter(st, s -> len(s.t) > 0))::BIGINT AS n_blocks,
             list_filter(st, s -> len(s.t) >= 30 AND s.l * 3 <= len(s.t)) AS ct
           FROM st)
         SELECT doc_id, n_blocks, len(ct)::BIGINT AS n_content,
           len(coalesce(array_to_string(list_transform(ct, s -> s.t), chr(10)), ''))::BIGINT AS main_chars,
           coalesce(array_to_string(list_transform(ct, s -> s.t), chr(10)), '') AS text_main
         FROM f""",

    "jsonl_roundtrip" ->
      """SELECT lang, count(*)::BIGINT AS n_docs, min(doc_id) AS min_id,
           max(doc_id) AS max_id, sum(length(text))::BIGINT AS sum_text_len
         FROM documents GROUP BY 1""",

    // expected fields recomputed from the SOURCE columns — the Spark
    // side must construct the headers and parse them back to match
    "multimodal_meta" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS kind,
         (16 + doc_id % 1904)::BIGINT AS width,
         (16 + n_chars % 1064)::BIGINT AS height,
         (CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 51 END)::BIGINT AS n_bytes
         FROM documents""",

    // closed-form replay of the construct→decode round trip: dims from
    // the id, channel c's sums over logical pixel order p = 0..n_pix-1
    // of (doc_id + 3p + c) mod 256, plain and (p+1)-weighted
    "multimodal_decode" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS kind,
         (2 + doc_id % 7)::BIGINT AS width,
         (2 + doc_id % 5)::BIGINT AS height,
         ((2 + doc_id % 7) * (2 + doc_id % 5))::BIGINT AS n_pix,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 0) % 256))::BIGINT AS r_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 1) % 256))::BIGINT AS g_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 2) % 256))::BIGINT AS b_sum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 0) % 256)))::BIGINT AS r_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 1) % 256)))::BIGINT AS g_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 2) % 256)))::BIGINT AS b_wsum
         FROM (SELECT doc_id,
                 generate_series(0, (2 + doc_id % 7) * (2 + doc_id % 5) - 1) AS px
               FROM documents)""",

    "multimodal_png_decode" ->
      """SELECT doc_id,
         'png' AS kind,
         (2 + doc_id % 6)::BIGINT AS width,
         (2 + doc_id % 5)::BIGINT AS height,
         ((2 + doc_id % 6) * (2 + doc_id % 5))::BIGINT AS n_pix,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 0) % 256))::BIGINT AS r_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 1) % 256))::BIGINT AS g_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*p + 2) % 256))::BIGINT AS b_sum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 0) % 256)))::BIGINT AS r_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 1) % 256)))::BIGINT AS g_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*p + 2) % 256)))::BIGINT AS b_wsum
         FROM (SELECT doc_id,
                 generate_series(0, (2 + doc_id % 6) * (2 + doc_id % 5) - 1) AS px
               FROM documents)""",

    // closed-form replay of the GIF decode: pixel p of image doc_id is
    // palette entry (doc_id + p) mod 256, whose channel c value is
    // (doc_id + 3k + c) mod 256 — LZW and the interlace permutation
    // cancel in the round trip, so the oracle needs neither
    "multimodal_gif_decode" ->
      """SELECT doc_id,
         'gif' AS kind,
         (2 + doc_id % 6)::BIGINT AS width,
         (5 + doc_id % 5)::BIGINT AS height,
         ((2 + doc_id % 6) * (5 + doc_id % 5))::BIGINT AS n_pix,
         list_sum(list_transform(px, p -> (doc_id + 3*((doc_id + p) % 256) + 0) % 256))::BIGINT AS r_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*((doc_id + p) % 256) + 1) % 256))::BIGINT AS g_sum,
         list_sum(list_transform(px, p -> (doc_id + 3*((doc_id + p) % 256) + 2) % 256))::BIGINT AS b_sum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*((doc_id + p) % 256) + 0) % 256)))::BIGINT AS r_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*((doc_id + p) % 256) + 1) % 256)))::BIGINT AS g_wsum,
         list_sum(list_transform(px, p -> (p + 1) * ((doc_id + 3*((doc_id + p) % 256) + 2) % 256)))::BIGINT AS b_wsum
         FROM (SELECT doc_id,
                 generate_series(0, (2 + doc_id % 6) * (5 + doc_id % 5) - 1) AS px
               FROM documents)""",

    // closed-form replay of the JPEG decode: block b of image doc_id
    // carries constant YCbCr (7id+16b, 11id+32b, 13id+8b) mod 256;
    // per-pixel RGB is the decoder's fixed-point BT.601 transform
    // (floor((x + 32768)/65536) == the JVM's arithmetic >> 16)
    "multimodal_jpeg_decode" ->
      """WITH px AS (SELECT doc_id,
                unnest(generate_series(0,
                  (8*(1 + doc_id % 4)) * (8*(1 + doc_id % 3)) - 1)) AS p
              FROM documents),
         v AS (SELECT doc_id, p,
                 ((p // (8*(1 + doc_id % 4))) // 8) * (1 + doc_id % 4)
                   + ((p % (8*(1 + doc_id % 4))) // 8) AS b
               FROM px),
         c AS (SELECT doc_id, p,
                 (doc_id*7 + 16*b) % 256 AS yv,
                 (doc_id*11 + 32*b) % 256 - 128 AS cb_,
                 (doc_id*13 + 8*b) % 256 - 128 AS cr_
               FROM v),
         rgb AS (SELECT doc_id, p,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 + 91881*cr_ + 32768)/65536.0) AS BIGINT))) AS r,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 - 22554*cb_ - 46802*cr_ + 32768)/65536.0) AS BIGINT))) AS g,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 + 116130*cb_ + 32768)/65536.0) AS BIGINT))) AS bb
               FROM c)
         SELECT doc_id, 'jpeg' AS kind,
           (8*(1 + doc_id % 4))::BIGINT AS width,
           (8*(1 + doc_id % 3))::BIGINT AS height,
           ((8*(1 + doc_id % 4)) * (8*(1 + doc_id % 3)))::BIGINT AS n_pix,
           sum(r)::BIGINT AS r_sum, sum(g)::BIGINT AS g_sum,
           sum(bb)::BIGINT AS b_sum,
           sum((p + 1) * r)::BIGINT AS r_wsum,
           sum((p + 1) * g)::BIGINT AS g_wsum,
           sum((p + 1) * bb)::BIGINT AS b_wsum
         FROM rgb GROUP BY ALL""",

    // the progressive twin: same closed forms, dims swapped
    // (w = 8*(1 + id%3), h = 8*(1 + id%4)) — the decoder runs the full
    // ten-scan SOF2 pipeline yet lands on the same block-constant RGB
    "multimodal_jpeg_progressive" ->
      """WITH px AS (SELECT doc_id,
                unnest(generate_series(0,
                  (8*(1 + doc_id % 3)) * (8*(1 + doc_id % 4)) - 1)) AS p
              FROM documents),
         v AS (SELECT doc_id, p,
                 ((p // (8*(1 + doc_id % 3))) // 8) * (1 + doc_id % 3)
                   + ((p % (8*(1 + doc_id % 3))) // 8) AS b
               FROM px),
         c AS (SELECT doc_id, p,
                 (doc_id*7 + 16*b) % 256 AS yv,
                 (doc_id*11 + 32*b) % 256 - 128 AS cb_,
                 (doc_id*13 + 8*b) % 256 - 128 AS cr_
               FROM v),
         rgb AS (SELECT doc_id, p,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 + 91881*cr_ + 32768)/65536.0) AS BIGINT))) AS r,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 - 22554*cb_ - 46802*cr_ + 32768)/65536.0) AS BIGINT))) AS g,
                 LEAST(255, GREATEST(0, CAST(floor((yv*65536 + 116130*cb_ + 32768)/65536.0) AS BIGINT))) AS bb
               FROM c)
         SELECT doc_id, 'jpeg' AS kind,
           (8*(1 + doc_id % 3))::BIGINT AS width,
           (8*(1 + doc_id % 4))::BIGINT AS height,
           ((8*(1 + doc_id % 3)) * (8*(1 + doc_id % 4)))::BIGINT AS n_pix,
           sum(r)::BIGINT AS r_sum, sum(g)::BIGINT AS g_sum,
           sum(bb)::BIGINT AS b_sum,
           sum((p + 1) * r)::BIGINT AS r_wsum,
           sum((p + 1) * g)::BIGINT AS g_wsum,
           sum((p + 1) * bb)::BIGINT AS b_wsum
         FROM rgb GROUP BY ALL""",

    // channel c of pixel p in frame f is (doc_id + 5f + 3p + c) mod 256
    "multimodal_avi_frames" ->
      """WITH fr AS (SELECT doc_id,
                unnest(generate_series(0, (2 + doc_id % 4) - 1)) AS f
              FROM documents),
         px AS (SELECT doc_id, f,
                  generate_series(0, (2 + doc_id % 5) * (2 + doc_id % 3) - 1) AS ps
                FROM fr)
         SELECT doc_id, f AS frame_idx,
           (2 + doc_id % 5)::BIGINT AS width,
           (2 + doc_id % 3)::BIGINT AS height,
           list_sum(list_transform(ps, p -> (doc_id + 5*f + 3*p + 0) % 256))::BIGINT AS r_sum,
           list_sum(list_transform(ps, p -> (doc_id + 5*f + 3*p + 1) % 256))::BIGINT AS g_sum,
           list_sum(list_transform(ps, p -> (doc_id + 5*f + 3*p + 2) % 256))::BIGINT AS b_sum,
           list_sum(list_transform(ps, p -> (p + 1) * ((doc_id + 5*f + 3*p + 0) % 256)))::BIGINT AS r_wsum,
           list_sum(list_transform(ps, p -> (p + 1) * ((doc_id + 5*f + 3*p + 1) % 256)))::BIGINT AS g_wsum,
           list_sum(list_transform(ps, p -> (p + 1) * ((doc_id + 5*f + 3*p + 2) % 256)))::BIGINT AS b_wsum
         FROM px""",

    // channel c of frame s is ((doc_id + 7s + 3c) mod 65536) - 32768;
    // mono clips (even ids) report zeros for channel 1
    // law decode tables inlined from the Scala single source of truth;
    // law = id bit 1 (matches syntheticCompandedAudio), channels = bit 0
    "multimodal_companded_decode" -> {
      val alawL = graft.operators.Multimodal.alawDecodeTable.mkString("[", ",", "]")
      val mulawL = graft.operators.Multimodal.mulawDecodeTable.mkString("[", ",", "]")
      s"""SELECT doc_id,
         (1 + doc_id % 2)::BIGINT AS channels,
         8000::BIGINT AS sample_rate,
         (30 + doc_id % 40)::BIGINT AS n_frames,
         list_sum(list_transform(fr, s -> tbl[((doc_id + 7*s) % 256) + 1]))::BIGINT AS c0_sum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> tbl[((doc_id + 7*s + 3) % 256) + 1]))
            ELSE 0 END)::BIGINT AS c1_sum,
         list_sum(list_transform(fr, s -> (s + 1) * tbl[((doc_id + 7*s) % 256) + 1]))::BIGINT AS c0_wsum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> (s + 1) * tbl[((doc_id + 7*s + 3) % 256) + 1]))
            ELSE 0 END)::BIGINT AS c1_wsum
         FROM (SELECT doc_id,
                 CASE WHEN (doc_id // 2) % 2 = 0 THEN $alawL ELSE $mulawL END AS tbl,
                 generate_series(0, 30 + doc_id % 40 - 1) AS fr
               FROM documents)"""
    },

    // per-block-constant closed form: block b contributes 9·v to the
    // plain sum and v·(81b + 45) to the position-weighted sum
    "multimodal_adpcm_decode" ->
      """WITH blk AS (SELECT doc_id, unnest(generate_series(0, 1 + doc_id % 3)) AS b
                      FROM documents),
         v AS (SELECT doc_id, b,
                 (doc_id * 31 + b * 17) % 65536 - 32768 AS v0,
                 (doc_id * 31 + b * 17 + 7) % 65536 - 32768 AS v1
               FROM blk)
         SELECT doc_id,
           (1 + doc_id % 2)::BIGINT AS channels,
           8000::BIGINT AS sample_rate,
           (9 * (2 + doc_id % 3))::BIGINT AS n_frames,
           sum(9 * v0)::BIGINT AS c0_sum,
           (CASE WHEN doc_id % 2 = 1 THEN sum(9 * v1) ELSE 0 END)::BIGINT AS c1_sum,
           sum(v0 * (81 * b + 45))::BIGINT AS c0_wsum,
           (CASE WHEN doc_id % 2 = 1 THEN sum(v1 * (81 * b + 45)) ELSE 0 END)::BIGINT AS c1_wsum
         FROM v GROUP BY doc_id""",

    // lossless claim: the FLAC oracle IS the WAV oracle (same closed-
    // form samples, same frames/channels formulas) — the decode must
    // recover the identical integers through the entropy coding
    "multimodal_flac_decode" ->
      """SELECT doc_id,
         (1 + doc_id % 2)::BIGINT AS channels,
         8000::BIGINT AS sample_rate,
         (40 + doc_id % 60)::BIGINT AS n_frames,
         list_sum(list_transform(fr, s -> (doc_id + 7*s) % 65536 - 32768))::BIGINT AS c0_sum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> (doc_id + 7*s + 3) % 65536 - 32768))
            ELSE 0 END)::BIGINT AS c1_sum,
         list_sum(list_transform(fr, s -> (s + 1) * ((doc_id + 7*s) % 65536 - 32768)))::BIGINT AS c0_wsum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> (s + 1) * ((doc_id + 7*s + 3) % 65536 - 32768)))
            ELSE 0 END)::BIGINT AS c1_wsum
         FROM (SELECT doc_id, generate_series(0, 40 + doc_id % 60 - 1) AS fr
               FROM documents)""",

    "multimodal_wav_decode" ->
      """SELECT doc_id,
         (1 + doc_id % 2)::BIGINT AS channels,
         8000::BIGINT AS sample_rate,
         (40 + doc_id % 60)::BIGINT AS n_frames,
         list_sum(list_transform(fr, s -> (doc_id + 7*s) % 65536 - 32768))::BIGINT AS c0_sum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> (doc_id + 7*s + 3) % 65536 - 32768))
            ELSE 0 END)::BIGINT AS c1_sum,
         list_sum(list_transform(fr, s -> (s + 1) * ((doc_id + 7*s) % 65536 - 32768)))::BIGINT AS c0_wsum,
         (CASE WHEN doc_id % 2 = 1
            THEN list_sum(list_transform(fr, s -> (s + 1) * ((doc_id + 7*s + 3) % 65536 - 32768)))
            ELSE 0 END)::BIGINT AS c1_wsum
         FROM (SELECT doc_id, generate_series(0, 40 + doc_id % 60 - 1) AS fr
               FROM documents)""",

    "multimodal_frames" ->
      """SELECT doc_id, unnest(generate_series(0, 3)) AS frame_idx,
         floor(unnest(generate_series(0, 3)) * octet_length(encode(text)) / 4)::BIGINT AS frame_pos
         FROM documents""",

  )
}
