"""Native VIDEO decode — MJPEG-in-AVI (the RIFF container, public
Microsoft spec + OpenDML): a real demux path with no codec library.
AVI is a RIFF tree (LIST hdrl → avih main header + LIST strl with
strh/strf per stream; LIST movi carrying '00dc' compressed-frame
chunks; optional idx1), and Motion-JPEG frames are plain baseline
JPEGs — so the chunk walk here plus the native JPEG decoder
(operators/multimodal._decode_jpeg) is a COMPLETE container→codec
video pipeline: demux, per-frame decode, stride frame-sampling.

This replaces the fake video stand-in for payloads that really are
video: `fake_decode_meta` remains for the text-derived fixture
payloads, but AVI bytes now produce true (width, height, n_frames)
and true pixels.

Scale notes (100 TB): video rows are the largest payloads in a
multimodal corpus — the decode stays an Arrow-batched ``mapInPandas``
map (embarrassingly parallel, zero shuffle), and frame SAMPLING is the
load-bearing part: a stride-s sample decodes every frame header but
only the sampled frames' entropy data would need full IDCT in a
production decoder; facts re-entering the JVM stay ~50 bytes/row
regardless of payload size.

Reference: no counterpart — the reference ingests video as opaque
bytes (SURVEY.md §2l multimodal extension).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from ..functions.planctl import presentation_sort as _presentation_sort
from .multimodal import _decode_jpeg, build_jpeg_grey


def build_avi_mjpeg(frames: list[bytes], w: int, h: int, fps: int = 25) -> bytes:
    """Assemble a minimal spec-shaped AVI: RIFF('AVI ') with LIST hdrl
    (avih + one 'vids'/'MJPG' stream: strh + BITMAPINFOHEADER strf),
    LIST movi of '00dc' chunks (word-aligned), and an idx1 index with
    keyframe flags. Frames are ready-made JPEG payloads."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0, 0x10,        # maxBytesPerSec, padding, AVIF_HASINDEX
        len(frames), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, -1)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = []
    offsets = []  # idx1 offsets are relative to the 'movi' fourcc
    off = 4
    for f in frames:
        offsets.append(off)
        c = chunk(b"00dc", f)
        movi_chunks.append(c)
        off += len(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, o, len(f))
            for o, f in zip(offsets, frames)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes):
    """Demux an AVI and decode every MJPEG frame natively. Returns
    ``(w, h, frames)`` with frames a list of (h, w, 3) uint8 arrays.
    Malformed RIFF → ``ValueError``; a non-MJPG video stream →
    ``NotImplementedError`` (the typed 'unsupported' quarantine)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    declared = struct.unpack("<I", payload[4:8])[0]
    if declared + 8 > len(payload):
        raise ValueError("truncated AVI (RIFF size exceeds payload)")

    w = h = n_declared = None
    compression = None
    frame_bytes: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, n_declared, compression
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body_start, body_end = pos + 8, pos + 8 + clen
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(body_start + 4, body_end)  # skip the list type
            elif fourcc == b"avih":
                if clen < 40:
                    raise ValueError("short avih")
                vals = struct.unpack("<10I", payload[body_start : body_start + 40])
                n_declared, w, h = vals[4], vals[8], vals[9]
            elif fourcc == b"strf" and clen >= 20:
                compression = payload[body_start + 16 : body_start + 20]
            elif fourcc in (b"00dc", b"00db"):
                frame_bytes.append(payload[body_start:body_end])
            pos = body_end + (clen & 1)  # chunks are word-aligned

    walk(12, min(declared + 8, len(payload)))
    if w is None or not frame_bytes:
        raise ValueError("AVI missing avih header or movi frames")
    if compression not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI codec {compression!r} (only MJPG supported)"
        )
    frames = []
    for fb in frame_bytes:
        fw, fh, px = _decode_jpeg(fb)
        if (fw, fh) != (w, h):
            raise ValueError("frame dimensions disagree with avih")
        frames.append(px)
    if n_declared is not None and n_declared != len(frames):
        raise ValueError("frame count disagrees with avih dwTotalFrames")
    return w, h, frames


# ------------------------------------------------- driver-oracled query

_VID_GROUPS = 12


def _video_payload(doc_id: int) -> bytes:
    """Deterministic MJPEG-AVI fixture: per group, 2..5 block-constant
    greyscale JPEG frames (the exact-round-trip construction of
    ``_jpeg_payload``, with a per-FRAME term so every frame differs —
    a stride misalignment changes the sums). ``doc_id % 19 == 2``
    patches strf's compression to 'XVID' ('unsupported');
    ``doc_id % 13 == 8`` truncates ('corrupt')."""
    import numpy as np

    g = doc_id % _VID_GROUPS
    n_frames = 2 + g % 4
    bw, bh = 2 + g % 3, 1 + g % 2
    frames = []
    for f in range(n_frames):
        vals = np.empty((bh, bw), np.uint8)
        for by in range(bh):
            for bx in range(bw):
                vals[by, bx] = 128 + 2 * (((5 * bx + 3 * by + g + 7 * f) % 49) - 24)
        frames.append(build_jpeg_grey(np.repeat(np.repeat(vals, 8, 0), 8, 1)))
    payload = build_avi_mjpeg(frames, 8 * bw, 8 * bh, fps=10 + g)
    if doc_id % 19 == 2 and doc_id % 13 != 8:
        i = payload.index(b"strf")
        payload = payload[: i + 8 + 16] + b"XVID" + payload[i + 8 + 20 :]
    if doc_id % 13 == 8:
        payload = payload[: len(payload) // 2]
    return payload


def _video_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: fabricate → demux → per-frame native JPEG
    decode → stride sample → integer facts. Typed routing as usual:
    NotImplementedError → 'unsupported', anything else → 'corrupt'."""
    import numpy as np

    cache: dict[tuple[int, bool, bool], tuple] = {}

    def facts(doc_id: int) -> tuple:
        g = doc_id % _VID_GROUPS
        key = (g, doc_id % 13 == 8, doc_id % 19 == 2)
        if key not in cache:
            stride = 1 + g % 2
            try:
                w, h, frames = decode_avi_mjpeg(_video_payload(doc_id))
                sampled = list(range(0, len(frames), stride))
                px = wpx = 0
                for f in sampled:
                    s = int(frames[f].astype(np.int64).sum())
                    px += s
                    wpx += (f + 1) * s
                cache[key] = (
                    "decoded", w, h, len(frames), len(sampled), px, wpx
                )
            except NotImplementedError:
                cache[key] = ("unsupported", 0, 0, 0, 0, 0, 0)
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt", 0, 0, 0, 0, 0, 0)
        return cache[key]

    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(d),) + facts(int(d)) for d in pdf["doc_id"]]
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "status", "width", "height", "n_frames",
                "n_sampled", "px_sum", "wpx_sum",
            ],
        ).astype(
            {
                "doc_id": "int64", "width": "int32", "height": "int32",
                "n_frames": "int32", "n_sampled": "int32",
                "px_sum": "int64", "wpx_sum": "int64",
            }
        )


def _video_oracle() -> str:
    """Symbolic replay: greyscale frame f's pixel (x, y) is
    3·(128 + 2·(((5·(x//8) + 3·(y//8) + g + 7·f) % 49) − 24)) after
    RGB replication; block sums collapse to 192·v per 8x8 block. The
    stride-sampled sums are exact integers."""
    v = "(128 + 2 * (((5 * bx + 3 * by + g + 7 * f) % 49) - 24))"
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_VID_GROUPS} AS g FROM documents
    ),
    dims AS (
      SELECT g, 2 + g % 4 AS nf, 2 + g % 3 AS bw, 1 + g % 2 AS bh,
             1 + g % 2 AS stride
      FROM grp
    ),
    sampled AS (
      SELECT g, nf, bw, bh, stride, unnest(range(0, nf, stride)) AS f
      FROM dims
    ),
    blocks AS (
      SELECT g, nf, bw, bh, stride, f,
             unnest(range(0, bw * bh)) AS b
      FROM sampled
    ),
    vals AS (
      SELECT g, nf, bw, bh, stride, f,
             192 * {v} AS bsum
      FROM (SELECT g, nf, bw, bh, stride, f,
                   b % bw AS bx, b // bw AS by
            FROM blocks)
    ),
    sums AS (
      SELECT g, MAX(8 * bw) AS w, MAX(8 * bh) AS h, MAX(nf) AS nf,
             CAST(COUNT(DISTINCT f) AS INT) AS n_sampled,
             CAST(SUM(bsum) AS BIGINT) AS px_sum,
             CAST(SUM((f + 1) * bsum) AS BIGINT) AS wpx_sum
      FROM vals GROUP BY g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 13 = 8 THEN 'corrupt'
                WHEN d.doc_id % 19 = 2 THEN 'unsupported'
                ELSE 'decoded' END AS status,
           CASE WHEN d.doc_id % 13 = 8 OR d.doc_id % 19 = 2 THEN 0
                ELSE s.w END AS width,
           CASE WHEN d.doc_id % 13 = 8 OR d.doc_id % 19 = 2 THEN 0
                ELSE s.h END AS height,
           CASE WHEN d.doc_id % 13 = 8 OR d.doc_id % 19 = 2 THEN 0
                ELSE s.nf END AS n_frames,
           CASE WHEN d.doc_id % 13 = 8 OR d.doc_id % 19 = 2 THEN 0
                ELSE s.n_sampled END AS n_sampled,
           CASE WHEN d.doc_id % 13 = 8 OR d.doc_id % 19 = 2 THEN 0
                ELSE s.px_sum END AS px_sum,
           CASE WHEN d.doc_id % 13 = 8 OR d.doc_id % 19 = 2 THEN 0
                ELSE s.wpx_sum END AS wpx_sum
    FROM documents d
    JOIN sums s ON d.doc_id % {_VID_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("multimodal_video_mjpeg", oracle=_video_oracle())
def multimodal_video_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native VIDEO pipeline, end to end: real AVI containers (RIFF
    tree, avih/strh/strf headers, movi '00dc' chunks, idx1) carrying
    Motion-JPEG frames are demuxed and every frame decoded by the
    NATIVE JPEG decoder, then stride-sampled — demux, codec and the
    sampling rule are all under the driver hash (the per-frame term in
    the fixture makes the weighted sum stride-sensitive). Typed
    quarantine: truncation ('corrupt') and a patched XVID fourcc
    ('unsupported').

    Scale notes (100 TB): same mapInPandas shape as every decode
    query; video payloads dominate corpus bytes but only ~50 bytes of
    facts per row re-enter the JVM."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _video_batches,
        schema=(
            "doc_id long, status string, width int, height int, "
            "n_frames int, n_sampled int, px_sum long, wpx_sum long"
        ),
    ).transform(_presentation_sort, "doc_id")


def _frame_hash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: demux + decode every frame, perceptual
    average-hash each one (the image aHash over REAL decoded pixels) →
    (doc_id, frame_idx, ahash) rows; undecodable docs contribute no
    rows (the dedup pipeline simply never sees them)."""
    from .multimodal import average_hash

    cache: dict[tuple[int, bool, bool], list] = {}

    def rows(doc_id: int) -> list:
        g = doc_id % _VID_GROUPS
        key = (g, doc_id % 13 == 8, doc_id % 19 == 2)
        if key not in cache:
            try:
                _w, _h, frames = decode_avi_mjpeg(_video_payload(doc_id))
                cache[key] = [(f, average_hash(px)) for f, px in enumerate(frames)]
            except Exception:  # noqa: BLE001 — quarantine: no frames
                cache[key] = []
        return cache[key]

    for pdf in it:
        if pdf.empty:
            continue
        out = [
            (int(d), f, h)
            for d in pdf["doc_id"]
            for f, h in rows(int(d))
        ]
        yield pd.DataFrame(
            out, columns=["doc_id", "frame_idx", "ahash"]
        ).astype({"doc_id": "int64", "frame_idx": "int32", "ahash": "int64"})


def _frame_dedup_oracle() -> str:
    """Closed-form replay of decode → 8x8 nearest resample → threshold
    → bit pack, per (group, frame). The fixture frames are grey with
    per-8x8-block constants, and the resize target index maps to block
    (x8·bw)//8, (y8·bh)//8 — integer arithmetic end to end."""
    pows = [-(1 << 63)] + [1 << (63 - i) for i in range(1, 64)]
    pow_list = "[" + ", ".join(str(p) for p in pows) + "]"
    # sampled grey value for 8x8 cell i of frame f in group g
    v = ("(128 + 2 * (((5 * (((i % 8) * (2 + g % 3)) // 8)"
         " + 3 * (((i // 8) * (1 + g % 2)) // 8) + g + 7 * f) % 49) - 24))")
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_VID_GROUPS} AS g FROM documents
    ),
    frames AS (
      SELECT g, unnest(range(0, 2 + g % 4)) AS f FROM grp
    ),
    cells AS (
      SELECT g, f, list_transform(range(0, 64), i -> {v}) AS cs
      FROM frames
    ),
    h AS (
      SELECT g, f, CAST(list_sum(list_transform(range(0, 64),
        i -> CASE WHEN cs[i + 1] >= list_sum(cs) // 64
             THEN {pow_list}[i + 1] ELSE 0 END)) AS BIGINT) AS ahash
      FROM cells
    ),
    clean AS (
      SELECT doc_id, doc_id % {_VID_GROUPS} AS g FROM documents
      WHERE doc_id % 13 <> 8 AND doc_id % 19 <> 2
    )
    SELECT h.ahash,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
           MIN(c.doc_id) AS canonical_doc_id
    FROM clean c JOIN h ON c.g = h.g
    GROUP BY h.ahash
    HAVING COUNT(DISTINCT c.doc_id) >= 2
    ORDER BY h.ahash
    """


@register("video_frame_ahash_dedup", oracle=_frame_dedup_oracle())
def video_frame_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document VIDEO frame near-duplicate detection — the
    pipeline composition a multimodal training corpus needs: demux the
    AVI, decode every MJPEG frame natively, perceptual-hash each frame
    (grayscale → 8x8 nearest resample → mean threshold → 64-bit pack),
    and bucket identical hashes ACROSS documents. Undecodable payloads
    contribute no frames. The oracle replays decode, resize sampling,
    thresholding and two's-complement bit packing in closed form.

    Scale notes (100 TB): frame explode happens INSIDE the Python
    worker (n_frames slim rows per doc, 20 bytes each); the only
    shuffle is the hash-keyed aggregation — bucket skew bounded the
    same way as the image aHash operator (a bucket is one perceived
    frame; Hamming-tolerant banding composes like dedup_simhash)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    hashed = d.mapInPandas(
        _frame_hash_batches,
        schema="doc_id long, frame_idx int, ahash long",
    )
    return (
        hashed.groupBy("ahash")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("ahash")
    )


# --------------------------- Hamming-banded frame near-dup (LSH style)

_ND_BANDS = 4          # 4 × 16-bit bands over the 64-bit aHash
_ND_HAMMING = 3        # verify threshold; < _ND_BANDS ⇒ banding lossless
_ND_CAP = 64           # per-band bucket cap over DISTINCT hash classes


def _nd_cells(g: int, f: int, v: int, rb: int):
    """8x8 cell grid for one near-dup fixture frame: a BALANCED ±32
    pattern (32 cells at 160, 32 at 96 → integer mean exactly 128, so
    the aHash threshold is fixed and every cell's bit is its sign).
    The base pattern is a rotation: cell i is high iff
    ``(i + c) % 64 < 32`` with ``c = (g + 9f + 23·rb) % 64``; variant
    ``v=1`` swaps the signs of exactly one high cell (i0, the rotation
    start) and one low cell (i1, the half point) — balance preserved,
    mean still 128, and the two variants' hashes differ in EXACTLY two
    bits: a true Hamming-2 near-duplicate that exact-equality dedup
    (``video_frame_ahash_dedup``) cannot see."""
    import numpy as np

    c = (g + 9 * f + 23 * rb) % 64
    i0, i1 = (64 - c) % 64, (96 - c) % 64
    cells = np.empty((8, 8), np.uint8)
    for i in range(64):
        hi = ((i + c) % 64) < 32
        if v == 1 and i in (i0, i1):
            hi = not hi
        cells[i // 8, i % 8] = 160 if hi else 96
    return cells


def _nd_payload(doc_id: int) -> bytes:
    """MJPEG-AVI near-dup fixture: 2..4 64x64 grey frames (one aHash
    cell per 8x8 block, so the perceptual hash is bit-for-bit the cell
    sign pattern; ±32 even offsets keep the JPEG round trip exact)."""
    import numpy as np

    g, v, rb = doc_id % 12, (doc_id % 24) // 12, (doc_id // 24) % 8
    frames = [
        build_jpeg_grey(np.repeat(np.repeat(_nd_cells(g, f, v, rb), 8, 0), 8, 1))
        for f in range(2 + g % 3)
    ]
    return build_avi_mjpeg(frames, 64, 64, fps=12)


def _nd_hash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: demux + decode + aHash every frame of the
    near-dup fixture. Payloads are class-deterministic — (g, v, rb)
    fixes every frame — so decode is memoized per partition."""
    from .multimodal import average_hash

    cache: dict[tuple[int, int, int], list] = {}

    def rows(doc_id: int) -> list:
        key = (doc_id % 12, (doc_id % 24) // 12, (doc_id // 24) % 8)
        if key not in cache:
            _w, _h, frames = decode_avi_mjpeg(_nd_payload(doc_id))
            cache[key] = [(f, average_hash(px)) for f, px in enumerate(frames)]
        return cache[key]

    for pdf in it:
        if pdf.empty:
            continue
        out = [
            (int(d), f, h) for d in pdf["doc_id"] for f, h in rows(int(d))
        ]
        yield pd.DataFrame(
            out, columns=["doc_id", "frame_idx", "ahash"]
        ).astype({"doc_id": "int64", "frame_idx": "int32", "ahash": "int64"})


def _nd_oracle() -> str:
    """Closed-form replay: the frame hash is the rotation/flip sign
    pattern packed two's-complement (mean is 128 by construction, so
    bit i == sign of cell i); near-dup pairs are all DISTINCT hash
    pairs at Hamming ≤ 3. Banding needs no simulation: 4 disjoint
    16-bit bands and ≤ 3 differing bits leave ≥ 1 band bit-identical
    (pigeonhole), so band-candidate generation is provably LOSSLESS at
    this threshold and candidates+verify ≡ brute-force verify."""
    pows = [-(1 << 63)] + [1 << (63 - i) for i in range(1, 64)]
    pow_list = "[" + ", ".join(str(p) for p in pows) + "]"
    return f"""
    WITH frames AS (
      SELECT doc_id,
             doc_id % 12 AS g,
             (doc_id % 24) // 12 AS v,
             (doc_id // 24) % 8 AS rb,
             unnest(range(0, 2 + (doc_id % 12) % 3)) AS f
      FROM documents
    ),
    hv AS (
      SELECT doc_id, v, (g + 9 * f + 23 * rb) % 64 AS c FROM frames
    ),
    h AS (
      SELECT doc_id, CAST(list_sum(list_transform(range(0, 64), i ->
        CASE WHEN (((i + c) % 64 < 32)
                   <> (v = 1 AND (i = (64 - c) % 64 OR i = (96 - c) % 64)))
             THEN {pow_list}[i + 1] ELSE 0 END)) AS BIGINT) AS ahash
      FROM hv
    ),
    classes AS (
      SELECT ahash,
             CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             MIN(doc_id) AS canonical_doc
      FROM h GROUP BY ahash
    )
    SELECT a.ahash AS ahash_a, b.ahash AS ahash_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming,
           a.n_docs AS n_docs_a, b.n_docs AS n_docs_b,
           a.canonical_doc AS canonical_doc_a,
           b.canonical_doc AS canonical_doc_b
    FROM classes a JOIN classes b ON b.ahash > a.ahash
    WHERE bit_count(xor(a.ahash, b.ahash)) <= {_ND_HAMMING}
    ORDER BY ahash_a, ahash_b
    """


@register("video_frame_banded_neardup", oracle=_nd_oracle())
def video_frame_banded_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMMING-TOLERANT cross-document video-frame near-duplicate
    detection — the production case ``video_frame_ahash_dedup``'s
    exact-equality buckets miss: a re-encoded / slightly-perturbed
    frame whose perceptual hash differs in a few bits. Pipeline: demux
    AVI → native MJPEG decode → 64-bit aHash per frame → **aggregate
    to DISTINCT hash classes first** → band each class's hash into 4 ×
    16 bits (the ``dedup_simhash`` composition) → self-join inside
    capped band buckets → exact ``bit_count(xor) ≤ 3`` verify. The
    fixture plants true Hamming-2 pairs (balanced sign-flip variants),
    so the driver hash proves banding catches pairs exact equality
    cannot (the ``hamming`` column is 2, not 0).

    Correctness: with 4 disjoint bands and threshold 3 < 4, any pair
    within threshold shares ≥ 1 intact band (pigeonhole) — candidate
    generation is lossless, so the DuckDB oracle replays it as a plain
    Hamming join over hash classes.

    Scale notes (100 TB): the banded self-join runs over DISTINCT hash
    classes, not frame occurrences — the dominant exact-dup mass is
    collapsed by one hash aggregation first (same shuffle as the exact
    query), and band buckets over classes are bounded by CONTENT
    diversity, not corpus size, with a ``_ND_CAP``-class cap as the skew
    guard (overflowing buckets are dropped, the standard LSH
    recall/cost trade — observability via dedup_lsh_bucket_stats'
    pattern)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    # Dedup-before-decode (guide §8: decide with small rows, move the
    # heavy work once): the near-dup corpus is exact-duplicate-heavy by
    # design — every payload is one of 192 content classes (the
    # (g, v, rb) parameters, a closed-form function of doc_id % 192).
    # The decode worker memoizes per CLASS within a task, so scan-order
    # partitioning made every task re-decode most classes (~N_task
    # duplicate decodes per pass). Shuffling just the 8-byte doc_ids by
    # the class key first puts each class in exactly one task: each
    # distinct payload decodes ONCE per pass globally, and the shuffle
    # moves keys, not payloads (§2.3). At 100 TB the same move is
    # "group by payload fingerprint before decoding" — the standard
    # exact-dup collapse in front of an expensive decoder.
    # The partition count is explicit: the id rows are so small that
    # AQE's partition coalescing otherwise folds the exchange back to
    # ONE post-shuffle partition and the whole decode serializes into a
    # single task (measured: 1 task, 2.1 s). A keyed repartition with
    # an explicit count is exempt from coalescing; the count tracks
    # defaultParallelism, not a constant, so the shape is
    # scale-adaptive (guide §2.5).
    n_dec = spark.sparkContext.defaultParallelism
    hashed = d.repartition(
        n_dec, F.pmod(F.col("doc_id"), F.lit(192))
    ).mapInPandas(
        _nd_hash_batches, schema="doc_id long, frame_idx int, ahash long"
    )
    # r14 shape: the class table fanned out to FIVE consumers (banding
    # ×2 via the self-join, bucket sizes, and both verify-side stats
    # joins), and because each consumer pruned DIFFERENT columns into
    # the decode subtree, no two subtrees canonicalized equal — the
    # r15 plan audit showed 6 MapInPandas nodes for one decode. r15
    # pinned the table with an EAGER localCheckpoint, which fixed the
    # plan but regressed the driver's meter 2.20 → 4.02 s: the
    # materialization ran as its own serial job on every query build
    # (every bench pass), while the "duplicate" decodes it replaced had
    # been running concurrently on idle cores. r16 (VERDICT task 1):
    # (a) the class-colocated decode above makes the decode itself
    # cheap and parallel, (b) the per-class stats ride THROUGH the
    # banding explode so the two verify-side joins disappear
    # (5 consumers → 3), and (c) the checkpoint becomes LAZY — no
    # build-time job; the first consumer job materializes the 64-row
    # class table once and the block store serves the other consumers.
    # Isolated min-of-3 at sf0.1: r15 shape 3.51 s → 1.39 s (lazy);
    # eager re-measured 4.13 s, no-checkpoint 1.83 s — the lazy pin
    # wins on both sides.
    classes = hashed.groupBy("ahash").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.min("doc_id").alias("canonical_doc"),
    ).localCheckpoint(eager=False)
    band_vals = F.array(
        *[
            F.expr(f"shiftrightunsigned(ahash, {16 * j}) & 65535")
            for j in range(_ND_BANDS)
        ]
    )
    banded = classes.select(
        "ahash", "n_docs", "canonical_doc",
        F.posexplode(band_vals).alias("band", "band_val"),
    )
    sizes = banded.groupBy("band", "band_val").agg(F.count("*").alias("cnt"))
    ok = banded.join(
        F.broadcast(sizes.filter(F.col("cnt") <= _ND_CAP)),
        ["band", "band_val"],
    )
    a, b = ok.alias("a"), ok.alias("b")
    # the carried stats are functions of ahash (one classes row per
    # ahash), so distinct over (pair + stats) has exactly the same
    # cardinality as distinct over the pair alone — the r14 verify-side
    # joins are gone, not moved
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.ahash") < F.col("b.ahash")),
        )
        .select(
            F.col("a.ahash").alias("ahash_a"),
            F.col("b.ahash").alias("ahash_b"),
            F.col("a.n_docs").alias("n_docs_a"),
            F.col("b.n_docs").alias("n_docs_b"),
            F.col("a.canonical_doc").alias("canonical_doc_a"),
            F.col("b.canonical_doc").alias("canonical_doc_b"),
        )
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.expr("ahash_a ^ ahash_b")).cast("long")
        )
        .filter(F.col("hamming") <= _ND_HAMMING)
    )
    return cand.select(
        "ahash_a", "ahash_b", "hamming",
        "n_docs_a", "n_docs_b",
        "canonical_doc_a", "canonical_doc_b",
    ).orderBy("ahash_a", "ahash_b")
