"""Real-codec tests: pure-numpy PPM/BMP decode and nearest-neighbor
resize, unit-level and end-to-end through the Spark mapInPandas
pipeline (mixed corpus: real images take the real path, non-image
payloads fall back to the deterministic fake)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.multimodal import (
    _RESIZE_H,
    _RESIZE_W,
    fake_decode_meta,
    real_decode_image,
    real_resize_image,
)


def make_ppm(pixels: np.ndarray, comment: str | None = None) -> bytes:
    h, w = pixels.shape[:2]
    header = b"P6\n"
    if comment:
        header += b"# " + comment.encode() + b"\n"
    header += f"{w} {h}\n255\n".encode()
    return header + pixels.astype(np.uint8).tobytes()


def make_bmp(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal 24bpp BI_RGB BMP: BITMAPFILEHEADER + BITMAPINFOHEADER."""
    h, w = pixels.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = pixels[:, :, ::-1]  # RGB → BGR
    if not top_down:
        rows = rows[::-1]  # bottom-up storage
    body = b"".join(
        rows[r].astype(np.uint8).tobytes().ljust(stride, b"\x00") for r in range(h)
    )
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h if top_down else h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + body


def _gradient(h: int, w: int) -> np.ndarray:
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :] * 3 % 256
    img[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 5 % 256
    img[:, :, 2] = 7
    return img


def test_ppm_roundtrip_with_comment():
    img = _gradient(13, 17)
    w, h, decoded = real_decode_image(make_ppm(img, comment="created by test"))
    assert (w, h) == (17, 13)
    np.testing.assert_array_equal(decoded, img)


def test_bmp_roundtrip_bottom_up_and_top_down():
    # w=3 forces row padding (9 bytes data, 12-byte stride)
    img = _gradient(5, 3)
    for top_down in (False, True):
        w, h, decoded = real_decode_image(make_bmp(img, top_down=top_down))
        assert (w, h) == (3, 5)
        np.testing.assert_array_equal(decoded, img)


def test_compressed_and_non_image_raise_not_implemented():
    # PNG (round 6) and baseline JPEG (round 7) now decode natively; a
    # recognized magic with a garbage body is a typed ValueError —
    # still the quarantine path, just a different class of failure
    with pytest.raises(ValueError):
        real_decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        real_decode_image(b"\xff\xd8\xff\xe0 jpeg soi/app0 garbage body")
    with pytest.raises(NotImplementedError):
        real_decode_image(b"just some text payload")
    # 16-bit PPM is recognized but unsupported
    with pytest.raises(NotImplementedError):
        real_decode_image(b"P6\n2 2\n65535\n" + b"\x00" * 24)


def test_truncated_ppm_header_fails_loudly():
    with pytest.raises(ValueError):
        real_decode_image(b"P6\n17 13")


def test_resize_nearest_neighbor_exact_gather():
    img = _gradient(4, 4)
    down = real_resize_image(img, 2, 2)
    # nearest with floor gather: rows/cols 0 and 2
    np.testing.assert_array_equal(down, img[[0, 2]][:, [0, 2]])
    up = real_resize_image(img, 8, 8)
    assert up.shape == (8, 8, 3)
    # every source pixel appears exactly in a 2x2 block
    np.testing.assert_array_equal(up[::2, ::2], img)


def test_mixed_corpus_through_spark_pipeline(spark):
    """End-to-end: real images decode with REAL dimensions through
    mapInPandas; text payloads in the same batch fall back to the fake.
    This is the mixed-corpus contract a media pipeline needs — one
    plan, per-payload codec dispatch."""
    from pyspark_postgres_loader_spark.operators.multimodal import (
        _DECODE_SCHEMA,
        _RESIZE_SCHEMA,
        _decode_batches,
        _resize_batches,
    )

    ppm = make_ppm(_gradient(300, 250))
    bmp = make_bmp(_gradient(100, 400))
    txt = b"not an image at all"
    df = spark.createDataFrame(
        [(1, "image", bytearray(ppm)), (2, "image", bytearray(bmp)),
         (3, "text", bytearray(txt))],
        "doc_id long, media_type string, payload binary",
    )

    meta = {r.doc_id: r for r in df.mapInPandas(_decode_batches, _DECODE_SCHEMA).collect()}
    assert (meta[1].width, meta[1].height) == (250, 300)
    assert (meta[2].width, meta[2].height) == (400, 100)
    fw, fh, _ = fake_decode_meta(txt)
    assert (meta[3].width, meta[3].height) == (fw, fh)

    rs = {r.doc_id: r for r in
          df.select("doc_id", "payload").mapInPandas(_resize_batches, _RESIZE_SCHEMA).collect()}
    # real resample: clamped dims, exact pixel-budget byte count
    assert (rs[1].resized_w, rs[1].resized_h) == (min(250, _RESIZE_W), min(300, _RESIZE_H))
    assert rs[1].resized_bytes == rs[1].resized_w * rs[1].resized_h * 3
    assert (rs[2].resized_w, rs[2].resized_h) == (min(400, _RESIZE_W), min(100, _RESIZE_H))
    assert rs[2].resized_bytes == rs[2].resized_w * rs[2].resized_h * 3


# ---------------------------------------------------------------------------
# REAL wav path
# ---------------------------------------------------------------------------


def test_wav_parser_round_trips_stdlib_wave_writer():
    import io
    import wave

    import numpy as np

    from pyspark_postgres_loader_spark.operators.multimodal import (
        build_wav_pcm16,
        real_decode_audio,
    )

    samples = (np.arange(500, dtype=np.int64) * 977 + 13) % 65536 - 32768
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.astype("<i2").tobytes())
    parsed, rate = real_decode_audio(buf.getvalue())
    assert rate == 8000
    assert np.array_equal(parsed.astype(np.int64), samples)
    # our own writer parses to the identical array
    p2, r2 = real_decode_audio(build_wav_pcm16(samples))
    assert r2 == 8000 and np.array_equal(p2, parsed)


def test_wav_parser_rejects_unsupported_payloads():
    import struct

    import pytest as _pytest

    from pyspark_postgres_loader_spark.operators.multimodal import (
        build_wav_pcm16,
        real_decode_audio,
    )

    with _pytest.raises(NotImplementedError):
        real_decode_audio(b"ID3\x03mp3-ish-bytes")  # not RIFF at all
    wav = bytearray(build_wav_pcm16([0, 1, -1]))
    wav[20:22] = struct.pack("<H", 85)  # format tag: MPEG layer 3
    with _pytest.raises(NotImplementedError):
        real_decode_audio(bytes(wav))
    with _pytest.raises(ValueError):
        real_decode_audio(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data


def test_decode_quarantine_routes_without_failing(spark):
    from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    rows = {
        r.status: r
        for r in QUERIES["multimodal_decode_quarantine"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert set(rows) == {"ok", "corrupt", "unsupported"}
    # the real decoder ran for every ok row: pixel totals are nonzero
    assert rows["ok"].total_pixels > 0
    assert rows["corrupt"].total_pixels == 0
    assert rows["unsupported"].n_docs > rows["ok"].n_docs  # 3/5 of docs


# --- perceptual average-hash near-dup ---------------------------------------


def test_ppm_roundtrip_is_exact():
    import numpy as np

    from pyspark_postgres_loader_spark.operators.multimodal import (
        build_ppm,
        real_decode_image,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    w, h, back = real_decode_image(build_ppm(img))
    assert (w, h) == (9, 5)
    assert (back == img).all()


def test_ahash_collapses_noise_but_separates_groups():
    from pyspark_postgres_loader_spark.operators.multimodal import (
        _AHASH_GROUPS,
        _ahash_payload,
        average_hash,
        real_decode_image,
    )

    def h(doc_id):
        return average_hash(real_decode_image(_ahash_payload(doc_id))[2])

    # same group, byte-distinct payloads (real noise robustness, not a
    # degenerate identical-bytes fixture), identical hash
    for a, b in [(0, _AHASH_GROUPS), (5, 5 + 3 * _AHASH_GROUPS)]:
        assert _ahash_payload(a) != _ahash_payload(b)
        assert h(a) == h(b)
    # distinct groups -> distinct hashes
    hashes = {h(g) for g in range(_AHASH_GROUPS)}
    assert len(hashes) == _AHASH_GROUPS


def test_ahash_near_dup_buckets_are_group_pure(spark):
    from pyspark_postgres_loader_spark.operators.multimodal import _AHASH_GROUPS
    from pyspark_postgres_loader_spark.registry import QUERIES, _ensure_loaded
    from pyspark_postgres_loader_spark.tables import load_table

    _ensure_loaded()
    sf = "/root/testdata/sf0.001"
    rows = QUERIES["multimodal_ahash_near_dup"].fn(spark, sf).collect()
    assert len(rows) == _AHASH_GROUPS
    # every doc is accounted for and each bucket is exactly one residue
    # class of doc_id % _AHASH_GROUPS (canonical = smallest id = residue)
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sorted(r.canonical_doc_id for r in rows) == list(range(_AHASH_GROUPS))
    for r in rows:
        assert r.n_dups == r.n_docs - 1
        assert r.n_docs in (n_docs // _AHASH_GROUPS, n_docs // _AHASH_GROUPS + 1)


def _build_wav_g711(codes: bytes, fmt_tag: int, rate: int = 8000) -> bytes:
    """Test-side RIFF writer for G.711 payloads (format 6 = A-law,
    7 = µ-law): 8-bit mono companded samples."""
    import struct

    hdr = b"RIFF" + struct.pack("<I", 36 + len(codes)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, fmt_tag, 1, rate, rate, 1, 8)
    return hdr + fmt + b"data" + struct.pack("<I", len(codes)) + codes


def test_g711_tables_match_cpython_reference():
    """Every one of the 256 companded bytes expands to the exact int16
    CPython's audioop (the C reference implementation of G.711)
    produces — an independent implementation, not our own inverse."""
    audioop = pytest.importorskip(
        "audioop", reason="audioop removed in Python 3.13+"
    )
    import numpy as np

    from pyspark_postgres_loader_spark.operators.multimodal import (
        _alaw_table,
        _mulaw_table,
    )

    raw = bytes(range(256))
    assert np.array_equal(
        _mulaw_table()[np.frombuffer(raw, np.uint8)],
        np.frombuffer(audioop.ulaw2lin(raw, 2), "<i2"),
    )
    assert np.array_equal(
        _alaw_table()[np.frombuffer(raw, np.uint8)],
        np.frombuffer(audioop.alaw2lin(raw, 2), "<i2"),
    )


def test_g711_wav_decodes_end_to_end():
    import numpy as np

    from pyspark_postgres_loader_spark.operators.multimodal import (
        real_decode_audio,
    )

    codes = bytes((i * 37) % 256 for i in range(500))
    for fmt_tag in (6, 7):
        samples, rate = real_decode_audio(_build_wav_g711(codes, fmt_tag))
        assert rate == 8000
        assert samples.dtype == np.int16 and len(samples) == 500
        # µ-law of 0xFF (complement 0x00) is +0 / A-law near zero: just
        # pin that the expansion is non-trivial and signed both ways
        assert samples.min() < 0 < samples.max()
    # unsupported compressed tag still quarantines
    with pytest.raises(NotImplementedError):
        real_decode_audio(_build_wav_g711(codes, fmt_tag=85))  # MP3 tag
