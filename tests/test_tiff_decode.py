"""Baseline TIFF: hand-assembled known-bytes streams in BOTH byte
orders (no independent TIFF decoder ships in this environment, so the
spec-pinned byte layout is the symmetric-bug guard), PackBits edges,
typed quarantine, oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.tiff import (
    _TIFF_GROUPS,
    _tiff_payload,
    _tiff_pixels,
    build_tiff_grey,
    decode_tiff_grey,
    packbits_decode,
    packbits_encode,
)


def _hand_ii() -> bytes:
    """2x2 little-endian TIFF, one uncompressed strip at offset 8,
    IFD at 12, assembled byte by byte from the TIFF 6.0 layout."""
    return bytes.fromhex(
        "49492a00 0c000000"  # II, 42, IFD offset 12
        "01020304"  # strip data: rows (1,2),(3,4)
        "0900"  # 9 IFD entries
        "0001 0400 01000000 02000000"  # 256 ImageWidth  LONG 2
        "0101 0400 01000000 02000000"  # 257 ImageLength LONG 2
        "0201 0300 01000000 08000000"  # 258 BitsPerSample SHORT 8
        "0301 0300 01000000 01000000"  # 259 Compression none
        "0601 0300 01000000 01000000"  # 262 Photometric BlackIsZero
        "1101 0400 01000000 08000000"  # 273 StripOffsets [8]
        "1501 0300 01000000 01000000"  # 277 SamplesPerPixel 1
        "1601 0400 01000000 02000000"  # 278 RowsPerStrip 2
        "1701 0400 01000000 04000000"  # 279 StripByteCounts [4]
        "00000000"  # next IFD: none
    )


def _hand_mm() -> bytes:
    """The same image big-endian. The SHORT values are LEFT-justified
    in the 4-byte field — in MM order that means the value sits in the
    FIRST two bytes (00 08 00 00), the classic endianness bug."""
    return bytes.fromhex(
        "4d4d002a 0000000c"
        "01020304"
        "0009"
        "0100 0004 00000001 00000002"
        "0101 0004 00000001 00000002"
        "0102 0003 00000001 00080000"  # SHORT 8, left-justified
        "0103 0003 00000001 00010000"
        "0106 0003 00000001 00010000"
        "0111 0004 00000001 00000008"
        "0115 0003 00000001 00010000"
        "0116 0004 00000001 00000002"
        "0117 0004 00000001 00000004"
        "00000000"
    )


def test_hand_assembled_both_byte_orders():
    for stream, be in ((_hand_ii(), False), (_hand_mm(), True)):
        w, h, gotbe, n_strips, rows = decode_tiff_grey(stream)
        assert (w, h, gotbe, n_strips) == (2, 2, be, 1)
        assert [list(r) for r in rows] == [[1, 2], [3, 4]]


def test_encoder_matches_hand_bytes_ii():
    """Our encoder must emit exactly the hand-assembled II stream for
    the same image/layout (tag order is sorted, strip at offset 8)."""
    got = build_tiff_grey([[1, 2], [3, 4]], rows_per_strip=2, compression=1)
    assert got == _hand_ii()


def test_packbits_roundtrip_edges():
    cases = [
        b"", b"a", b"ab", b"aaab", b"a" * 300, bytes(range(200)),
        b"xxyyyzzzzabc" * 11, b"ab" + b"c" * 130 + b"de",
    ]
    for row in cases:
        assert packbits_decode(packbits_encode(row), len(row)) == row
    # the 128 control byte is a documented noop
    assert packbits_decode(b"\x80\x00a", 1) == b"a"
    with pytest.raises(ValueError):
        packbits_decode(b"\xfe", 3)  # run missing its byte
    with pytest.raises(ValueError):
        packbits_decode(b"\x02ab", 3)  # literal short one byte


def test_multistrip_and_short_last_strip():
    px = _tiff_pixels(3)  # 22x13 -> 4 strips of rps=4, last has 1 row
    for comp in (1, 32773):
        w, h, _be, n_strips, rows = decode_tiff_grey(
            build_tiff_grey(px, rows_per_strip=4, compression=comp)
        )
        assert (w, h, n_strips) == (22, 13, 4)
        assert [list(r) for r in rows] == px


def test_typed_quarantine():
    px = [[0, 1], [2, 3]]
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_tiff_grey(
            build_tiff_grey(px, tag_override={259: (3, 1, 5)})
        )
    with pytest.raises(NotImplementedError, match="tiled"):
        decode_tiff_grey(
            build_tiff_grey(px, tag_override={322: (4, 1, 16)})
        )
    with pytest.raises(NotImplementedError, match="BitsPerSample"):
        decode_tiff_grey(
            build_tiff_grey(px, tag_override={258: (3, 1, 16)})
        )
    with pytest.raises(NotImplementedError, match="multi-sample"):
        decode_tiff_grey(
            build_tiff_grey(px, tag_override={277: (3, 1, 3)})
        )
    good = build_tiff_grey(px)
    with pytest.raises(ValueError):
        decode_tiff_grey(good[: len(good) // 2])
    with pytest.raises(ValueError, match="byte order"):
        decode_tiff_grey(b"XX" + good[2:])


def test_fixture_truncation_always_fails_every_group():
    for g in range(_TIFF_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _TIFF_GROUPS
        with pytest.raises(Exception):
            decode_tiff_grey(_tiff_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "multimodal_tiff_decode")
