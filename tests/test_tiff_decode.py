"""Baseline TIFF: hand-assembled known-bytes streams in BOTH byte
orders (no independent TIFF decoder ships in this environment, so the
spec-pinned byte layout is the symmetric-bug guard), PackBits edges,
typed quarantine, oracle compare."""

from __future__ import annotations

import random

import pytest

from pyspark_postgres_loader_spark.operators.tiff import (
    _TIFF_GROUPS,
    _tiff_payload,
    _tiff_pixels,
    build_tiff_grey,
    decode_tiff_grey,
    packbits_decode,
    packbits_encode,
    tiff_lzw_decode,
    tiff_lzw_encode,
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
    for codec in (2, 6, 7):  # CCITT, old JPEG, new JPEG
        with pytest.raises(NotImplementedError,
                           match=f"compression {codec}"):
            decode_tiff_grey(
                build_tiff_grey(px, tag_override={259: (3, 1, codec)})
            )
    # LZW graduated from 'unsupported' to decoded: a raw strip
    # MIS-DECLARED as LZW is now structural damage, not a boundary
    with pytest.raises(ValueError, match="LZW"):
        decode_tiff_grey(
            build_tiff_grey(px, tag_override={259: (3, 1, 5)})
        )
    # a tiled declaration without tile tables is typed damage too
    with pytest.raises(ValueError, match="tile"):
        decode_tiff_grey(
            build_tiff_grey(px, tag_override={322: (4, 1, 16),
                                              323: (4, 1, 16)})
        )
    with pytest.raises(NotImplementedError, match="predictor"):
        decode_tiff_grey(
            build_tiff_grey(px, tag_override={317: (3, 1, 3)})
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


def _pack_msb(codes, widths):
    """Test-local MSB bit packer (independent of the encoder's
    dictionary logic) — turns a hand-derived code list into bytes."""
    acc = bits = 0
    out = bytearray()
    for c, w in zip(codes, widths):
        acc = (acc << w) | c
        bits += w
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def test_lzw_spec_example_codes():
    """The TIFF 6.0 §13 worked example (7 7 7 8 8 7 7 6 6): the code
    sequence is hand-derived from the spec's algorithm and pinned;
    the encoder must produce exactly that bitstream and the decoder
    must invert it."""
    data = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    codes = [256, 7, 258, 8, 8, 258, 6, 6, 257]
    blob = _pack_msb(codes, [9] * len(codes))
    assert tiff_lzw_encode(data) == blob
    assert tiff_lzw_decode(blob, len(data)) == data


def test_lzw_roundtrip_battery_crosses_width_boundaries():
    rng = random.Random(11)
    for n in (1, 300, 1000, 5000, 60_000):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert tiff_lzw_decode(tiff_lzw_encode(data), n) == data
    runs = bytes(rng.choice(b"xy") for _ in range(9000))
    assert tiff_lzw_decode(tiff_lzw_encode(runs), len(runs)) == runs


def test_lzw_typed_errors():
    good = tiff_lzw_encode(b"hello world " * 30)
    with pytest.raises(ValueError, match="EOI"):
        tiff_lzw_decode(good, 1000)  # wrong declared size
    with pytest.raises(ValueError):
        tiff_lzw_decode(good[:-4], 360)  # cut before EOI
    with pytest.raises(ValueError, match="Clear"):
        tiff_lzw_decode(b"\x00\x01\x02\x03", 4)


def test_lzw_tiled_predictor_matrix():
    """Every (endianness, layout, predictor) cell decodes to the
    exact pixel grid, tile padding discarded."""
    px = [[(x * 7 + y * 11) % 256 for x in range(37)] for y in range(21)]
    for be in (False, True):
        for tile in (None, (16, 16), (32, 16)):
            for pred in (1, 2):
                blob = build_tiff_grey(
                    px, big_endian=be, compression=5,
                    predictor=pred, tile=tile,
                )
                w, h, b2, nch, rows = decode_tiff_grey(blob)
                assert (w, h, b2) == (37, 21, be)
                assert [[rows[y][x] for x in range(w)]
                        for y in range(h)] == px
                if tile == (16, 16):
                    assert nch == 6  # 3 across x 2 down
                elif tile == (32, 16):
                    assert nch == 4


def test_tile_dimensions_must_be_16_multiples():
    px = [[0] * 20 for _ in range(20)]
    blob = build_tiff_grey(px, tile=(16, 16),
                           tag_override={322: (4, 1, 20)})
    with pytest.raises(ValueError, match="16-multiple"):
        decode_tiff_grey(blob)


def test_lzw_fixture_truncation_always_fails_every_group():
    from pyspark_postgres_loader_spark.operators.tiff import (
        _TL_GROUPS,
        _tl_payload,
    )

    for g in range(_TL_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _TL_GROUPS
        with pytest.raises(Exception):
            decode_tiff_grey(_tl_payload(doc_id))


def test_lzw_tiled_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(
        spark, "/root/testdata/sf0.001", "multimodal_tiff_lzw_tiled_decode"
    )


def test_zero_count_tag_is_missing_not_indexerror():
    """An IFD entry with count=0 stores no values — consumers must
    see the tag as ABSENT (typed 'missing required tag'), never index
    an empty list (campaign-fuzz finding, round 12)."""
    import struct

    from pyspark_postgres_loader_spark.operators.tiff import (
        decode_tiff_grey,
    )

    # II header + one-entry IFD: tag 256 (ImageWidth), SHORT, count 0
    blob = (
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 256, 3, 0) + b"\x00\x00\x00\x00"
        + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="missing required TIFF tag"):
        decode_tiff_grey(blob)
