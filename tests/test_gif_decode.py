"""GIF decoder tests (operators/multimodal.real_decode_image): the
test side carries its own INDEPENDENT GIF LZW compressor (the real
dictionary-building algorithm from the public spec, not the product
code inverted), so a bit-packing or width-growth bug in either side
breaks the round trip instead of cancelling out."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.multimodal import real_decode_image


def _lzw_compress(min_code_size: int, indices: bytes) -> bytes:
    """Reference GIF-LZW compressor: dictionary of sequences → codes,
    CLEAR first, widths grow when the NEXT code would overflow the
    current width (mirror of the decoder's post-add growth), END last,
    little-endian bit packing."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = bits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    seq = b""
    for b in indices:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                # standard GIF rule: the next emitted code can be as
                # large as the entry just added, so the encoder switches
                # width once that entry's code needs width+1 bits —
                # exactly when the decoder's table reaches 2^width
                width += 1
        seq = bytes([b])
    if seq:
        emit(table[seq])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _make_gif(
    palette: list[tuple[int, int, int]],
    indices: np.ndarray,  # (h, w) uint8
    interlace: bool = False,
    extension: bool = False,
) -> bytes:
    h, w = indices.shape
    c = max(2, (len(palette) - 1).bit_length())
    npal = 1 << c
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((c - 1) & 0x07))  # GCT flag + size bits
    out += b"\x00\x00"
    for i in range(npal):
        out += bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
    if extension:  # graphics-control extension the decoder must skip
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out.append(0x2C)
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0x00)
    rows = indices
    if interlace:  # store rows pass-major (8/8, 4/8, 2/4, 1/2 starts)
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        rows = indices[order]
    out.append(c)
    data = _lzw_compress(c, rows.tobytes())
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


_PALETTE = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]


def _pattern(h: int, w: int) -> np.ndarray:
    # repetitive texture → real dictionary growth in the LZW stream
    y, x = np.mgrid[0:h, 0:w]
    return ((x // 3 + y // 2) % len(_PALETTE)).astype(np.uint8)


def test_gif_round_trip_compressed_stream():
    idx = _pattern(23, 31)
    gif = _make_gif(_PALETTE, idx)
    # the stream really is LZW-compressed (shorter than raw indices)
    assert len(gif) < 23 * 31 + 3 * 8 + 32
    w, h, pixels = real_decode_image(gif)
    assert (w, h) == (31, 23)
    expected = np.array(_PALETTE, np.uint8)[idx]
    assert np.array_equal(pixels, expected)


def test_gif_interlaced_and_extension_blocks():
    idx = _pattern(17, 9)
    gif = _make_gif(_PALETTE, idx, interlace=True, extension=True)
    w, h, pixels = real_decode_image(gif)
    assert (w, h) == (9, 17)
    assert np.array_equal(pixels, np.array(_PALETTE, np.uint8)[idx])


def test_gif_single_color_and_width_growth():
    # 300 identical pixels: max run-length dictionary pressure
    idx = np.zeros((10, 30), np.uint8)
    gif = _make_gif(_PALETTE[:2], idx)
    w, h, pixels = real_decode_image(gif)
    assert (w, h) == (30, 10)
    assert np.array_equal(pixels, np.zeros((10, 30, 3), np.uint8))
    # large many-color image: forces code width past its initial value
    rng = np.random.RandomState(7)
    big_pal = [(i, 255 - i, (i * 7) % 256) for i in range(64)]
    idx2 = rng.randint(0, 64, size=(40, 50)).astype(np.uint8)
    w2, h2, px2 = real_decode_image(_make_gif(big_pal, idx2))
    assert (w2, h2) == (50, 40)
    assert np.array_equal(px2, np.array(big_pal, np.uint8)[idx2])


def test_truncated_gif_raises_for_quarantine():
    gif = _make_gif(_PALETTE, _pattern(12, 12))
    with pytest.raises(Exception):
        real_decode_image(gif[: len(gif) // 2])


def test_known_bytes_hand_decoded():
    """A 2x2 GIF assembled byte-by-byte from the published spec (not
    via the test compressor): 2-color palette, pixels [[1,0],[0,1]].
    LZW: min_code_size=2, codes CLEAR(4),1,0,0 at width 3 — processing
    the fourth code adds table entry 8, reaching 2^3, so width grows to
    4 (the standard giflib/Pillow rule, NOT the early-change one) —
    then 1,END(5) at width 4. Packed LSB-first:
    4 | 1<<3 | 0<<6 | 0<<9 | 1<<12 | 5<<16 = 0x5100C
    → bytes 0x0C 0x10 0x05."""
    gif = bytes(
        b"GIF89a"
        + struct.pack("<HH", 2, 2)
        + bytes([0x80, 0, 0])          # GCT of size 2
        + bytes([0, 0, 0, 255, 255, 255])
        + bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0])
        + bytes([2])                    # LZW min code size
        + bytes([3, 0x0C, 0x10, 0x05])  # one 3-byte sub-block
        + bytes([0, 0x3B])
    )
    w, h, px = real_decode_image(gif)
    assert (w, h) == (2, 2)
    expected = np.array(
        [[[255, 255, 255], [0, 0, 0]], [[0, 0, 0], [255, 255, 255]]], np.uint8
    )
    assert np.array_equal(px, expected)


def test_externally_encoded_gifs_decode():
    """Real GIFs produced by real encoders (the stdlib's idlelib icons),
    not by the test compressor — this is the case a symmetric
    width-growth bug in decoder+test-compressor would hide. Every file
    must decode, match its logical-screen header dimensions, and
    produce non-trivial pixels."""
    import glob
    import os

    idlelib = pytest.importorskip("idlelib")
    icon_dir = os.path.join(os.path.dirname(idlelib.__file__), "Icons")
    paths = sorted(glob.glob(os.path.join(icon_dir, "*.gif")))
    if not paths:
        pytest.skip("no idlelib GIF icons in this Python install")
    for path in paths:
        payload = open(path, "rb").read()
        sw, sh = struct.unpack("<HH", payload[6:10])
        w, h, px = real_decode_image(payload)
        assert (w, h) == (sw, sh), path
        assert px.shape == (h, w, 3), path
        assert int(px.sum()) > 0, path


def test_gif_decodes_through_spark_pipeline(spark):
    """Executor-side integration: GIF payloads travel through a
    mapInPandas decode exactly like the registered decode queries —
    real GIFs yield true dimensions, junk quarantines, one batch."""
    import pandas as pd

    gif_a = _make_gif(_PALETTE, _pattern(6, 8))
    gif_b = _make_gif(_PALETTE, _pattern(11, 4), interlace=True)

    def decode_batch(it):
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, px = real_decode_image(bytes(payload))
                    rows.append((int(doc_id), "ok", w, h, int(px.sum())))
                except Exception:
                    rows.append((int(doc_id), "quarantined", 0, 0, 0))
            yield pd.DataFrame(
                rows, columns=["doc_id", "status", "w", "h", "px_sum"]
            )

    df = spark.createDataFrame(
        [(1, bytearray(gif_a)), (2, bytearray(gif_b)), (3, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    out = {
        r.doc_id: r
        for r in df.mapInPandas(
            decode_batch, schema="doc_id long, status string, w int, h int, px_sum long"
        ).collect()
    }
    assert (out[1].status, out[1].w, out[1].h) == ("ok", 8, 6)
    assert (out[2].status, out[2].w, out[2].h) == ("ok", 4, 11)
    assert out[3].status == "quarantined"
    expected = int(np.array(_PALETTE, np.uint8)[_pattern(6, 8)].sum())
    assert out[1].px_sum == expected
