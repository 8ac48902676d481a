"""PNG decoder tests (operators/multimodal._decode_png): the test side
writes PNGs with its own independent forward-filter implementations
(Sub/Up/Average/Paeth from spec §9), so the decoder's un-filtering is
verified against a second implementation, not its own inverse."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.multimodal import real_decode_image


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_row(ftype: int, row: np.ndarray, prior: np.ndarray, bpp: int) -> bytes:
    out = bytearray([ftype])
    n = len(row)
    for i in range(n):
        x = int(row[i])
        left = int(row[i - bpp]) if i >= bpp else 0
        up = int(prior[i])
        upleft = int(prior[i - bpp]) if i >= bpp else 0
        if ftype == 0:
            v = x
        elif ftype == 1:
            v = x - left
        elif ftype == 2:
            v = x - up
        elif ftype == 3:
            v = x - ((left + up) >> 1)
        else:
            v = x - _paeth(left, up, upleft)
        out.append(v & 0xFF)
    return bytes(out)


def _make_png(
    pixels: np.ndarray,  # (h, w, channels) uint8
    color_type: int,
    filters=None,
    palette: np.ndarray | None = None,
    bit_depth: int = 8,
    interlace: int = 0,
) -> bytes:
    h, w, channels = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    flat = pixels.reshape(h, w * channels)
    raw = bytearray()
    if interlace:
        # Adam7 forward: seven pass sub-images, each filtered with its
        # own prior-row chain (independent re-implementation of §8.2)
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            sub = pixels[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            sflat = sub.reshape(sub.shape[0], sub.shape[1] * channels)
            prior = np.zeros(sflat.shape[1], np.uint8)
            for y in range(sub.shape[0]):
                ftype = (filters or [0])[y % len(filters or [0])]
                raw += _filter_row(ftype, sflat[y], prior, channels)
                prior = sflat[y]
    else:
        prior = np.zeros(w * channels, np.uint8)
        for y in range(h):
            ftype = (filters or [0])[y % len(filters or [0])]
            raw += _filter_row(ftype, flat[y], prior, channels)
            prior = flat[y]
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.tobytes())
    out += _chunk(b"tEXt", b"comment\x00ancillary chunk to skip")
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _rgb(h, w, seed=3):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_rgb_round_trip_each_filter(ftype):
    px = _rgb(13, 17)
    w, h, got = real_decode_image(_make_png(px, 2, filters=[ftype]))
    assert (w, h) == (17, 13)
    assert np.array_equal(got, px)


def test_mixed_filters_and_ancillary_chunks():
    px = _rgb(24, 9, seed=9)
    w, h, got = real_decode_image(_make_png(px, 2, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, px)


def test_greyscale_and_rgba_and_palette():
    grey = np.random.RandomState(1).randint(0, 256, (7, 11, 1)).astype(np.uint8)
    w, h, got = real_decode_image(_make_png(grey, 0, filters=[4]))
    assert np.array_equal(got, np.repeat(grey, 3, axis=2))

    rgba = np.random.RandomState(2).randint(0, 256, (6, 5, 4)).astype(np.uint8)
    w, h, got = real_decode_image(_make_png(rgba, 6, filters=[1, 2]))
    assert np.array_equal(got, rgba[:, :, :3])  # alpha dropped

    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], np.uint8)
    idx = np.random.RandomState(4).randint(0, 4, (8, 8, 1)).astype(np.uint8)
    w, h, got = real_decode_image(_make_png(idx, 3, filters=[3], palette=pal))
    assert np.array_equal(got, pal[idx[:, :, 0]])

    ga = np.random.RandomState(5).randint(0, 256, (4, 4, 2)).astype(np.uint8)
    w, h, got = real_decode_image(_make_png(ga, 4, filters=[2]))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))


def test_unsupported_variants_quarantine():
    px = _rgb(4, 4)
    with pytest.raises(NotImplementedError):
        real_decode_image(_make_png(px, 2, bit_depth=4))  # sub-byte depth
    # truncated IDAT → typed failure for the quarantine path
    good = _make_png(px, 2, filters=[4])
    with pytest.raises(Exception):
        real_decode_image(good[:60])


def test_16bit_png_takes_high_bytes():
    """16-bit RGB: filters run at the byte level with a doubled
    left-neighbor distance; output is the high byte of each big-endian
    sample. Encoded here with filter 0 rows of raw u16 data plus a
    Sub-filtered variant (bpp distance 6)."""
    h, w = 5, 7
    rng = np.random.RandomState(11)
    samples = rng.randint(0, 65536, (h, w, 3)).astype(">u2")
    for ftype in (0, 1, 2):
        ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
        flat = samples.reshape(h, w * 3).view(np.uint8).reshape(h, w * 6)
        raw = bytearray()
        prior = np.zeros(w * 6, np.uint8)
        for y in range(h):
            raw += _filter_row(ftype, flat[y], prior, 6)  # bpp = 6 bytes
            prior = flat[y]
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        gw, gh, got = real_decode_image(png)
        assert (gw, gh) == (w, h)
        assert np.array_equal(got, (samples >> 8).astype(np.uint8))


@pytest.mark.parametrize("shape", [(16, 16), (13, 17), (1, 1), (2, 3), (9, 8)])
def test_adam7_interlaced_round_trip(shape):
    """Adam7 de-interlacing for shapes that exercise empty passes
    (1x1 has six empty passes) and partial tiles; mixed filters per
    pass row."""
    h, w = shape
    px = _rgb(h, w, seed=h * 100 + w)
    got_w, got_h, got = real_decode_image(
        _make_png(px, 2, filters=[0, 1, 2, 3, 4], interlace=1)
    )
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(got, px)


def test_adam7_truncated_raster_quarantines():
    px = _rgb(16, 16)
    full = _make_png(px, 2, filters=[4], interlace=1)
    with pytest.raises(Exception):
        real_decode_image(full[:80])
