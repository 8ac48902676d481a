"""Native FLAC codec: round trips per subframe type and stereo
layout, partitioned/escaped Rice residuals, wasted bits, CRC-8/16 and
MD5 integrity, and a HAND-ASSEMBLED known-bytes stream (built here
from the spec with an independent bit/CRC implementation) so a
symmetric encoder+decoder bug cannot cancel out.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_postgres_loader_spark.operators.flac import (
    FlacCrcError,
    build_flac,
    decode_flac,
)


# --- independent test-side helpers (deliberately NOT the product's) ---

def _crc8_ref(data: bytes) -> int:
    # bitwise long division by x^8+x^2+x+1, written differently from
    # the product (table-free shift-subtract over a big int)
    v = int.from_bytes(data + b"\x00", "big")
    poly = 0x107
    for bit in range(len(data) * 8 - 1, -1, -1):
        if v >> (bit + 8) & 1:
            v ^= poly << bit
    return v & 0xFF


def _crc16_ref(data: bytes) -> int:
    v = int.from_bytes(data + b"\x00\x00", "big")
    poly = 0x18005
    for bit in range(len(data) * 8 - 1, -1, -1):
        if v >> (bit + 16) & 1:
            v ^= poly << bit
    return v & 0xFFFF


def _streaminfo(n: int, rate: int, nch: int, bps: int) -> bytes:
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    return (
        b"fLaC" + bytes([0x80, 0, 0, 34])
        + n.to_bytes(2, "big") * 2 + bytes(6)  # blocksizes; framesizes unknown
        + packed.to_bytes(8, "big") + bytes(16)  # md5 unknown -> unchecked
    )


def test_hand_assembled_constant_stream():
    """Mono, 16-bit, 4 samples of value 5 in a CONSTANT subframe,
    assembled bit by bit from the spec: sync 0xFFF8, blocksize code 6
    (8-bit n-1), rate code 0, channel assignment 0, sample size 0b100,
    frame number 0. Every byte below is spelled out."""
    hdr = bytes([0xFF, 0xF8, 0x60, 0x08, 0x00, 0x03])
    hdr += bytes([_crc8_ref(hdr)])
    # subframe: pad 0, type 000000 (constant), wasted 0 -> 0x00; then
    # the 16-bit value 5 -> exactly 3 bytes, already byte-aligned
    frame = hdr + bytes([0x00, 0x00, 0x05])
    frame += _crc16_ref(frame).to_bytes(2, "big")
    stream = _streaminfo(4, 8000, 1, 16) + frame
    assert stream.hex() == (
        "664c6143800000220004000400000000000001f400f0000000040000000000"
        "0000000000000000000000fff860080003b2000005fcb4"
    )
    rate, bps, chans = decode_flac(stream)
    assert (rate, bps) == (8000, 16)
    assert chans == [[5, 5, 5, 5]]


def test_hand_assembled_fixed1_rice2_stream():
    """Mono FIXED order 1 with a METHOD-1 (5-bit parameter) Rice
    residual — the product encoder always writes method 0, so this
    decode path only gets exercised by an external byte source like
    this hand vector. Samples 5,6,7,8: warm-up 5, residuals all +1."""
    hdr = bytes([0xFF, 0xF8, 0x60, 0x08, 0x00, 0x03])
    hdr += bytes([_crc8_ref(hdr)])
    # subframe header: 0 001001 0 -> 0x12; warm-up 0x0005
    # residual: method 01, partition order 0000, param 00000 (k=0),
    # three values zigzag(+1)=2 -> unary 001 each; pad 4 zero bits
    # bits: 01 0000 00000 | 001 001 001 | 0000
    #     = 01000000 00000100 10010000 -> 0x40 0x04 0x90
    frame = hdr + bytes([0x12, 0x00, 0x05, 0x40, 0x04, 0x90])
    frame += _crc16_ref(frame).to_bytes(2, "big")
    stream = _streaminfo(4, 8000, 1, 16) + frame
    rate, _bps, chans = decode_flac(stream)
    assert chans == [[5, 6, 7, 8]]


@pytest.mark.parametrize("layout", ["independent", "left_side",
                                    "right_side", "mid_side"])
def test_stereo_layout_roundtrip(layout):
    rng = np.random.RandomState(3)
    left = [int(v) for v in rng.randint(-3000, 3000, 96)]
    right = [int(v) for v in rng.randint(-3000, 3000, 96)]
    p = build_flac([left, right], layout=layout,
                   forms=["verbatim", "verbatim"])
    _r, _b, chans = decode_flac(p)
    assert chans == [left, right]


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip(order):
    if order == 0:
        wave = [9] * 80
    else:
        wave = [((i ** min(order, 3)) * 3) % 2000 - 1000 for i in range(80)]
    p = build_flac([wave], forms=[f"fixed{order}"])
    assert decode_flac(p)[2] == [wave]


def test_lpc_roundtrip():
    wave = [0, 64]
    for _ in range(98):
        wave.append((3 * wave[-1] - 2 * wave[-2]) % 500 - 250)
    # order-2 LPC, coefficients 1.5 and -0.5 at shift 4 (24, -8)
    p = build_flac([wave], forms=["lpc"], lpc=([24, -8], 4, 8))
    assert decode_flac(p)[2] == [wave]


def test_partitioned_rice_and_escape():
    # rough content -> huge fixed-2 residuals -> escape partitions
    wave = [((i * 977) % 30011) - 15005 for i in range(128)]
    p = build_flac([wave], forms=["fixed2"], po=2)
    assert decode_flac(p)[2] == [wave]


def test_wasted_bits_roundtrip():
    wave = [(((i * 13) % 200) - 100) * 8 for i in range(64)]
    p = build_flac([wave], forms=["verbatim"], wasted=3)
    p2 = build_flac([wave], forms=["verbatim"])
    assert len(p) < len(p2)  # the shift actually saved bits
    assert decode_flac(p)[2] == [wave]


def test_crc16_flip_raises_typed():
    p = build_flac([[i % 100 for i in range(64)]], forms=["fixed1"])
    with pytest.raises(FlacCrcError, match="CRC-16"):
        decode_flac(p[:-1] + bytes([p[-1] ^ 0x55]))


def test_crc8_flip_raises_typed():
    p = build_flac([[7] * 32], forms=["constant"])
    i = p.index(b"\xff\xf8")
    # header CRC-8 is at a deterministic offset: 4-byte header + 1-byte
    # frame number + 2-byte blocksize
    bad = bytearray(p)
    bad[i + 7] ^= 0xFF
    with pytest.raises(FlacCrcError, match="CRC-8"):
        decode_flac(bytes(bad))


def test_md5_mismatch_raises_typed():
    p = bytearray(build_flac([[3] * 16], forms=["constant"]))
    p[4 + 4 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(FlacCrcError, match="MD5"):
        decode_flac(bytes(p))


def test_truncation_raises_value_error():
    p = build_flac([[i for i in range(64)]], forms=["verbatim"])
    for cut in (len(p) // 4, len(p) // 2, len(p) - 1):
        with pytest.raises(ValueError):
            decode_flac(p[:cut])


def test_all_fixture_groups_decode_exactly():
    from pyspark_postgres_loader_spark.operators.flac import (
        _FLAC_GROUPS,
        _LAYOUTS,
        _flac_payload,
        _flac_wave,
    )

    for g in range(_FLAC_GROUPS):
        doc = next(d for d in range(g, 600, _FLAC_GROUPS)
                   if d % 11 != 6 and d % 17 != 5)
        rate, _bps, chans = decode_flac(_flac_payload(doc))
        n = 64 + 16 * (g % 4)
        assert rate == 8000 + 100 * g
        assert chans[0] == _flac_wave(g, 0, n)
        if _LAYOUTS[g % 3] != "mono":
            assert chans[1] == _flac_wave(g, 1, n)


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "multimodal_flac_decode")


def test_spectral_square_wave_concentrates_at_its_bin():
    """DSP sanity on the fixed-point DFT: a square wave of k cycles
    per frame puts far more energy at bin k than at the other bins —
    catches swapped tables or an n/k indexing mix-up."""
    import numpy as np

    from pyspark_postgres_loader_spark.operators.flac import (
        _SPEC_BINS,
        _SPEC_N,
        _spec_tables,
    )

    tables = _spec_tables()
    for k in _SPEC_BINS:
        period = _SPEC_N // k
        x = np.array(
            [4000 if (n % period) < period // 2 else -4000
             for n in range(_SPEC_N)],
            dtype=np.int64,
        )
        energies = {}
        for kk, (ct, st) in tables.items():
            c = int(x @ np.array(ct, dtype=np.int64))
            s = int(x @ np.array(st, dtype=np.int64))
            energies[kk] = c * c + s * s
        assert energies[k] == max(energies.values())
        others = [v for kk, v in energies.items() if kk != k]
        assert energies[k] > 10 * max(others), (k, energies)


def test_spectral_fixture_corrupt_rows_zero():
    from pyspark_postgres_loader_spark.operators.flac import (
        _SPEC_BINS,
        _spec_batches,
    )
    import pandas as pd

    # doc 9 -> corrupt (9 % 11 == 9), doc 1 -> decoded
    out = pd.concat(list(_spec_batches(iter([pd.DataFrame({"doc_id": [9, 1]})]))))
    bad = out[out.doc_id == 9]
    assert set(bad.status) == {"corrupt"}
    assert (bad[["c_sum", "s_sum", "energy"]] == 0).all().all()
    good = out[out.doc_id == 1]
    assert set(good.status) == {"decoded"}
    assert len(good) == len(_SPEC_BINS)
    assert (good.energy >= 0).all()


def test_spectral_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "audio_spectral_bins")
