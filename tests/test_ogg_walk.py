"""Ogg page walk (RFC 3533): CRC table pinned to the published
CRC-32/MPEG-2 check vector, resync, cross-page packets, flag
consistency, typed quarantine, and the oracle compare."""

from __future__ import annotations

import struct

import pytest

from pyspark_postgres_loader_spark.operators.oggwalk import (
    _F_BOS,
    _F_CONT,
    _F_EOS,
    _OGG_GROUPS,
    _ogg_payload,
    build_ogg_page,
    ogg_crc,
    walk_ogg_pages,
)


def test_crc_table_pinned_by_mpeg2_check_vector():
    """Same machine (poly 0x04C11DB7, MSB-first, no reflection, no
    final XOR) as CRC-32/MPEG-2 — only the init differs, so running
    OUR table with init 0xFFFFFFFF must reproduce the catalogue's
    check value for b'123456789'."""
    assert ogg_crc(b"123456789", 0xFFFFFFFF) == 0x0376E6E7
    # Ogg init-0 variant sanity: empty data is the identity
    assert ogg_crc(b"") == 0


def test_single_page_roundtrip_and_resync():
    page = build_ogg_page(_F_BOS | _F_EOS, 42, 7, 0, [3, 4], b"abcdefg")
    f = walk_ogg_pages(page)
    assert (f["n_pages"], f["n_packets"], f["payload_bytes"]) == (1, 2, 7)
    assert f["last_granule"] == 42 and f["junk_skipped"] == 0
    # resync over junk that contains a partial capture pattern
    f = walk_ogg_pages(b"xxOgg" + page)
    assert f["junk_skipped"] == 5 and f["n_pages"] == 1


def test_cross_page_packet_requires_continuation_flag():
    p0 = build_ogg_page(_F_BOS, 1, 9, 0, [255], bytes(255))
    p1_ok = build_ogg_page(_F_CONT | _F_EOS, 2, 9, 1, [10], bytes(10))
    f = walk_ogg_pages(p0 + p1_ok)
    assert f["n_packets"] == 1  # one packet of 265 bytes
    p1_bad = build_ogg_page(_F_EOS, 2, 9, 1, [10], bytes(10))
    with pytest.raises(ValueError, match="continuation"):
        walk_ogg_pages(p0 + p1_bad)
    # continuation flag with NO open packet is equally inconsistent
    q0 = build_ogg_page(_F_BOS, 1, 9, 0, [5], bytes(5))
    q1 = build_ogg_page(_F_CONT | _F_EOS, 2, 9, 1, [5], bytes(5))
    with pytest.raises(ValueError, match="continuation"):
        walk_ogg_pages(q0 + q1)


def test_typed_quarantine():
    page = bytearray(
        build_ogg_page(_F_BOS | _F_EOS, 1, 3, 0, [8], bytes(range(8)))
    )
    flipped = bytearray(page)
    flipped[22] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        walk_ogg_pages(bytes(flipped))
    vpage = bytearray(page)
    vpage[4] = 1
    vpage[22:26] = b"\x00\x00\x00\x00"
    vpage[22:26] = struct.pack("<I", ogg_crc(bytes(vpage)))
    with pytest.raises(NotImplementedError, match="version"):
        walk_ogg_pages(bytes(vpage))
    with pytest.raises(ValueError, match="truncated"):
        walk_ogg_pages(bytes(page[:-3]))
    with pytest.raises(ValueError, match="capture"):
        walk_ogg_pages(b"no sync here at all")
    # sequence discontinuity
    p0 = build_ogg_page(_F_BOS, 1, 9, 0, [5], bytes(5))
    p2 = build_ogg_page(_F_EOS, 2, 9, 2, [5], bytes(5))
    with pytest.raises(ValueError, match="sequence"):
        walk_ogg_pages(p0 + p2)
    # multiplexed serials are honestly unsupported
    m0 = build_ogg_page(_F_BOS, 1, 9, 0, [5], bytes(5))
    m1 = build_ogg_page(_F_BOS | _F_EOS, 2, 10, 1, [5], bytes(5))
    with pytest.raises(NotImplementedError, match="multiplex"):
        walk_ogg_pages(m0 + m1)
    # missing EOS
    with pytest.raises(ValueError, match="EOS"):
        walk_ogg_pages(p0)


def test_fixture_truncation_always_fails_every_group():
    for g in range(_OGG_GROUPS):
        doc_id = g
        while doc_id % 11 != 3:
            doc_id += _OGG_GROUPS
        with pytest.raises(ValueError):
            walk_ogg_pages(_ogg_payload(doc_id))


def test_fixture_unsupported_carries_valid_crc():
    """The 'unsupported' payloads re-seal the page CRC after setting
    the version byte — proving the version gate (not the CRC check)
    fires, in every group."""
    for g in range(_OGG_GROUPS):
        doc_id = g
        while not (doc_id % 13 == 5 and doc_id % 11 != 3 and doc_id % 17 != 2):
            doc_id += _OGG_GROUPS
        with pytest.raises(NotImplementedError):
            walk_ogg_pages(_ogg_payload(doc_id))


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001", "audio_ogg_page_walk")
