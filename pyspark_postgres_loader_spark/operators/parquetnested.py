"""Parquet NESTED decode — repetition levels + the standard 3-level
LIST structure, the shape every real training corpus stores its
embeddings in (``list<float>``), decoded with no parquet library.

This closes the round-13 "flat-schema only" frontier
(parquetwalk.py:392 raises on any nested schema): the walk here
builds the schema TREE from the footer's flattened element list,
computes per-leaf max definition/repetition levels exactly as Dremel
does (one def level per optional/repeated ancestor, one rep level
per repeated ancestor), reads the v1 data-page level runs through
the existing RLE/bit-packed-hybrid decoder, and re-assembles records
from (rep, def) pairs:

- ``rep = 0`` starts a new record (record boundaries are therefore
  verified, not assumed — a list spanning pages re-enters mid-record
  with ``rep = 1`` and the accumulator carries it);
- for the 3-level LIST leaf (``max_def = 3`` with an optional
  element): ``def 0`` → NULL list, ``def 1`` → empty list, ``def 2``
  → present list with a NULL element, ``def 3`` → a value.

Accepted shapes: flat INT32/INT64 columns (REQUIRED/OPTIONAL) and
the spec's 3-level LIST of INT32/INT64/FLOAT/DOUBLE (``optional
group (LIST) → repeated group → element``), PLAIN or
dictionary-encoded (PLAIN dictionary page + RLE_DICTIONARY index
runs — pyarrow's DEFAULT write path, which is how the REAL
driver-written embeddings.parquet arrives; see
``ingest_embeddings_real_walk``), under BOTH data page versions:
v1 (levels 4-byte-framed inside the compressed body) and v2 (levels
unframed and uncompressed before the value block, byte lengths from
the header — the lattice's odd groups write v2). Anything else — struct/map groups,
deeper repetition — is a typed ``NotImplementedError``
('unsupported'), the same honest boundary every other walk keeps.

Typed verdicts exercised by the query lattice: a cut inside the
footer ('corrupt'), a spliced repetition-level run length that the
hybrid decoder must refuse ('bad_levels' — checksums are off for
that variant so the LEVEL machinery itself, not the CRC, catches
it), a struct-column file ('unsupported').

Float exactness: fixture values are ``s / 64`` with integer
``s ∈ [-2048, 2048)`` — exactly representable in float32 — and the
facts re-scale to integers (``round(v * 64)``), so value sums and
order-weighted sums are integer-exact on both engines; the DuckDB
oracle replays writer AND walk closed-form (writer, walker, oracle
pairwise independent).

Scale notes (100 TB): Arrow-batched ``mapInPandas`` over the
documents table, one payload decode per distinct (group, variant)
memoized per worker; only integer facts re-enter the JVM. The
footer-first tree walk is exactly how real readers locate nested
column chunks; level decode is O(values) with no Python-per-row
Spark boundary.

Reference: none in /root/reference (SURVEY.md §2l extension);
public parquet-format spec (Dremel encoding, LogicalTypes.md LIST).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .parquetwalk import (
    _PAGE_DATA,
    _TReader,
    _decompress,
    _parse_level_runs,
    _read_rle_levels,
)

_CONV_LIST = 3
# INT32 / INT64 / FLOAT / DOUBLE (fixed-width); BYTE_ARRAY is
# length-prefixed and handled by _plain_decode
_PTYPE_FMT = {1: ("i", 4), 2: ("q", 8), 4: ("f", 4), 5: ("d", 8)}
_BYTE_ARRAY = 6


def _plain_decode(ptype: int, raw: bytes, off: int, count: int) -> list:
    """PLAIN-encoded values: fixed-width unpack, or the BYTE_ARRAY
    4-byte-length-prefixed form; the span must be consumed exactly."""
    if ptype != _BYTE_ARRAY:
        fmt, width = _PTYPE_FMT[ptype]
        if len(raw) - off != width * count:
            raise ValueError("page body size disagrees with count")
        return list(struct.unpack_from(f"<{count}{fmt}", raw, off))
    out: list = []
    p = off
    for _ in range(count):
        if p + 4 > len(raw):
            raise ValueError("truncated byte-array length")
        n = struct.unpack_from("<I", raw, p)[0]
        p += 4
        if n > len(raw) - p:
            raise ValueError("truncated byte-array value")
        out.append(raw[p : p + n])
        p += n
    if p != len(raw):
        raise ValueError("byte-array page has trailing bytes")
    return out


def _schema_leaves(schema: list[dict]) -> list[dict]:
    """Flattened SchemaElement list → leaf descriptors with Dremel
    max_def/max_rep, validating the accepted shapes (flat column or
    3-level LIST) and typing everything else 'unsupported'."""
    if not schema or (schema[0].get(5) or 0) < 1:
        raise ValueError("parquet schema has no columns")
    leaves: list[dict] = []
    pos = 1

    def _consume(max_def: int, max_rep: int, path: tuple,
                 depth: int) -> None:
        nonlocal pos
        if pos >= len(schema):
            raise ValueError("flattened schema shorter than num_children")
        el = schema[pos]
        pos += 1
        rep_t = el.get(3)
        if rep_t not in (0, 1, 2):
            raise ValueError("schema element repetition out of range")
        max_def += 1 if rep_t in (1, 2) else 0
        max_rep += 1 if rep_t == 2 else 0
        name = (el.get(4) or b"").decode()
        n_children = el.get(5) or 0
        if n_children == 0:
            ptype = el.get(1)
            if ptype not in _PTYPE_FMT and ptype != _BYTE_ARRAY:
                raise NotImplementedError(
                    f"parquet physical type {ptype} in nested walk")
            if max_rep > 1:
                raise NotImplementedError(
                    "repetition depth > 1 (nested lists)")
            leaves.append({
                "path": path + (name,), "max_def": max_def,
                "max_rep": max_rep, "ptype": ptype,
            })
            return
        if depth == 0:
            # a group column: only the spec's 3-level LIST shape —
            # optional group annotated LIST, one repeated child group,
            # one leaf grandchild
            if el.get(6) != _CONV_LIST or n_children != 1:
                raise NotImplementedError(
                    "non-LIST nested group in nested walk")
            mid = schema[pos]
            if (mid.get(3) != 2 or (mid.get(5) or 0) != 1):
                raise NotImplementedError(
                    "LIST group without the 3-level repeated child")
        elif depth == 1:
            # the repeated middle group itself (already validated by
            # the parent); its single child must be the leaf element
            if rep_t != 2 or n_children != 1:
                raise NotImplementedError(
                    "unexpected group inside a LIST column")
        else:
            raise NotImplementedError(
                "nested group below the repeated level")
        for _ in range(n_children):
            _consume(max_def, max_rep, path + (name,), depth + 1)

    for _ in range(schema[0].get(5)):
        _consume(0, 0, (), 0)
    if pos != len(schema):
        raise ValueError("flattened schema longer than num_children")
    return leaves


def walk_parquet_nested(data: bytes) -> dict:
    """Walk one parquet file with flat INT64 and/or 3-level LIST
    columns → ``{"columns": {dotted_path: [row values]}, "num_rows",
    "n_row_groups", "n_pages"}``; list columns decode to Python
    lists (``None`` for a NULL list / NULL element). Raises
    NotImplementedError for shapes/codecs outside the profile,
    ValueError with 'CRC' for checksum mismatches, ValueError with
    'level' for malformed level runs, plain ValueError for
    structural damage."""
    try:
        return _walk_parquet_nested(data)
    except (IndexError, struct.error, TypeError, AttributeError) as exc:
        raise ValueError(f"malformed parquet structure ({exc})") from exc


def _walk_parquet_nested(data: bytes) -> dict:
    if len(data) < 12 or data[:4] != b"PAR1":
        raise ValueError("missing parquet header magic")
    if data[-4:] != b"PAR1":
        raise ValueError("missing parquet footer magic")
    flen = struct.unpack_from("<I", data, len(data) - 8)[0]
    fstart = len(data) - 8 - flen
    if fstart < 4:
        raise ValueError("parquet footer length out of range")
    meta = _TReader(data, fstart).read_struct()  # FileMetaData
    num_rows = meta.get(3)
    leaves = _schema_leaves(meta.get(2) or [])
    row_groups = meta.get(4) or []
    cols: dict[str, list] = {".".join(lf["path"]): [] for lf in leaves}
    n_pages = 0
    for rg in row_groups:
        chunks = rg.get(1) or []
        if len(chunks) != len(leaves):
            raise ValueError("row group chunk count disagrees with schema")
        for leaf, chunk in zip(leaves, chunks):
            cmeta = chunk.get(3)
            if cmeta is None:
                raise ValueError("column chunk without metadata")
            path = tuple(p.decode() for p in (cmeta.get(3) or []))
            if path != leaf["path"]:
                raise ValueError("chunk path disagrees with schema order")
            codec = cmeta.get(4)
            num_values = cmeta.get(5)
            pos = cmeta.get(9)
            out = cols[".".join(leaf["path"])]
            ptype = leaf["ptype"]
            md, mr = leaf["max_def"], leaf["max_rep"]
            # dictionary chunk: the PLAIN dictionary page sits at the
            # chunk's lowest offset; data pages then carry
            # RLE_DICTIONARY index runs (the pyarrow DEFAULT — the
            # real embeddings fixture is written this way)
            dictionary = None
            if cmeta.get(11) is not None:
                rd = _TReader(data, cmeta.get(11))
                ph = rd.read_struct()  # PageHeader
                if ph.get(1) != 2:  # DICTIONARY page
                    raise ValueError("dictionary offset without dict page")
                usize, csize, crc = ph.get(2), ph.get(3), ph.get(4)
                body = data[rd.pos : rd.pos + csize]
                if len(body) != csize:
                    raise ValueError("truncated dictionary page body")
                if crc is not None and (
                        zlib.crc32(body) & 0xFFFFFFFF != crc & 0xFFFFFFFF):
                    raise ValueError("parquet page CRC mismatch (CRC)")
                dph = ph.get(7)  # DictionaryPageHeader
                if dph is None:
                    raise ValueError("dictionary page without its header")
                dnum = dph.get(1)
                if dnum is None or dnum < 0 or dnum > 1 << 24:
                    raise ValueError("implausible dictionary value count")
                if dph.get(2) not in (0, 2):  # PLAIN / PLAIN_DICTIONARY
                    raise NotImplementedError(
                        f"dictionary page encoding {dph.get(2)}")
                draw = _decompress(codec, body, usize)
                dictionary = _plain_decode(ptype, draw, 0, dnum)
            cur: list | None = None  # record accumulator across pages
            seen = 0
            while seen < num_values:
                rd = _TReader(data, pos)
                ph = rd.read_struct()  # PageHeader
                pos = rd.pos
                usize, csize, crc = ph.get(2), ph.get(3), ph.get(4)
                body = data[pos : pos + csize]
                if len(body) != csize:
                    raise ValueError("truncated page body")
                pos += csize
                if crc is not None and (
                        zlib.crc32(body) & 0xFFFFFFFF != crc & 0xFFFFFFFF):
                    raise ValueError("parquet page CRC mismatch (CRC)")
                page_kind = ph.get(1)
                if page_kind == _PAGE_DATA:  # v1: levels framed with
                    # 4-byte prefixes INSIDE the compressed body
                    dph = ph.get(5)
                    if dph is None:
                        raise ValueError("data page without its header")
                    pvals = dph.get(1)
                    if pvals is None or pvals < 0 or pvals > 1 << 24:
                        raise ValueError("implausible page value count")
                    enc = dph.get(2)
                    raw = _decompress(codec, body, usize)
                    off = 0
                    if mr:
                        reps, used = _read_rle_levels(
                            raw, pvals, mr.bit_length())
                        off += used
                    else:
                        reps = None
                    if md:
                        defs, used = _read_rle_levels(
                            raw[off:], pvals, md.bit_length())
                        off += used
                    else:
                        defs = [0] * pvals
                elif page_kind == 3:  # v2: levels UNCOMPRESSED and
                    # unframed before the (optionally compressed)
                    # values; byte lengths come from the header
                    dph = ph.get(8)
                    if dph is None:
                        raise ValueError("v2 data page without its header")
                    pvals = dph.get(1)
                    if pvals is None or pvals < 0 or pvals > 1 << 24:
                        raise ValueError("implausible page value count")
                    enc = dph.get(4)
                    dlen = dph.get(5) or 0
                    rlen = dph.get(6) or 0
                    if rlen < 0 or dlen < 0 or rlen + dlen > len(body):
                        raise ValueError(
                            "v2 level lengths exceed the page body")
                    levels = body[: rlen + dlen]
                    want = usize - rlen - dlen
                    if want < 0:
                        raise ValueError(
                            "v2 level lengths exceed uncompressed size")
                    if dph.get(7) is False:  # is_compressed (default T)
                        raw = bytes(body[rlen + dlen :])
                        if len(raw) != want:
                            raise ValueError(
                                "v2 uncompressed values size mismatch")
                    else:
                        raw = _decompress(
                            codec, body[rlen + dlen :], want)
                    off = 0
                    if mr:
                        reps = _parse_level_runs(
                            levels[:rlen], pvals, mr.bit_length())
                    else:
                        reps = None
                    if md:
                        defs = _parse_level_runs(
                            levels[rlen:], pvals, md.bit_length())
                    else:
                        defs = [0] * pvals
                else:
                    raise NotImplementedError(
                        f"parquet page type {page_kind}")
                if enc not in (0, 2, 8):  # PLAIN / both dictionary encs
                    raise NotImplementedError(f"parquet encoding {enc}")
                present = sum(1 for d in defs if d == md)
                if enc == 0:  # PLAIN values
                    vals = iter(_plain_decode(ptype, raw, off, present))
                else:  # RLE_DICTIONARY: bit-width byte + index run
                    if dictionary is None:
                        raise ValueError(
                            "dictionary-encoded page without dict page")
                    if off >= len(raw):
                        raise ValueError("truncated dictionary index run")
                    bw = raw[off]
                    if bw > 32:
                        raise ValueError("dictionary index width too wide")
                    idxs = (_parse_level_runs(raw[off + 1 :], present, bw)
                            if bw else [0] * present)
                    if any(i >= len(dictionary) for i in idxs):
                        raise ValueError("dictionary index out of range")
                    vals = iter(dictionary[i] for i in idxs)
                if reps is None:  # flat column
                    out.extend(
                        next(vals) if d == md else None for d in defs)
                else:
                    for r, d in zip(reps, defs):
                        if r > mr or d > md:
                            raise ValueError(
                                "level value exceeds schema maximum")
                        if r == 0:
                            cur = None
                            if d == 0:
                                out.append(None)
                                continue
                            cur = []
                            out.append(cur)
                            if d == 1:
                                continue
                        elif cur is None:
                            raise ValueError(
                                "continuation level without an open record")
                        cur.append(next(vals) if d == md else None)
                seen += pvals
                n_pages += 1
            if seen != num_values:
                raise ValueError("page value counts disagree with chunk")
    for name in cols:
        if num_rows is not None and len(cols[name]) != num_rows:
            raise ValueError("decoded rows disagree with num_rows")
    return {
        "columns": cols,
        "num_rows": num_rows,
        "n_row_groups": len(row_groups),
        "n_pages": n_pages,
    }


# ------------------------------------------------ fixture lattice

_PN_GROUPS = 8
_PN_ROWGROUP = 256


def _pn_rows(g: int) -> int:
    return 400 + 48 * g


def _pn_lists(g: int) -> list[list | None]:
    """Closed-form embeddings-shaped column for group ``g``: NULL
    lists, empty lists, NULL elements, and float32-exact values
    ``s / 64`` with integer ``s``."""
    out: list[list | None] = []
    for i in range(_pn_rows(g)):
        if (i * 7 + g) % 13 == 4:
            out.append(None)
        elif (i * 11 + g) % 17 == 5:
            out.append([])
        else:
            row = []
            for j in range(1 + (i + g) % 7):
                if (i + 5 * j + g) % 19 == 6:
                    row.append(None)
                else:
                    s = ((31 * i + 17 * j + 997 * g) % 4096) - 2048
                    row.append(s / 64.0)
            out.append(row)
    return out


def _pn_codec(g: int) -> str:
    return ("snappy", "none", "gzip")[g % 3]


def _pn_bytes(g: int, *, codec: str | None = None,
              checksum: bool = True,
              page_version: str | None = None) -> bytes:
    """Odd groups write DATA PAGE V2 (levels unframed + uncompressed
    outside the value block), even groups v1 — both page versions are
    live in the registered query's lattice."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = _pn_rows(g)
    t = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "emb": pa.array(_pn_lists(g), type=pa.list_(pa.float32())),
    })
    buf = pa.BufferOutputStream()
    pq.write_table(
        t, buf,
        use_dictionary=False,
        compression=codec or _pn_codec(g),
        data_page_version=page_version or ("2.0" if g % 2 else "1.0"),
        write_statistics=False,
        write_page_checksum=checksum,
        row_group_size=_PN_ROWGROUP,
    )
    return buf.getvalue().to_pybytes()


def _pn_struct_bytes(g: int) -> bytes:
    """A struct column — outside the LIST profile, so the walk must
    type it 'unsupported' from the schema tree alone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = _pn_rows(g)
    t = pa.table({
        "s": pa.array([{"a": i, "b": float(i)} for i in range(n)],
                      type=pa.struct([("a", pa.int64()),
                                      ("b", pa.float32())])),
    })
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, use_dictionary=False, compression="none",
                   data_page_version="1.0", write_statistics=False,
                   row_group_size=_PN_ROWGROUP)
    return buf.getvalue().to_pybytes()


def _emb_page_body_start(data: bytes) -> int:
    """Body start of the FIRST page of the SECOND (emb) chunk, by
    the same thrift walk the reader performs — where the
    repetition-level run begins (codec none, no checksum)."""
    flen = struct.unpack_from("<I", data, len(data) - 8)[0]
    meta = _TReader(data, len(data) - 8 - flen).read_struct()
    cmeta = meta.get(4)[0].get(1)[1].get(3)
    rd = _TReader(data, cmeta.get(9))
    rd.read_struct()
    return rd.pos


def _pn_payload(doc_id: int) -> bytes:
    g = doc_id % _PN_GROUPS
    corrupt = doc_id % 11 == 3
    badlev = doc_id % 17 == 2 and not corrupt
    unsup = doc_id % 13 == 5 and not (corrupt or badlev)
    if unsup:
        return _pn_struct_bytes(g)
    if badlev:
        # checksums OFF and codec none so the LEVEL machinery itself
        # (not the CRC) must refuse the splice: the rep-level run's
        # 4-byte length prefix claims bytes past the page body (v1
        # framing explicitly — the splice targets the v1 prefix)
        blob = bytearray(_pn_bytes(g, codec="none", checksum=False,
                                   page_version="1.0"))
        s = _emb_page_body_start(bytes(blob))
        struct.pack_into("<I", blob, s, 0xFFFFFFF0)
        return bytes(blob)
    blob = bytearray(_pn_bytes(g))
    if corrupt:
        del blob[-6:]  # cut inside footer length + magic
    return bytes(blob)


# ------------------------------------------------ spark + oracle

_PN_ZERO = (0,) * 9

# worker-process-scope decode memo (avrowalk r12/r13 lesson: a
# function-local cache rebuilds per partition iterator AND per pass;
# the payload decode is deterministic per (group, variant) so the
# memo is safe for the worker's lifetime)
_PN_FACT_MEMO: dict[tuple, tuple] = {}


def _pn_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache = _PN_FACT_MEMO

    def facts(doc_id: int) -> tuple:
        g = doc_id % _PN_GROUPS
        key = (g, doc_id % 11 == 3, doc_id % 17 == 2, doc_id % 13 == 5)
        if key not in cache:
            try:
                f = walk_parquet_nested(_pn_payload(doc_id))
                emb = f["columns"]["emb.list.element"]
                n_null = sum(1 for r in emb if r is None)
                n_empty = sum(1 for r in emb if r == [])
                n_nullel = n_vals = ssum = wsum = 0
                for i, row in enumerate(emb):
                    if not row:
                        continue
                    for j, v in enumerate(row):
                        if v is None:
                            n_nullel += 1
                        else:
                            s = int(round(v * 64))
                            n_vals += 1
                            ssum += s
                            wsum += (i + 1) * (j + 1) * s
                cache[key] = (
                    "decoded", f["num_rows"], f["n_row_groups"],
                    f["n_pages"], n_null, n_empty, n_nullel,
                    n_vals, ssum, wsum,
                )
            except NotImplementedError:
                cache[key] = ("unsupported",) + _PN_ZERO
            except ValueError as exc:
                msg = str(exc)
                status = ("crc_error" if "CRC" in msg
                          else "bad_levels" if "level" in msg
                          else "corrupt")
                cache[key] = (status,) + _PN_ZERO
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt",) + _PN_ZERO
        return cache[key]

    cols = ["doc_id", "status", "n_rows", "n_row_groups", "n_pages",
            "n_null_lists", "n_empty_lists", "n_null_elems",
            "n_values", "sum_scaled", "wsum_scaled"]
    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(d),) + facts(int(d)) for d in pdf["doc_id"]]
        yield pd.DataFrame(out, columns=cols).astype(
            {"doc_id": "int64", "n_rows": "int64",
             "n_row_groups": "int32", "n_pages": "int32",
             "n_null_lists": "int64", "n_empty_lists": "int64",
             "n_null_elems": "int64", "n_values": "int64",
             "sum_scaled": "int64", "wsum_scaled": "int64"})


def _pn_oracle() -> str:
    bad = "d.doc_id % 11 = 3 OR d.doc_id % 17 = 2 OR d.doc_id % 13 = 5"
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_PN_GROUPS} AS g FROM documents
    ),
    rows_ AS (
      SELECT g, 400 + 48 * g AS n FROM grp
    ),
    rr AS (
      SELECT r.g, r.n, i,
             ((i * 7 + r.g) % 13 = 4) AS null_list,
             ((i * 7 + r.g) % 13 <> 4
              AND (i * 11 + r.g) % 17 = 5) AS empty_list,
             1 + (i + r.g) % 7 AS len
      FROM rows_ r, LATERAL (SELECT unnest(range(0, r.n)) AS i)
    ),
    el AS (
      SELECT rr.g, rr.i, j,
             ((rr.i + 5 * j + rr.g) % 19 = 6) AS null_elem,
             ((31 * rr.i + 17 * j + 997 * rr.g) % 4096) - 2048 AS s
      FROM rr, LATERAL (SELECT unnest(range(0, rr.len)) AS j)
      WHERE NOT rr.null_list AND NOT rr.empty_list
    ),
    esums AS (
      SELECT g,
             CAST(SUM(CASE WHEN null_elem THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_elems,
             CAST(SUM(CASE WHEN null_elem THEN 0 ELSE 1 END) AS BIGINT)
               AS n_values,
             CAST(SUM(CASE WHEN null_elem THEN 0 ELSE s END) AS BIGINT)
               AS sum_scaled,
             CAST(SUM(CASE WHEN null_elem THEN 0
                      ELSE (i + 1) * (j + 1) * s END) AS BIGINT)
               AS wsum_scaled
      FROM el GROUP BY g
    ),
    rsums AS (
      SELECT g,
             CAST(MAX(n) AS BIGINT) AS n_rows,
             CAST(CEIL(CAST(MAX(n) AS DOUBLE) / {_PN_ROWGROUP}) AS INT)
               AS n_row_groups,
             CAST(SUM(CASE WHEN null_list THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_lists,
             CAST(SUM(CASE WHEN empty_list THEN 1 ELSE 0 END) AS BIGINT)
               AS n_empty_lists
      FROM rr GROUP BY g
    ),
    sums AS (
      SELECT r.g, r.n_rows, r.n_row_groups,
             CAST(2 * r.n_row_groups AS INT) AS n_pages,
             r.n_null_lists, r.n_empty_lists,
             e.n_null_elems, e.n_values, e.sum_scaled, e.wsum_scaled
      FROM rsums r JOIN esums e ON r.g = e.g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 3 THEN 'corrupt'
                WHEN d.doc_id % 17 = 2 THEN 'bad_levels'
                WHEN d.doc_id % 13 = 5 THEN 'unsupported'
                ELSE 'decoded' END AS status,
           CASE WHEN {bad} THEN 0 ELSE s.n_rows END AS n_rows,
           CASE WHEN {bad} THEN 0 ELSE s.n_row_groups END
             AS n_row_groups,
           CASE WHEN {bad} THEN 0 ELSE s.n_pages END AS n_pages,
           CASE WHEN {bad} THEN 0 ELSE s.n_null_lists END
             AS n_null_lists,
           CASE WHEN {bad} THEN 0 ELSE s.n_empty_lists END
             AS n_empty_lists,
           CASE WHEN {bad} THEN 0 ELSE s.n_null_elems END
             AS n_null_elems,
           CASE WHEN {bad} THEN 0 ELSE s.n_values END AS n_values,
           CASE WHEN {bad} THEN 0 ELSE s.sum_scaled END AS sum_scaled,
           CASE WHEN {bad} THEN 0 ELSE s.wsum_scaled END
             AS wsum_scaled
    FROM documents d
    JOIN sums s ON d.doc_id % {_PN_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("ingest_parquet_nested_walk", oracle=_pn_oracle())
def ingest_parquet_nested_walk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nested-parquet read with no parquet library: the 3-level LIST
    structure (``list<float>`` — the embeddings shape) decoded from
    repetition + definition levels, NULL/empty-list and NULL-element
    edges all distinguished and counted, value sums and
    row-and-position-weighted sums integer-exact (float32-exact
    fixture values re-scaled). Typed verdicts: footer cut
    ('corrupt'), spliced repetition-level run length ('bad_levels' —
    checksums off for that variant so the level decoder itself must
    refuse it), struct column ('unsupported'). See module docstring
    for the Dremel assembly rules and scale notes."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    # spread the distinct (group, variant) decodes across the worker
    # pool (the sf0.1 documents scan is ONE input split — avrowalk
    # r13 lesson), and sort without a global orderBy (range
    # partitioning samples its child, re-executing the decode)
    combo = F.concat_ws(
        ":",
        (F.col("doc_id") % _PN_GROUPS),
        (F.col("doc_id") % 11 == 3).cast("int"),
        (F.col("doc_id") % 17 == 2).cast("int"),
        (F.col("doc_id") % 13 == 5).cast("int"),
    )
    out = d.repartition(32, combo).mapInPandas(
        _pn_batches,
        schema=(
            "doc_id long, status string, n_rows long, "
            "n_row_groups int, n_pages int, n_null_lists long, "
            "n_empty_lists long, n_null_elems long, n_values long, "
            "sum_scaled long, wsum_scaled long"
        ),
    )
    return out.repartition(1).sortWithinPartitions("doc_id")


# --------------------------------- the REAL embeddings file (r14)


def _emb_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import math

    cols = ["vec_id", "dim", "label", "csum"]
    for pdf in it:
        if pdf.empty:
            continue
        for content in pdf["content"]:
            f = walk_parquet_nested(bytes(content))
            vid = f["columns"]["vec_id"]
            lab = f["columns"]["label"]
            emb = f["columns"]["embedding.list.element"]
            rows = []
            for v, lb, e in zip(vid, lab, emb):
                if e is None:
                    rows.append((int(v), -1, int(lb), 0))
                    continue
                csum = sum(
                    math.floor(float(x) * 1048576.0)
                    for x in e if x is not None
                )
                rows.append((int(v), len(e), int(lb), csum))
            yield pd.DataFrame(rows, columns=cols).astype(
                {"vec_id": "int64", "dim": "int32", "label": "int32",
                 "csum": "int64"})


_EMB_ORACLE = """
SELECT vec_id,
       CAST(COALESCE(len(embedding), -1) AS INT) AS dim,
       CAST(label AS INT) AS label,
       CAST(COALESCE(list_sum(list_transform(embedding,
            x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))),
            0) AS BIGINT) AS csum
FROM embeddings
ORDER BY vec_id
"""


@register("ingest_embeddings_real_walk", oracle=_EMB_ORACLE)
def ingest_embeddings_real_walk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The REAL driver-written ``embeddings.parquet`` decoded with no
    parquet library — the closure the synthetic lattices can't give:
    a third party (the round driver) wrote this file with its own
    writer settings, and the native walk must take it as found. The
    file exercises the full default profile at once: the 3-level
    LIST of FLOAT (Dremel rep/def levels), PLAIN dictionary pages +
    RLE_DICTIONARY index runs on ALL chunks (pyarrow's default write
    path), INT32 and INT64 flat columns, snappy through the repo's
    own decompressor. The oracle is DuckDB's OWN independent parquet
    reader over the same file (the pre-registered ``embeddings``
    view) — per-vector dims, labels, and an exact quantized
    element checksum (``floor(x * 2^20)``: float32→double is exact,
    the power-of-two scale is exact, floor is engine-identical), so
    a single wrong byte anywhere in the decode chain flips the hash.

    Scale notes (100 TB): this is the production read shape —
    binaryFile parallelizes listing, each file decodes map-side, and
    per-vector facts (not 25 MB of floats) cross back to the JVM.
    The same walk underlies vectorized readers: levels drive
    null/offset buffers, dictionary indices resolve against a
    per-chunk dictionary."""
    import os as _os

    d = (spark.read.format("binaryFile")
         .load(_os.path.join(sf_dir, "embeddings.parquet"))
         .select("content"))
    out = d.mapInPandas(
        _emb_batches,
        schema="vec_id long, dim int, label int, csum long",
    )
    return out.repartition(1).sortWithinPartitions("vec_id")


def _doc_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["doc_id", "lang", "source", "n_chars", "text_chars",
            "first_c", "last_c", "n_e"]
    for pdf in it:
        if pdf.empty:
            continue
        for content in pdf["content"]:
            f = walk_parquet_nested(bytes(content))
            c = f["columns"]
            rows = []
            for did, lang, src, nch, txt in zip(
                    c["doc_id"], c["lang"], c["source"],
                    c["n_chars"], c["text"]):
                t = txt.decode("utf-8")
                rows.append((
                    int(did), lang.decode("utf-8"),
                    src.decode("utf-8"), int(nch), len(t),
                    ord(t[0]) if t else 0,
                    ord(t[-1]) if t else 0,
                    t.count("e"),
                ))
            yield pd.DataFrame(rows, columns=cols).astype(
                {"doc_id": "int64", "n_chars": "int64",
                 "text_chars": "int64", "first_c": "int32",
                 "last_c": "int32", "n_e": "int64"})


_DOC_ORACLE = """
SELECT doc_id, lang, source,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(LENGTH(text) AS BIGINT) AS text_chars,
       CAST(COALESCE(ascii(substr(text, 1, 1)), 0) AS INT) AS first_c,
       CAST(COALESCE(ascii(substr(text, LENGTH(text), 1)), 0) AS INT)
         AS last_c,
       CAST(LENGTH(text) - LENGTH(replace(text, 'e', '')) AS BIGINT)
         AS n_e
FROM documents
ORDER BY doc_id
"""


@register("ingest_documents_real_walk", oracle=_DOC_ORACLE)
def ingest_documents_real_walk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The REAL driver-written ``documents.parquet`` decoded with no
    parquet library — the BYTE_ARRAY closure next to the embeddings
    one: length-prefixed PLAIN strings, string DICTIONARY pages, and
    (at sf0.1, where the text dictionary overflows pyarrow's 1 MiB
    page limit) the genuine MID-CHUNK dictionary→PLAIN fallback a
    third-party writer emits on real high-cardinality text — the
    walk dispatches per PAGE encoding, so the fallback is load-
    bearing, not fixture-forced. Oracle: DuckDB's own parquet reader
    over the same file — per-document lang/source strings, the
    file's n_chars column, decoded character counts, first/last
    code points, and an 'e'-occurrence count, all engine-identical.

    Scale notes (100 TB): same geometry as the embeddings closure —
    binaryFile-parallel listing, map-side decode, per-document facts
    crossing back instead of document bodies."""
    import os as _os

    d = (spark.read.format("binaryFile")
         .load(_os.path.join(sf_dir, "documents.parquet"))
         .select("content"))
    out = d.mapInPandas(
        _doc_batches,
        schema=("doc_id long, lang string, source string, "
                "n_chars long, text_chars long, first_c int, "
                "last_c int, n_e long"),
    )
    return out.repartition(1).sortWithinPartitions("doc_id")


def _ev_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["event_id", "user_id", "ts_us", "event_type", "value",
            "props_chars"]
    for pdf in it:
        if pdf.empty:
            continue
        for content in pdf["content"]:
            f = walk_parquet_nested(bytes(content))
            c = f["columns"]
            rows = [
                (int(e), int(u), int(t), et.decode("utf-8"), float(v),
                 len(pr.decode("utf-8")))
                for e, u, t, et, v, pr in zip(
                    c["event_id"], c["user_id"], c["ts"],
                    c["event_type"], c["value"], c["props"])
            ]
            yield pd.DataFrame(rows, columns=cols).astype(
                {"event_id": "int64", "user_id": "int64",
                 "ts_us": "int64", "value": "float64",
                 "props_chars": "int64"})


_EV_ORACLE = """
SELECT event_id, user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       event_type,
       CAST(value AS DOUBLE) AS value,
       CAST(LENGTH(props) AS BIGINT) AS props_chars
FROM events
ORDER BY event_id
"""


@register("ingest_events_real_walk", oracle=_EV_ORACLE)
def ingest_events_real_walk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The REAL driver-written ``events.parquet`` decoded with no
    parquet library — the third real-file closure, and the pointed
    one: its ``ts`` column is an annotated TIMESTAMP (logicalType
    field on the INT64 schema element — MICROS in the current
    driver-written files), the column family whose unit quirks force
    legacy flags on Spark's own reader. The native walk reads the
    physical INT64 directly — no flag, no reader quirk — alongside
    DOUBLE values compared bit-for-bit and
    BYTE_ARRAY event_type/props strings, all per-event against
    DuckDB's independent parquet reader over the same file (the
    pre-registered ``events`` view, ``epoch_ns(ts)`` on the oracle
    side).

    Scale notes (100 TB): events IS the 100 TB table in this schema;
    per-file map-side decode with per-event facts returning is the
    scan shape, and the nanos-as-int64 path is exactly how
    vectorized readers treat the physical column before applying
    logical-type interpretation."""
    import os as _os

    d = (spark.read.format("binaryFile")
         .load(_os.path.join(sf_dir, "events.parquet"))
         .select("content"))
    out = d.mapInPandas(
        _ev_batches,
        schema=("event_id long, user_id long, ts_us long, "
                "event_type string, value double, props_chars long"),
    )
    return out.repartition(1).sortWithinPartitions("event_id")
