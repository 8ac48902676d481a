"""Native parquet file walk — the engine reading its OWN storage
format with no parquet library in the loop: PAR1 magic, the Thrift
COMPACT-protocol footer (FileMetaData → schema / row groups → column
chunks → column metadata), per-page Thrift page headers, page-level
CRC-32 verification, page decompression through the codecs this repo
already implements natively (snappy via operators/snappy.py, gzip
via operators/inflate.py's RFC 1951 decoder), and PLAIN-encoded
INT64 value decoding.

Why this matters at 100 TB: parquet IS the input format of every
query in this engine; being able to walk footer → row group → page →
values natively is the difference between trusting a reader and
UNDERSTANDING the bytes it reads (page pruning, corruption triage,
footer-only scans are all footer/page-walk operations).

The Thrift compact reader is generic (field deltas + long form,
zigzag varints, nested structs, lists, the bool-in-field-header
special case) and the parquet structs are interpreted by field id
per the public parquet.thrift definition.

Correctness evidence: pyarrow — an INDEPENDENT implementation — is
the runtime WRITER: the fixture serializes closed-form INT64 columns
to parquet bytes in the executor (dictionary off, data-page v1, page
checksums on, snappy/uncompressed/gzip codecs by group) and the walk
re-derives the values; the DuckDB oracle replays the value lattice
and never sees a parquet byte. Brotli-coded groups are the honest
'unsupported' boundary (we implement no brotli).

Reference: parquet-format THRIFT definition + Thrift compact
protocol spec (public); no repo counterpart (SURVEY.md §2l).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load_table
from ..functions.planctl import presentation_sort as _presentation_sort
from .inflate import inflate_raw
from .lz4frame import lz4_decompress_block
from .snappy import snappy_decompress_block
from .zstdfse import decompress_frame

# ------------------------------------------------ thrift compact

_T_STOP = 0
_T_TRUE = 1
_T_FALSE = 2
_T_BYTE = 3
_T_I16 = 4
_T_I32 = 5
_T_I64 = 6
_T_DOUBLE = 7
_T_BINARY = 8
_T_LIST = 9
_T_SET = 10
_T_MAP = 11
_T_STRUCT = 12


class _TReader:
    """Minimal Thrift compact-protocol reader: structs come back as
    {field_id: value} dicts, lists as Python lists."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.pos = pos

    def _varint(self) -> int:
        out = 0
        shift = 0
        while True:
            if self.pos >= len(self.d):
                raise ValueError("thrift varint truncated")
            b = self.d[self.pos]
            self.pos += 1
            out |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                return out
            if shift > 70:
                raise ValueError("thrift varint too long")

    def _zigzag(self) -> int:
        v = self._varint()
        return (v >> 1) ^ -(v & 1)

    def _value(self, ftype: int, container: bool = False):
        if ftype in (_T_TRUE, _T_FALSE):
            if not container:
                # struct field: the bool IS the field-header type code
                return ftype == _T_TRUE
            # list/set/map element: one byte, 1 = true, 0/2 = false
            b = self.d[self.pos]
            self.pos += 1
            if b not in (0, 1, 2):
                raise ValueError("thrift bool element out of range")
            return b == 1
        if ftype == _T_BYTE:
            b = self.d[self.pos]
            self.pos += 1
            return b
        if ftype in (_T_I16, _T_I32, _T_I64):
            return self._zigzag()
        if ftype == _T_DOUBLE:
            v = struct.unpack_from("<d", self.d, self.pos)[0]
            self.pos += 8
            return v
        if ftype == _T_BINARY:
            n = self._varint()
            out = self.d[self.pos : self.pos + n]
            if len(out) != n:
                raise ValueError("thrift binary truncated")
            self.pos += n
            return out
        if ftype in (_T_LIST, _T_SET):
            hdr = self.d[self.pos]
            self.pos += 1
            size = hdr >> 4
            etype = hdr & 0x0F
            if size == 15:
                size = self._varint()
            return [self._value(etype, container=True) for _ in range(size)]
        if ftype == _T_MAP:
            size = self._varint()
            if size == 0:
                return {}
            kv = self.d[self.pos]
            self.pos += 1
            kt, vt = kv >> 4, kv & 0x0F
            return {
                self._value(kt, container=True):
                    self._value(vt, container=True)
                for _ in range(size)
            }
        if ftype == _T_STRUCT:
            return self.read_struct()
        raise ValueError(f"thrift compact type {ftype} unsupported")

    def read_struct(self) -> dict:
        out: dict = {}
        last_id = 0
        while True:
            if self.pos >= len(self.d):
                raise ValueError("thrift struct truncated")
            hdr = self.d[self.pos]
            self.pos += 1
            if hdr == _T_STOP:
                return out
            delta = hdr >> 4
            ftype = hdr & 0x0F
            fid = last_id + delta if delta else self._zigzag()
            last_id = fid
            out[fid] = self._value(ftype)


# ------------------------------------------------ parquet structs

_CODEC_UNCOMPRESSED = 0
_CODEC_SNAPPY = 1
_CODEC_GZIP = 2
_CODEC_ZSTD = 6
_CODEC_LZ4_RAW = 7
_ENC_PLAIN = 0
_PAGE_DATA = 0
_PAGE_DICT = 2


def _parse_level_runs(body: bytes, count: int, bit_width: int) -> list[int]:
    """RLE/bit-packed-hybrid run body (no length prefix — v2 data
    pages frame levels externally): RLE runs ``(count<<1)|0`` with a
    fixed-width value and bit-packed runs ``(groups<<1)|1`` of
    groups·8 values → levels."""
    pos = 0
    out: list[int] = []
    width_bytes = (bit_width + 7) // 8
    while len(out) < count:
        header = 0
        shift = 0
        while True:
            if pos >= len(body):
                raise ValueError("truncated level-run header")
            b = body[pos]
            pos += 1
            header |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        if header & 1:  # bit-packed: groups of 8 values
            groups = header >> 1
            nbytes = groups * bit_width
            chunk = body[pos : pos + nbytes]
            if len(chunk) != nbytes:
                raise ValueError("truncated bit-packed levels")
            pos += nbytes
            bits = int.from_bytes(chunk, "little")
            for k in range(groups * 8):
                out.append((bits >> (k * bit_width)) & ((1 << bit_width) - 1))
        else:  # RLE run
            run = header >> 1
            val = int.from_bytes(body[pos : pos + width_bytes], "little")
            pos += width_bytes
            # clamp materialization to the values still needed: the
            # run length is a raw varint, so a corrupt header could
            # otherwise demand an arbitrarily large list BEFORE the
            # while-loop bound is consulted (RLE consumes no
            # per-value bytes — truncation checks can't save us)
            out.extend([val] * min(run, count - len(out)))
    return out[:count]


def _read_rle_levels(raw: bytes, count: int, bit_width: int) -> tuple[list[int], int]:
    """v1 data-page level run: 4-byte length prefix, then the hybrid
    run body → (levels, bytes consumed including the prefix)."""
    if len(raw) < 4:
        raise ValueError("truncated level-run length")
    total = struct.unpack_from("<I", raw, 0)[0]
    body = raw[4 : 4 + total]
    if len(body) != total:
        raise ValueError("truncated level-run body")
    return _parse_level_runs(body, count, bit_width), 4 + total


def _decompress(codec: int, data: bytes, want: int) -> bytes:
    if codec == _CODEC_UNCOMPRESSED:
        out = data
    elif codec == _CODEC_SNAPPY:
        out = snappy_decompress_block(data)
    elif codec == _CODEC_GZIP:
        # parquet GZIP codec = a full RFC 1952 member; header parse is
        # minimal here (pyarrow writes a bare header), inflate is OURS
        if data[:2] != b"\x1f\x8b" or data[2] != 8:
            raise ValueError("bad gzip page header")
        flg = data[3]
        p = 10
        if flg & 4:
            p += 2 + struct.unpack_from("<H", data, p)[0]
        if flg & 8:
            p = data.index(b"\x00", p) + 1
        if flg & 16:
            p = data.index(b"\x00", p) + 1
        if flg & 2:
            p += 2
        out, used = inflate_raw(data[p:])
        crc_stored, isize = struct.unpack_from("<II", data, p + used)
        if zlib.crc32(out) & 0xFFFFFFFF != crc_stored:
            raise ValueError("gzip page CRC mismatch (CRC)")
    elif codec == _CODEC_ZSTD:
        # parquet ZSTD codec = one full zstd frame per page (the
        # modern default of most parquet writers); decoded by OUR
        # RFC 8878 decoder (operators/zstdfse.py), incl. its XXH64
        # content-checksum verification when the writer emits one
        out, used = decompress_frame(data)
        if used != len(data):
            raise ValueError("trailing bytes after zstd page frame")
    elif codec == _CODEC_LZ4_RAW:
        # parquet LZ4_RAW codec = one raw LZ4 block, NO frame header
        # (the framed legacy LZ4/Hadoop codec id 5 stays unsupported)
        out = lz4_decompress_block(data, max_out=want)
    else:
        raise NotImplementedError(f"parquet codec {codec}")
    if len(out) != want:
        raise ValueError("page decompressed to the wrong size")
    return out


def walk_parquet(data: bytes) -> dict:
    """Walk one parquet file → metadata facts + PLAIN INT64 values of
    the single column. Raises NotImplementedError for codecs/
    encodings we do not implement ('unsupported'), ValueError with
    'CRC' for page-checksum mismatches, plain ValueError for
    structural damage."""
    try:
        return _walk_parquet(data)
    except (IndexError, struct.error, TypeError, AttributeError) as exc:
        # byte-corrupted metadata decoding to the wrong thrift shape
        # (or walking off a field): structural damage, typed like
        # every other truncation (fuzz-pinned in tests)
        raise ValueError(f"malformed parquet structure ({exc})") from exc


def _walk_parquet(data: bytes) -> dict:
    if len(data) < 12 or data[:4] != b"PAR1":
        raise ValueError("missing parquet header magic")
    if data[-4:] != b"PAR1":
        raise ValueError("missing parquet footer magic")
    flen = struct.unpack_from("<I", data, len(data) - 8)[0]
    fstart = len(data) - 8 - flen
    if fstart < 4:
        raise ValueError("parquet footer length out of range")
    meta = _TReader(data, fstart).read_struct()  # FileMetaData
    version = meta.get(1)
    schema = meta.get(2) or []
    num_rows = meta.get(3)
    row_groups = meta.get(4) or []
    # flat single-column schema: [root, column]; repetition_type
    # (field 3): 0 REQUIRED (no levels), 1 OPTIONAL (def levels)
    if len(schema) != 2:
        raise NotImplementedError("non-flat parquet schema")
    max_def = 1 if schema[1].get(3) == 1 else 0
    values: list[int] = []
    n_pages = 0
    for rg in row_groups:
        for chunk in rg.get(1) or []:  # ColumnChunk list
            cmeta = chunk.get(3)
            if cmeta is None:
                raise ValueError("column chunk without metadata")
            ptype = cmeta.get(1)
            codec = cmeta.get(4)
            num_values = cmeta.get(5)
            page_off = cmeta.get(9)
            if cmeta.get(11) is not None:
                raise NotImplementedError("dictionary-encoded chunk")
            if ptype != 2:  # Type.INT64
                raise NotImplementedError(f"parquet physical type {ptype}")
            pos = page_off
            seen = 0
            while seen < num_values:
                rd = _TReader(data, pos)
                ph = rd.read_struct()  # PageHeader
                pos = rd.pos
                page_type = ph.get(1)
                usize = ph.get(2)
                csize = ph.get(3)
                crc = ph.get(4)
                body = data[pos : pos + csize]
                if len(body) != csize:
                    raise ValueError("truncated page body")
                pos += csize
                if crc is not None:
                    if zlib.crc32(body) & 0xFFFFFFFF != crc & 0xFFFFFFFF:
                        raise ValueError("parquet page CRC mismatch (CRC)")
                if page_type != _PAGE_DATA:
                    raise NotImplementedError(
                        f"parquet page type {page_type}"
                    )
                dph = ph.get(5)  # DataPageHeader
                if dph is None:
                    raise ValueError("data page without its header")
                pvals = dph.get(1)
                if pvals is None or pvals < 0 or pvals > 1 << 24:
                    # raw varint; a crafted count would size the level
                    # decode and the unpack below — cap it before it
                    # drives any allocation (same bound as parquetv2)
                    raise ValueError("implausible page value count")
                enc = dph.get(2)
                if enc != _ENC_PLAIN:
                    raise NotImplementedError(f"parquet encoding {enc}")
                raw = _decompress(codec, body, usize)
                off = 0
                if max_def:
                    # OPTIONAL flat column ⇒ one RLE/bit-packed
                    # definition-level run precedes the values
                    levels, off = _read_rle_levels(raw, pvals, 1)
                    if any(lv == 0 for lv in levels):
                        raise NotImplementedError(
                            "null values in PLAIN page"
                        )
                if len(raw) - off != 8 * pvals:
                    raise ValueError("page body size disagrees with count")
                values.extend(struct.unpack_from(f"<{pvals}q", raw, off))
                seen += pvals
                n_pages += 1
    if num_rows is not None and len(values) != num_rows:
        raise ValueError("decoded values disagree with num_rows")
    return {
        "version": version,
        "num_rows": num_rows,
        "n_row_groups": len(row_groups),
        "n_schema_elements": len(schema),
        "n_pages": n_pages,
        "values": values,
    }


def walk_parquet_table(data: bytes) -> dict:
    """Multi-column extension of the single-column walk: k >= 1 flat
    INT64 columns (REQUIRED or OPTIONAL; nulls decode to None),
    PLAIN-encoded v1 data pages, codecs none/snappy/gzip — the
    profile pyarrow emits with dictionary off and page version 1.0.
    Returns {"columns": {name: [values]}, "num_rows", "n_row_groups"}.
    Used by the Delta checkpoint-parquet fold (deltacheckpoint.py)."""
    try:
        return _walk_parquet_table(data)
    except (IndexError, struct.error, TypeError, AttributeError) as exc:
        raise ValueError(f"malformed parquet structure ({exc})") from exc


def _walk_parquet_table(data: bytes) -> dict:
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
    schema = meta.get(2) or []
    row_groups = meta.get(4) or []
    if len(schema) < 2 or (schema[0].get(5) or 0) != len(schema) - 1:
        raise NotImplementedError("nested parquet schema in table walk")
    names = [s.get(4).decode() for s in schema[1:]]
    max_defs = [1 if s.get(3) == 1 else 0 for s in schema[1:]]
    cols: dict[str, list] = {n: [] for n in names}
    for rg in row_groups:
        chunks = rg.get(1) or []
        if len(chunks) != len(names):
            raise ValueError("row group chunk count disagrees with schema")
        for ci, chunk in enumerate(chunks):
            cmeta = chunk.get(3)
            if cmeta is None:
                raise ValueError("column chunk without metadata")
            if cmeta.get(1) != 2:  # Type.INT64
                raise NotImplementedError(
                    f"parquet physical type {cmeta.get(1)} in table walk")
            if cmeta.get(11) is not None:
                raise NotImplementedError("dictionary-encoded chunk")
            codec = cmeta.get(4)
            num_values = cmeta.get(5)
            pos = cmeta.get(9)
            out = cols[names[ci]]
            seen = 0
            while seen < num_values:
                rd = _TReader(data, pos)
                ph = rd.read_struct()  # PageHeader
                pos = rd.pos
                usize, csize = ph.get(2), ph.get(3)
                body = data[pos : pos + csize]
                if len(body) != csize:
                    raise ValueError("truncated page body")
                pos += csize
                if ph.get(1) != _PAGE_DATA:
                    raise NotImplementedError(
                        f"parquet page type {ph.get(1)}")
                dph = ph.get(5)
                if dph is None:
                    raise ValueError("data page without its header")
                pvals = dph.get(1)
                if pvals is None or pvals < 0 or pvals > 1 << 24:
                    raise ValueError("implausible page value count")
                if dph.get(2) != _ENC_PLAIN:
                    raise NotImplementedError(
                        f"parquet encoding {dph.get(2)}")
                raw = _decompress(codec, body, usize)
                off = 0
                levels = [1] * pvals
                if max_defs[ci]:
                    levels, off = _read_rle_levels(raw, pvals, 1)
                present = sum(levels)
                if len(raw) - off != 8 * present:
                    raise ValueError("page body size disagrees with count")
                vals = iter(struct.unpack_from(f"<{present}q", raw, off))
                out.extend(next(vals) if lv else None for lv in levels)
                seen += pvals
    for n in names:
        if num_rows is not None and len(cols[n]) != num_rows:
            raise ValueError("decoded values disagree with num_rows")
    return {
        "columns": cols,
        "num_rows": num_rows,
        "n_row_groups": len(row_groups),
    }


def first_page_body_span(data: bytes) -> tuple[int, int]:
    """(start, end) byte span of the FIRST page's body in ``data`` —
    the page at the first column chunk's lowest page offset (the
    dictionary page when one exists, else the first data page),
    located by walking the footer + thrift PageHeader exactly as the
    reader does. Fault injectors (binaryfile.py, parquetdict.py) use
    this to flip a byte PROVABLY inside a CRC-covered page body; a
    hardcoded offset could silently drift into a thrift header if a
    pyarrow upgrade shifts the layout (advisory, round 13)."""
    if len(data) < 12 or data[-4:] != b"PAR1":
        raise ValueError("missing parquet footer magic")
    flen = struct.unpack_from("<I", data, len(data) - 8)[0]
    meta = _TReader(data, len(data) - 8 - flen).read_struct()
    row_groups = meta.get(4) or []
    if not row_groups:
        raise ValueError("no row groups")
    chunks = row_groups[0].get(1) or []
    cmeta = chunks[0].get(3)
    offs = [o for o in (cmeta.get(11), cmeta.get(9)) if o is not None]
    rd = _TReader(data, min(offs))
    ph = rd.read_struct()  # PageHeader
    csize = ph.get(3)
    if csize is None or rd.pos + csize > len(data):
        raise ValueError("first page body out of range")
    return rd.pos, rd.pos + csize


# ------------------------------------------------- driver-oracled query

_PQ_GROUPS = 10
_PQ_ROWGROUP = 1024


def _pq_values(g: int) -> list[int]:
    """Closed-form INT64 column for group ``g``."""
    n = 2500 + 128 * g
    return [(i * i * 7 + i * 13 + 997 * g) % 100_000 for i in range(n)]


def _pq_codec(g: int) -> str:
    # round 15: zstd + lz4 joined the rotation once their native
    # decoders were wired into _decompress; the facts the oracle
    # replays are codec-independent, so the lattice is unchanged
    return ("snappy", "none", "gzip", "zstd", "lz4")[g % 5]


def _pq_bytes(g: int, codec: str | None = None) -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"v": pa.array(_pq_values(g), type=pa.int64())})
    buf = pa.BufferOutputStream()
    pq.write_table(
        t, buf,
        use_dictionary=False,
        compression=codec or _pq_codec(g),
        data_page_version="1.0",
        write_statistics=False,
        write_page_checksum=True,
        row_group_size=_PQ_ROWGROUP,
    )
    return buf.getvalue().to_pybytes()


def _pq_payload(doc_id: int) -> bytes:
    g = doc_id % _PQ_GROUPS
    corrupt = doc_id % 11 == 3
    crc_err = doc_id % 17 == 2 and not corrupt
    unsup = doc_id % 13 == 5 and not (corrupt or crc_err)
    blob = bytearray(_pq_bytes(g, codec="brotli" if unsup else None))
    if crc_err:
        # flip a byte mid-body of the FIRST data page, located by the
        # same thrift walk the reader performs (first_page_body_span)
        # so the stored page CRC must catch it whatever layout pyarrow
        # emits (round-13 advisory applied here too)
        s, e = first_page_body_span(bytes(blob))
        blob[s + (e - s) // 2] ^= 0x01
    if corrupt:
        del blob[-6:]  # cut inside footer length + magic
    return bytes(blob)


def _pq_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache: dict[tuple, tuple] = {}

    def facts(doc_id: int) -> tuple:
        g = doc_id % _PQ_GROUPS
        key = (g, doc_id % 11 == 3, doc_id % 17 == 2, doc_id % 13 == 5)
        if key not in cache:
            try:
                f = walk_parquet(_pq_payload(doc_id))
                vals = f["values"]
                vsum = sum(vals)
                wsum = sum((i + 1) * v for i, v in enumerate(vals))
                cache[key] = (
                    "decoded", f["n_row_groups"], f["n_pages"],
                    len(vals), vsum, wsum,
                )
            except NotImplementedError:
                cache[key] = ("unsupported", 0, 0, 0, 0, 0)
            except ValueError as exc:
                status = "crc_error" if "CRC" in str(exc) else "corrupt"
                cache[key] = (status, 0, 0, 0, 0, 0)
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt", 0, 0, 0, 0, 0)
        return cache[key]

    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(d),) + facts(int(d)) for d in pdf["doc_id"]]
        yield pd.DataFrame(
            out,
            columns=["doc_id", "status", "n_row_groups", "n_pages",
                     "n_values", "value_sum", "wsum"],
        ).astype(
            {"doc_id": "int64", "n_row_groups": "int32",
             "n_pages": "int32", "n_values": "int64",
             "value_sum": "int64", "wsum": "int64"}
        )


def _pq_oracle() -> str:
    bad = "d.doc_id % 11 = 3 OR d.doc_id % 17 = 2 OR d.doc_id % 13 = 5"
    # n_row_groups = ceil(n / 1024); pyarrow emits ONE v1 data page
    # per row group at these sizes (default page size 1 MiB >> group
    # bytes), so n_pages = n_row_groups — a design fact the walk must
    # reproduce
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_PQ_GROUPS} AS g FROM documents
    ),
    rows_ AS (
      SELECT g, 2500 + 128 * g AS n FROM grp
    ),
    vals AS (
      SELECT r.g, i,
             (i * i * 7 + i * 13 + 997 * r.g) % 100000 AS v
      FROM rows_ r, LATERAL (
        SELECT unnest(range(0, r.n)) AS i
      )
    ),
    sums AS (
      SELECT v.g,
             CAST((SELECT CAST(ceil(CAST(n AS DOUBLE) / {_PQ_ROWGROUP})
                   AS INT) FROM rows_ WHERE rows_.g = v.g)
               AS INT) AS n_row_groups,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(v) AS BIGINT) AS value_sum,
             CAST(SUM((i + 1) * v) AS BIGINT) AS wsum
      FROM vals v GROUP BY v.g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 3 THEN 'corrupt'
                WHEN d.doc_id % 17 = 2 THEN 'crc_error'
                WHEN d.doc_id % 13 = 5 THEN 'unsupported'
                ELSE 'decoded' END AS status,
           CASE WHEN {bad} THEN 0 ELSE s.n_row_groups END AS n_row_groups,
           CASE WHEN {bad} THEN 0 ELSE s.n_row_groups END AS n_pages,
           CASE WHEN {bad} THEN 0 ELSE s.n_values END AS n_values,
           CASE WHEN {bad} THEN 0 ELSE s.value_sum END AS value_sum,
           CASE WHEN {bad} THEN 0 ELSE s.wsum END AS wsum
    FROM documents d
    JOIN sums s ON d.doc_id % {_PQ_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("ingest_parquet_native_walk", oracle=_pq_oracle())
def ingest_parquet_native_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet read with no parquet library: Thrift compact-protocol
    footer decode (FileMetaData → row groups → column-chunk
    metadata), per-page Thrift page headers, page CRC-32
    verification, page decompression through OUR codecs (snappy and
    RFC 1951/1952 gzip from this repo; brotli groups are the honest
    'unsupported' boundary), and PLAIN INT64 value decode — values,
    row-group and page counts all replayed by the oracle from the
    closed-form column pyarrow serialized at runtime (writer, walker
    and oracle pairwise independent). Typed verdicts: a cut inside
    the footer length/magic ('corrupt'), a flipped page-body byte
    under an intact stored CRC ('crc_error' — the page checksum is
    provably verified), a brotli-coded file ('unsupported').

    Scale notes (100 TB): Arrow-batched mapInPandas; footer-first
    walk is exactly how real readers prune row groups/pages; only
    integer facts re-enter the JVM."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _pq_batches,
        schema=(
            "doc_id long, status string, n_row_groups int, n_pages int, "
            "n_values long, value_sum long, wsum long"
        ),
    ).transform(_presentation_sort, "doc_id")
