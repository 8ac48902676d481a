"""Native ORC file walk — the other columnar warehouse format
(Hive's default; Trino/Presto/Spark warehouses ship petabytes of it).
Implements the public Apache ORC v1 specification natively, with no
ORC or protobuf library in the decode path:

- a protocol-buffers wire reader (varint / length-delimited fields)
  for the PostScript, Footer, StripeInformation, Type, ColumnEncoding,
  Stream and ColumnStatistics messages (orc_proto.proto is public);
- the trailing PostScript handshake: last byte = postscript length,
  ``ORC`` magic, footer/metadata lengths, compression kind;
- ORC's chunked compression framing (3-byte little-endian header,
  ``(length << 1) | isOriginal``) with every chunk routed through
  this repo's OWN native decoders: ZLIB → operators/inflate.py raw
  DEFLATE, SNAPPY → operators/snappy.py raw block, LZ4 →
  operators/lz4frame.py raw block, ZSTD → operators/zstdfse.py's
  FSE+Huffman frame decoder; LZO is the honest typed boundary;
- the RLEv2 integer decoder for DIRECT_V2 long columns — all four
  sub-encodings (SHORT_REPEAT, DIRECT, PATCHED_BASE with the
  gap-255 patch-list continuation rule, DELTA incl. fixed-delta
  runs), MSB-first bit unpacking, the 32-entry closed width table
  (the patch-list entry width is the closest TABLE width ≥ gap+patch
  width — not byte-aligned; pinned by test);
- per-stripe stream-offset walking (index region vs data region),
  stripe-footer ColumnEncoding checks, and TWO carried-twice
  integrity cross-checks the format invites: Σ stripe row counts
  must equal the footer's numberOfRows, and the footer's per-column
  IntegerStatistics (min/max/sum, sint64 zigzag) must equal the
  values actually decoded.

Correctness evidence: pyarrow's ORC writer (the independent C++
implementation) is the runtime WRITER across all five compression
kinds; the five fixture columns are chosen to force each RLEv2
sub-encoding (affine ramp → DELTA, sawtooth → DIRECT, plateau runs →
SHORT_REPEAT/fixed-delta, rare 1e9 outliers → PATCHED_BASE, a signed
sawtooth → zigzag); the DuckDB oracle replays the closed-form value
lattice and never sees an ORC byte. Typed verdicts, each
non-vacuous: tail truncation ('corrupt'), a footer numberOfRows
patched away from the stripe row sum ('mismatch'), an LZO
compression kind written into the postscript ('unsupported').

Scale notes (100 TB): Arrow-batched ``mapInPandas``; the
postscript-first walk is exactly how real readers plan stripe-level
splits without scanning; decode is parallel across files, sequential
only within one file's stripe chain; ~60 B of integer facts re-enter
the JVM per file; the only shuffle is the harness ``orderBy``.

Reference: Apache ORC specification v1 + orc_proto.proto (public);
no repo counterpart (SURVEY.md §2l extension).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from ..functions.planctl import presentation_sort as _presentation_sort
from .inflate import inflate_raw
from .lz4frame import lz4_decompress_block
from .snappy import snappy_decompress_block
from .zstdfse import decompress_frame

# ------------------------------------------------ protobuf wire reader


def _pb_varint(b: bytes, p: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if p >= len(b):
            raise ValueError("orc protobuf varint truncated")
        x = b[p]
        p += 1
        out |= (x & 0x7F) << shift
        shift += 7
        if not x & 0x80:
            return out, p
        if shift > 70:
            raise ValueError("orc protobuf varint too long")


def _pb_fields(b: bytes) -> list[tuple[int, int | bytes]]:
    """Decode one protobuf message → [(field number, value)] where a
    varint field yields int and a length-delimited field yields bytes.
    Fixed32/64 are kept as raw bytes (unused by the ORC tail)."""
    p = 0
    out: list[tuple[int, int | bytes]] = []
    while p < len(b):
        tag, p = _pb_varint(b, p)
        fld, wire = tag >> 3, tag & 7
        if fld == 0:
            raise ValueError("orc protobuf field number 0")
        if wire == 0:
            v, p = _pb_varint(b, p)
            out.append((fld, v))
        elif wire == 2:
            n, p = _pb_varint(b, p)
            if n < 0 or p + n > len(b):
                raise ValueError("orc protobuf length field truncated")
            out.append((fld, b[p : p + n]))
            p += n
        elif wire == 5:
            if p + 4 > len(b):
                raise ValueError("orc protobuf fixed32 truncated")
            out.append((fld, b[p : p + 4]))
            p += 4
        elif wire == 1:
            if p + 8 > len(b):
                raise ValueError("orc protobuf fixed64 truncated")
            out.append((fld, b[p : p + 8]))
            p += 8
        else:
            raise ValueError(f"orc protobuf wire type {wire}")
    return out


def _pb_build(fields: list[tuple[int, int | bytes]]) -> bytes:
    """Re-encode fields (inverse of ``_pb_fields`` for varint/bytes —
    used by the fixture tamperer to patch one field in place)."""
    out = bytearray()
    for fld, v in fields:
        if isinstance(v, int):
            out += _pb_encode_varint(fld << 3)
            out += _pb_encode_varint(v)
        else:
            out += _pb_encode_varint(fld << 3 | 2)
            out += _pb_encode_varint(len(v))
            out += v
    return bytes(out)


def _pb_encode_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# ------------------------------------------------ chunked compression

_KIND_NAMES = {0: "none", 1: "zlib", 2: "snappy", 3: "lzo", 4: "lz4",
               5: "zstd"}


def _orc_chunks(b: bytes, kind: int) -> bytes:
    """Undo ORC's chunked stream compression. Every compressed chunk
    is routed through this repo's own native decoders; ``isOriginal``
    chunks pass through."""
    if kind == 0:
        return bytes(b)
    if kind not in (1, 2, 4, 5):
        raise NotImplementedError(
            f"orc compression kind {_KIND_NAMES.get(kind, kind)}"
        )
    out = bytearray()
    p = 0
    while p < len(b):
        if p + 3 > len(b):
            raise ValueError("orc chunk header truncated")
        h = b[p] | b[p + 1] << 8 | b[p + 2] << 16
        p += 3
        n = h >> 1
        if p + n > len(b):
            raise ValueError("orc chunk body truncated")
        chunk = bytes(b[p : p + n])
        p += n
        if h & 1:
            out += chunk
        elif kind == 1:
            o, used = inflate_raw(chunk)
            if used != len(chunk):
                raise ValueError("orc zlib chunk has trailing garbage")
            out += o
        elif kind == 2:
            out += snappy_decompress_block(chunk)
        elif kind == 4:
            out += lz4_decompress_block(chunk)
        else:
            o, used = decompress_frame(chunk)
            if used != len(chunk):
                raise ValueError("orc zstd chunk has trailing garbage")
            out += o
    return bytes(out)


# ------------------------------------------------ RLEv2 decoder

# the closed 32-entry width table (spec "Bit Width Encoding"):
# codes 0..23 → 1..24 bits, then 26/28/30/32/40/48/56/64
_WIDTH = {**{c: c + 1 for c in range(24)},
          24: 26, 25: 28, 26: 30, 27: 32, 28: 40, 29: 48, 30: 56,
          31: 64}
_TABLE_WIDTHS = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]


def _closest_width(n: int) -> int:
    """Closest width table entry ≥ n — the patch-list entry width rule
    (NOT byte-aligned: a 7-bit gap + 23-bit patch packs at 30 bits)."""
    for a in _TABLE_WIDTHS:
        if n <= a:
            return a
    raise ValueError("orc rlev2 width exceeds 64 bits")


class _BitReader:
    """MSB-first bit unpacking over a byte range (ORC packs literal
    runs big-endian within each byte)."""

    __slots__ = ("b", "p", "bit")

    def __init__(self, b: bytes, p: int):
        self.b = b
        self.p = p
        self.bit = 0

    def read(self, width: int) -> int:
        out = 0
        need = width
        while need > 0:
            if self.p >= len(self.b):
                raise ValueError("orc rlev2 bitpacked run truncated")
            avail = 8 - self.bit
            take = avail if avail < need else need
            out = (out << take) | (
                (self.b[self.p] >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.p += 1
            need -= take
        return out

    def align(self) -> int:
        if self.bit:
            self.bit = 0
            self.p += 1
        return self.p


def rlev2_decode(b: bytes, signed: bool = True) -> list[int]:
    """Decode one RLEv2 byte stream → values. All four sub-encodings;
    SHORT_REPEAT/DIRECT literals and the DELTA base are zigzag when
    ``signed``; PATCHED_BASE is sign-magnitude by construction and
    never zigzags."""
    vals: list[int] = []
    p = 0
    while p < len(b):
        first = b[p]
        enc = first >> 6
        if enc == 0:  # SHORT_REPEAT
            wbytes = ((first >> 3) & 7) + 1
            count = (first & 7) + 3
            if p + 1 + wbytes > len(b):
                raise ValueError("orc short-repeat run truncated")
            v = int.from_bytes(b[p + 1 : p + 1 + wbytes], "big")
            if signed:
                v = _zz(v)
            vals.extend([v] * count)
            p += 1 + wbytes
        elif enc == 1:  # DIRECT
            w = _WIDTH[(first >> 1) & 0x1F]
            if p + 2 > len(b):
                raise ValueError("orc direct run header truncated")
            length = ((first & 1) << 8 | b[p + 1]) + 1
            br = _BitReader(b, p + 2)
            lits = [br.read(w) for _ in range(length)]
            p = br.align()
            if signed:
                vals.extend(_zz(v) for v in lits)
            else:
                vals.extend(lits)
        elif enc == 3:  # DELTA
            wcode = (first >> 1) & 0x1F
            w = 0 if wcode == 0 else _WIDTH[wcode]
            if p + 2 > len(b):
                raise ValueError("orc delta run header truncated")
            length = ((first & 1) << 8 | b[p + 1]) + 1
            p += 2
            base, p = _pb_varint(b, p)
            base = _zz(base) if signed else base
            db_u, p = _pb_varint(b, p)
            db = _zz(db_u)
            run = [base]
            if length > 1:
                prev = base + db
                run.append(prev)
                if w > 0:
                    br = _BitReader(b, p)
                    for _ in range(length - 2):
                        d = br.read(w)
                        prev = prev - d if db < 0 else prev + d
                        run.append(prev)
                    p = br.align()
                else:
                    for _ in range(length - 2):
                        prev += db
                        run.append(prev)
            vals.extend(run)
        else:  # PATCHED_BASE
            if p + 4 > len(b):
                raise ValueError("orc patched-base header truncated")
            w = _WIDTH[(first >> 1) & 0x1F]
            length = ((first & 1) << 8 | b[p + 1]) + 1
            third, fourth = b[p + 2], b[p + 3]
            bw = ((third >> 5) & 7) + 1
            pw = _WIDTH[third & 0x1F]
            pgw = ((fourth >> 5) & 7) + 1
            pll = fourth & 0x1F
            p += 4
            if p + bw > len(b):
                raise ValueError("orc patched-base base value truncated")
            base = int.from_bytes(b[p : p + bw], "big")
            p += bw
            sign_mask = 1 << (bw * 8 - 1)
            if base & sign_mask:
                base = -(base & (sign_mask - 1))
            br = _BitReader(b, p)
            lits = [br.read(w) for _ in range(length)]
            p = br.align()
            cw = _closest_width(pgw + pw)
            br = _BitReader(b, p)
            patches = [br.read(cw) for _ in range(pll)]
            p = br.align()
            idx = 0
            pmask = (1 << pw) - 1
            for ent in patches:
                gap = ent >> pw
                patch = ent & pmask
                idx += gap
                if gap == 255 and patch == 0:
                    continue  # gap-continuation entry carries no patch
                if idx >= length:
                    raise ValueError("orc patch index beyond run length")
                lits[idx] |= patch << w
            vals.extend(base + v for v in lits)
    return vals


# ------------------------------------------------ file walk

_TYPE_LONG = 4
_TYPE_FLOAT = 5
_TYPE_DOUBLE = 6
_TYPE_STRING = 7
_TYPE_TIMESTAMP = 9
_TYPE_LIST = 10
_TYPE_MAP = 11
_TYPE_STRUCT = 12
_TYPE_UNION = 13
_TYPE_DECIMAL = 14
_TYPE_DATE = 15
_ENC_DIRECT_V2 = 2
_ENC_DICT_V2 = 3
_STREAM_PRESENT = 0
_STREAM_DATA = 1
_STREAM_LENGTH = 2
_STREAM_DICT_DATA = 3
_STREAM_SECONDARY = 5
_INDEX_STREAMS = (6, 7, 8)  # ROW_INDEX, BLOOM_FILTER, BLOOM_FILTER_UTF8
_COL_STREAMS = (_STREAM_PRESENT, _STREAM_DATA, _STREAM_LENGTH,
                _STREAM_DICT_DATA, _STREAM_SECONDARY)
_ORC_EPOCH = 1420070400  # 2015-01-01 00:00:00 UTC, the format's epoch


def _subtype_ids(t: dict) -> list[int]:
    """Type.subtypes (repeated uint32) — protobuf writers may emit
    it PACKED (one length-delimited blob of varints) or unpacked."""
    out: list[int] = []
    for v in t.get(2, []):
        if isinstance(v, int):
            out.append(v)
        else:
            x, p = 0, 0
            while p < len(v):
                x, p = _pb_varint(v, p)
                out.append(x)
    return out


def _ieee_values(blob: bytes, tk: int, count: int) -> list[float]:
    """FLOAT/DOUBLE DATA streams are raw IEEE 754 little-endian."""
    w, f = (4, "f") if tk == _TYPE_FLOAT else (8, "d")
    if len(blob) != w * count:
        raise ValueError("orc float data size disagrees with count")
    return list(struct.unpack(f"<{count}{f}", blob))


def _zz_varints(data: bytes, count: int) -> list[int]:
    """``count`` unbounded zigzag base-128 varints (the DECIMAL
    DATA stream), consuming the span exactly."""
    out: list[int] = []
    p = 0
    for _ in range(count):
        v = 0
        shift = 0
        while True:
            if p >= len(data):
                raise ValueError("truncated decimal varint")
            b = data[p]
            p += 1
            v |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
            if shift > 140:
                raise ValueError("decimal varint too long")
        out.append((v >> 1) ^ -(v & 1))
    if p != len(data):
        raise ValueError("decimal data stream has trailing bytes")
    return out


def _ts_nanos(enc_nanos: int) -> int:
    """The SECONDARY stream's trailing-zero coding: low 3 bits b
    record (zeros removed − 1) when b != 0."""
    if enc_nanos < 0:
        raise ValueError("negative encoded nanoseconds")
    b = enc_nanos & 7
    n = enc_nanos >> 3
    if b:
        n *= 10 ** (b + 1)
    if n >= 1_000_000_000:
        raise ValueError("nanoseconds out of range")
    return n


def _grouped(fields: list[tuple[int, int | bytes]]) -> dict:
    out: dict[int, list] = {}
    for fld, v in fields:
        out.setdefault(fld, []).append(v)
    return out


def _byte_rle_decode(data: bytes) -> bytes:
    """ORC Byte-RLE: header < 128 → run of header+3 copies of the
    next byte; header >= 128 → literal run of 256-header bytes."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        h = data[pos]
        pos += 1
        if h < 128:
            if pos >= len(data):
                raise ValueError("truncated byte-rle run")
            out += bytes([data[pos]]) * (h + 3)
            pos += 1
        else:
            n = 256 - h
            if pos + n > len(data):
                raise ValueError("truncated byte-rle literal")
            out += data[pos : pos + n]
            pos += n
    return bytes(out)


def _present_bits(data: bytes, n: int) -> list[bool]:
    """PRESENT stream: byte-RLE bytes, 8 bits each MSB-first; the
    first ``n`` bits are the per-row non-null flags."""
    raw = _byte_rle_decode(data)
    if len(raw) * 8 < n:
        raise ValueError("present stream shorter than the stripe")
    return [bool(raw[i >> 3] >> (7 - (i & 7)) & 1) for i in range(n)]


def _string_values(streams: dict, encs: list, c: int, draw: bytes,
                   kind: int, n_present: int) -> list[str]:
    """String column body decode, shared by top-level primitives and
    compound children: DIRECT_V2 (LENGTH run + concatenated UTF-8)
    or DICTIONARY_V2 (dictionary blob + entry lengths + index run in
    DATA), with every carried-twice length cross-checked."""
    ek = encs[c].get(1, [0])[0] if c < len(encs) else -1
    if ek == _ENC_DIRECT_V2:
        lraw = streams.get((c, _STREAM_LENGTH))
        if lraw is None:
            raise ValueError("orc string column misses LENGTH")
        lengths = rlev2_decode(_orc_chunks(lraw, kind), signed=False)
        blob = _orc_chunks(draw, kind)
        if len(lengths) != n_present:
            raise ValueError("orc present/data count mismatch")
        if any(ln0 < 0 for ln0 in lengths) or \
                sum(lengths) != len(blob):
            raise ValueError(
                "orc string lengths disagree with data bytes")
        vals, p = [], 0
        for ln0 in lengths:
            vals.append(blob[p : p + ln0].decode("utf-8"))
            p += ln0
        return vals
    if ek != _ENC_DICT_V2:
        raise NotImplementedError("orc non-V2 string column")
    lraw = streams.get((c, _STREAM_LENGTH))
    if lraw is None:
        raise ValueError("orc dictionary misses LENGTH")
    dsize = encs[c].get(2, [0])[0] or 0
    dlens = rlev2_decode(_orc_chunks(lraw, kind), signed=False)
    if len(dlens) != dsize:
        raise ValueError("orc dictionary size disagrees with encoding")
    dblob = _orc_chunks(streams.get((c, _STREAM_DICT_DATA), b""), kind)
    if any(ln0 < 0 for ln0 in dlens) or sum(dlens) != len(dblob):
        raise ValueError(
            "orc dictionary lengths disagree with data bytes")
    entries, p = [], 0
    for ln0 in dlens:
        entries.append(dblob[p : p + ln0].decode("utf-8"))
        p += ln0
    idxs = rlev2_decode(_orc_chunks(draw, kind), signed=False)
    if len(idxs) != n_present:
        raise ValueError("orc present/data count mismatch")
    if any(i < 0 or i >= dsize for i in idxs):
        raise ValueError("orc dictionary index out of range")
    return [entries[i] for i in idxs]


def _compound_child_values(streams: dict, encs: list, c: int, tk: int,
                           kind: int, n_slots: int) -> list:
    """Decode the primitive CHILD column ``c`` of a compound type
    (struct field, map key/value). ORC records child values only for
    parent-present entries, so the child's own PRESENT stream (when
    written) is relative to those ``n_slots`` entries; nulls weave
    back in. Returns exactly ``n_slots`` values (None where the
    child bit is 0)."""
    praw = streams.get((c, _STREAM_PRESENT))
    cbits = (_present_bits(_orc_chunks(praw, kind), n_slots)
             if praw is not None else None)
    n_pres = sum(cbits) if cbits is not None else n_slots
    draw = streams.get((c, _STREAM_DATA))
    if draw is None:
        if n_pres:
            raise ValueError("orc present stream without data")
        vals: list = []
    elif tk == _TYPE_LONG:
        vals = rlev2_decode(_orc_chunks(draw, kind), signed=True)
    elif tk in (_TYPE_FLOAT, _TYPE_DOUBLE):
        vals = _ieee_values(_orc_chunks(draw, kind), tk, n_pres)
    elif tk == _TYPE_STRING:
        vals = _string_values(streams, encs, c, draw, kind, n_pres)
    else:
        raise NotImplementedError(f"orc compound child kind {tk}")
    if len(vals) != n_pres:
        raise ValueError("orc present/data count mismatch")
    if cbits is None:
        return list(vals)
    it = iter(vals)
    return [next(it) if b else None for b in cbits]


def walk_orc(data: bytes) -> dict:
    """Walk one ORC file → per-column decoded long values plus
    container facts. NULLABLE columns supported (r13): PRESENT
    streams decode through ORC Byte-RLE + MSB-first bits, DATA holds
    only present values and is woven back (all-null columns legally
    carry PRESENT with no DATA). STRING columns supported (r14):
    DIRECT_V2 (LENGTH run + concatenated UTF-8 bytes) and
    DICTIONARY_V2 (dictionary blob + entry lengths + index run),
    decoded in a collect-then-decode pass because a column's streams
    can interleave with other columns' in the data region.
    NotImplementedError for LZO/unknown compression, exotic column
    kinds (timestamp/decimal/...) or non-V2 encodings; ValueError
    with 'row count' for the footer-vs-stripes mismatch, with
    'statistics' when the footer's Integer/StringStatistics disagree
    with the decoded non-null values, plain ValueError for
    structural damage."""
    try:
        return _walk_orc(data)
    except (IndexError, TypeError, AttributeError) as exc:
        # corruption can flip a protobuf WIRE TYPE, so a field the
        # walk expects as a varint/submessage arrives as bytes/int —
        # that is structural damage, typed like truncation
        # (campaign-fuzz-pinned in tests)
        raise ValueError(f"malformed orc structure ({exc})") from exc


def _walk_orc(data: bytes) -> dict:
    if len(data) < 5:
        raise ValueError("orc file shorter than its postscript")
    ps_len = data[-1]
    if ps_len == 0 or 1 + ps_len > len(data):
        raise ValueError("orc postscript length out of bounds")
    ps = _grouped(_pb_fields(data[len(data) - 1 - ps_len : len(data) - 1]))
    if ps.get(8000, [b""])[0] != b"ORC":
        raise ValueError("bad orc postscript magic")
    if 1 not in ps or not isinstance(ps[1][0], int):
        raise ValueError("orc postscript lacks footerLength")
    footer_len = ps[1][0]
    kind = ps.get(2, [0])[0]
    if not isinstance(kind, int):
        raise ValueError("orc compression kind is not a varint")
    end = len(data) - 1 - ps_len
    if footer_len <= 0 or end - footer_len < 0:
        raise ValueError("orc footer length out of bounds")
    footer = _grouped(_pb_fields(_orc_chunks(data[end - footer_len : end],
                                             kind)))
    if 6 not in footer:
        raise ValueError("orc footer lacks numberOfRows")
    n_rows = footer[6][0]
    types = [_grouped(_pb_fields(t)) for t in footer.get(4, [])]
    if not types or types[0].get(1, [0])[0] != _TYPE_STRUCT:
        raise ValueError("orc root type is not a struct")
    _PRIM_KINDS = (_TYPE_LONG, _TYPE_STRING, _TYPE_TIMESTAMP,
                   _TYPE_DECIMAL, _TYPE_DATE, _TYPE_FLOAT, _TYPE_DOUBLE)
    top_ids = _subtype_ids(types[0]) or list(range(1, len(types)))
    top: list[tuple] = []  # (tag, column id, child id, leaf kind)
    for cid in top_ids:
        if not 1 <= cid < len(types):
            raise ValueError("orc root subtype id out of range")
        tk = types[cid].get(1, [0])[0]
        if tk == _TYPE_LIST:
            kids = _subtype_ids(types[cid])
            if len(kids) != 1 or not 1 <= kids[0] < len(types):
                raise ValueError("orc list type without its child")
            ck = types[kids[0]].get(1, [0])[0]
            if ck not in (_TYPE_LONG, _TYPE_FLOAT, _TYPE_DOUBLE):
                raise NotImplementedError(
                    f"orc list element kind {ck}")
            top.append(("list", cid, kids[0], ck))
        elif tk == _TYPE_STRUCT:
            kids = _subtype_ids(types[cid])
            if not kids or any(not 1 <= k < len(types) for k in kids):
                raise ValueError("orc struct type without its children")
            cks = tuple(types[k].get(1, [0])[0] for k in kids)
            for ck in cks:
                if ck not in (_TYPE_LONG, _TYPE_FLOAT, _TYPE_DOUBLE,
                              _TYPE_STRING):
                    raise NotImplementedError(
                        f"orc struct field kind {ck}")
            top.append(("struct", cid, tuple(kids), cks))
        elif tk == _TYPE_MAP:
            kids = _subtype_ids(types[cid])
            if len(kids) != 2 or any(
                    not 1 <= k < len(types) for k in kids):
                raise ValueError("orc map type without key/value")
            kk = types[kids[0]].get(1, [0])[0]
            vk = types[kids[1]].get(1, [0])[0]
            if kk not in (_TYPE_LONG, _TYPE_STRING):
                raise NotImplementedError(f"orc map key kind {kk}")
            if vk not in (_TYPE_LONG, _TYPE_FLOAT, _TYPE_DOUBLE,
                          _TYPE_STRING):
                raise NotImplementedError(f"orc map value kind {vk}")
            top.append(("map", cid, tuple(kids), (kk, vk)))
        elif tk == _TYPE_UNION:
            kids = _subtype_ids(types[cid])
            if not kids or len(kids) > 127 or any(
                    not 1 <= k < len(types) for k in kids):
                raise ValueError("orc union type without its variants")
            cks = tuple(types[k].get(1, [0])[0] for k in kids)
            for ck in cks:
                if ck not in (_TYPE_LONG, _TYPE_FLOAT, _TYPE_DOUBLE,
                              _TYPE_STRING):
                    raise NotImplementedError(
                        f"orc union variant kind {ck}")
            top.append(("union", cid, tuple(kids), cks))
        elif tk in _PRIM_KINDS:
            top.append(("prim", cid, None, tk))
        else:
            # the remaining exotic kinds stay an honest typed boundary
            raise NotImplementedError(f"orc column type kind {tk}")
    n_cols = len(top)
    columns: list[list] = [[] for _ in range(n_cols)]
    enc_seen: list[set[int]] = [set() for _ in range(n_cols)]
    stripe_rows = 0
    n_stripes = 0
    for s in footer.get(3, []):
        si = _grouped(_pb_fields(s))
        try:
            off = si[1][0]
            ilen = si[2][0]
            dlen = si[3][0]
            sflen = si[4][0]
            srows = si[5][0]
        except (KeyError, IndexError) as exc:
            raise ValueError("orc stripe information incomplete") from exc
        if off + ilen + dlen + sflen > len(data):
            raise ValueError("orc stripe extends beyond the file")
        sfoot = _grouped(
            _pb_fields(_orc_chunks(
                data[off + ilen + dlen : off + ilen + dlen + sflen], kind
            ))
        )
        encs = [_grouped(_pb_fields(e)) for e in sfoot.get(2, [])]
        col_enc: dict[int, int] = {}

        def _enc_gate(cid: int, tk: int) -> int:
            ek = encs[cid].get(1, [0])[0] if cid < len(encs) else -1
            if tk in (_TYPE_LONG, _TYPE_TIMESTAMP, _TYPE_DECIMAL,
                      _TYPE_DATE) and ek != _ENC_DIRECT_V2:
                raise NotImplementedError("orc non-DIRECT_V2 integer column")
            if tk == _TYPE_STRING and ek not in (_ENC_DIRECT_V2,
                                                 _ENC_DICT_V2):
                raise NotImplementedError("orc non-V2 string column")
            if tk in (_TYPE_FLOAT, _TYPE_DOUBLE) and ek != 0:
                raise NotImplementedError("orc non-DIRECT float column")
            col_enc[cid] = ek
            return ek

        for ti, (tag, cid, child, tk) in enumerate(top):
            if tag == "list":
                ek = encs[cid].get(1, [0])[0] if cid < len(encs) else -1
                if ek != _ENC_DIRECT_V2:
                    raise NotImplementedError(
                        "orc non-DIRECT_V2 list column")
                col_enc[cid] = ek
                _enc_gate(child, tk)
                enc_seen[ti].add(ek)
            elif tag == "struct":
                # a struct column itself carries only PRESENT; its
                # encoding is plain DIRECT
                ek = encs[cid].get(1, [0])[0] if cid < len(encs) else -1
                if ek != 0:
                    raise NotImplementedError(
                        "orc non-DIRECT struct column")
                col_enc[cid] = ek
                for k, ck in zip(child, tk):
                    _enc_gate(k, ck)
                enc_seen[ti].add(ek)
            elif tag == "map":
                # a map column carries PRESENT + LENGTH; the LENGTH
                # run is RLEv2, so the encoding must be DIRECT_V2
                ek = encs[cid].get(1, [0])[0] if cid < len(encs) else -1
                if ek != _ENC_DIRECT_V2:
                    raise NotImplementedError(
                        "orc non-DIRECT_V2 map column")
                col_enc[cid] = ek
                for k, ck in zip(child, tk):
                    _enc_gate(k, ck)
                enc_seen[ti].add(ek)
            elif tag == "union":
                # a union column carries PRESENT + a byte-RLE TAG
                # stream in DATA; its encoding is plain DIRECT
                ek = encs[cid].get(1, [0])[0] if cid < len(encs) else -1
                if ek != 0:
                    raise NotImplementedError(
                        "orc non-DIRECT union column")
                col_enc[cid] = ek
                for k, ck in zip(child, tk):
                    _enc_gate(k, ck)
                enc_seen[ti].add(ek)
            else:
                enc_seen[ti].add(_enc_gate(cid, tk))
        # pass 1: slice every data-region stream in file order (the
        # region is a pure concatenation; LENGTH/DICTIONARY_DATA for
        # one column can interleave with other columns' streams, so
        # decode must wait until the cursor walk is done)
        dpos = off + ilen  # data region starts after the index region
        streams: dict[tuple[int, int], bytes] = {}
        for st_raw in sfoot.get(1, []):
            st = _grouped(_pb_fields(st_raw))
            skind = st.get(1, [0])[0]
            col = st.get(2, [0])[0]
            ln = st.get(3, [0])[0]
            if skind in _INDEX_STREAMS:
                continue  # lives in the index region; no data cursor move
            if 1 <= col < len(types) and skind in _COL_STREAMS:
                if dpos + ln > off + ilen + dlen:
                    raise ValueError(
                        "orc present stream beyond data region"
                        if skind == _STREAM_PRESENT
                        else "orc data stream beyond data region")
                if (col, skind) in streams:
                    raise ValueError("duplicate orc stream for a column")
                streams[(col, skind)] = data[dpos : dpos + ln]
            dpos += ln
        # pass 2: decode per column by (type, encoding)
        for ti, (tag, c, child, tk) in enumerate(top):
            praw = streams.get((c, _STREAM_PRESENT))
            bits = (_present_bits(_orc_chunks(praw, kind), srows)
                    if praw is not None else None)
            if tag == "list":
                # LIST: LENGTH run on the list column (present rows
                # only), element values on the CHILD column (with its
                # own PRESENT weave for null elements)
                n_lists = sum(bits) if bits is not None else srows
                lraw = streams.get((c, _STREAM_LENGTH))
                if lraw is None:
                    if bits is not None and not any(bits):
                        columns[ti].extend([None] * srows)
                        continue
                    raise ValueError("orc list column misses LENGTH")
                lengths = rlev2_decode(_orc_chunks(lraw, kind),
                                       signed=False)
                if len(lengths) != n_lists:
                    raise ValueError("orc present/data count mismatch")
                if any(ln0 < 0 for ln0 in lengths):
                    raise ValueError("orc negative list length")
                total = sum(lengths)
                cpraw = streams.get((child, _STREAM_PRESENT))
                cbits = (_present_bits(_orc_chunks(cpraw, kind), total)
                         if cpraw is not None else None)
                n_elems = sum(cbits) if cbits is not None else total
                cdraw = streams.get((child, _STREAM_DATA))
                if cdraw is None:
                    if n_elems:
                        raise ValueError("orc present stream without data")
                    cvals: list = []
                elif tk == _TYPE_LONG:
                    cvals = rlev2_decode(_orc_chunks(cdraw, kind),
                                         signed=True)
                else:
                    cvals = _ieee_values(_orc_chunks(cdraw, kind), tk,
                                         n_elems)
                if len(cvals) != n_elems:
                    raise ValueError("orc present/data count mismatch")
                if cbits is not None:
                    it0 = iter(cvals)
                    elems = [next(it0) if b else None for b in cbits]
                else:
                    elems = list(cvals)
                out0 = columns[ti]
                li = iter(lengths)
                pos0 = 0
                for b in (bits if bits is not None else [True] * srows):
                    if not b:
                        out0.append(None)
                        continue
                    ln0 = next(li)
                    out0.append(elems[pos0 : pos0 + ln0])
                    pos0 += ln0
                if pos0 != total:
                    raise ValueError(
                        "orc list lengths disagree with elements")
                continue
            if tag == "struct":
                # STRUCT: PRESENT on the struct column only; each
                # field column records one value per struct-present
                # row (with its own PRESENT weave for field nulls)
                n_present_rows = sum(bits) if bits is not None else srows
                kid_vals = [
                    _compound_child_values(streams, encs, k, ck, kind,
                                           n_present_rows)
                    for k, ck in zip(child, tk)
                ]
                packed = list(zip(*kid_vals)) if kid_vals else []
                if len(packed) != n_present_rows:
                    raise ValueError(
                        "orc struct field row count mismatch")
                it0 = iter(packed)
                out0 = columns[ti]
                for b in (bits if bits is not None else [True] * srows):
                    out0.append(tuple(next(it0)) if b else None)
                continue
            if tag == "map":
                # MAP: PRESENT + LENGTH on the map column (entry
                # counts for present rows); keys and values are child
                # columns covering the concatenated entries, exactly
                # the LIST element weave done twice
                n_maps = sum(bits) if bits is not None else srows
                lraw = streams.get((c, _STREAM_LENGTH))
                if lraw is None:
                    if bits is not None and not any(bits):
                        columns[ti].extend([None] * srows)
                        continue
                    raise ValueError("orc map column misses LENGTH")
                lengths = rlev2_decode(_orc_chunks(lraw, kind),
                                       signed=False)
                if len(lengths) != n_maps:
                    raise ValueError("orc present/data count mismatch")
                if any(ln0 < 0 for ln0 in lengths):
                    raise ValueError("orc negative map length")
                total = sum(lengths)
                keys = _compound_child_values(
                    streams, encs, child[0], tk[0], kind, total)
                mvals = _compound_child_values(
                    streams, encs, child[1], tk[1], kind, total)
                out0 = columns[ti]
                li = iter(lengths)
                pos0 = 0
                for b in (bits if bits is not None else [True] * srows):
                    if not b:
                        out0.append(None)
                        continue
                    ln0 = next(li)
                    out0.append(list(zip(keys[pos0 : pos0 + ln0],
                                         mvals[pos0 : pos0 + ln0])))
                    pos0 += ln0
                if pos0 != total:
                    raise ValueError(
                        "orc map lengths disagree with entries")
                continue
            if tag == "union":
                # UNION: byte-RLE tag per present row in DATA; each
                # variant child records values for its tag's rows (in
                # row order), with its own PRESENT weave
                n_present_rows = sum(bits) if bits is not None else srows
                draw = streams.get((c, _STREAM_DATA))
                if draw is None:
                    if n_present_rows:
                        raise ValueError("orc union column misses DATA")
                    utags: list[int] = []
                else:
                    raw_tags = _byte_rle_decode(_orc_chunks(draw, kind))
                    if len(raw_tags) < n_present_rows:
                        raise ValueError(
                            "orc union tag stream shorter than rows")
                    utags = list(raw_tags[:n_present_rows])
                nvar = len(child)
                if any(t0 >= nvar for t0 in utags):
                    raise ValueError("orc union tag out of range")
                counts = [0] * nvar
                for t0 in utags:
                    counts[t0] += 1
                kid_iters = [
                    iter(_compound_child_values(
                        streams, encs, k, ck, kind, counts[vi]))
                    for vi, (k, ck) in enumerate(zip(child, tk))
                ]
                woven = [
                    (t0, next(kid_iters[t0])) for t0 in utags
                ]
                it0 = iter(woven)
                out0 = columns[ti]
                for b in (bits if bits is not None else [True] * srows):
                    out0.append(next(it0) if b else None)
                continue
            draw = streams.get((c, _STREAM_DATA))
            if draw is None:
                if bits is not None:
                    # an all-null column legally has PRESENT but no DATA
                    if any(bits):
                        raise ValueError("orc present stream without data")
                    columns[ti].extend([None] * srows)
                continue
            n_present = sum(bits) if bits is not None else srows
            if tk in (_TYPE_FLOAT, _TYPE_DOUBLE):
                vals = _ieee_values(_orc_chunks(draw, kind), tk,
                                    n_present)
            elif tk in (_TYPE_LONG, _TYPE_DATE):
                # DATE is days-since-epoch through the same signed run
                vals = rlev2_decode(_orc_chunks(draw, kind), signed=True)
            elif tk == _TYPE_TIMESTAMP:
                # DATA: signed seconds relative to the 2015-01-01 ORC
                # epoch; SECONDARY: unsigned trailing-zero-coded nanos.
                # Decoded value: integer nanoseconds since 1970 (the
                # fixture keeps timestamps >= the ORC epoch, so the
                # format's negative-second + positive-nano ambiguity
                # cannot arise here).
                sraw = streams.get((c, _STREAM_SECONDARY))
                if sraw is None:
                    raise ValueError("orc timestamp misses SECONDARY")
                secs = rlev2_decode(_orc_chunks(draw, kind), signed=True)
                nans = rlev2_decode(_orc_chunks(sraw, kind),
                                    signed=False)
                if len(secs) != len(nans):
                    raise ValueError(
                        "orc timestamp second/nano count mismatch")
                vals = [
                    (s + _ORC_EPOCH) * 1_000_000_000 + _ts_nanos(n)
                    for s, n in zip(secs, nans)
                ]
            elif tk == _TYPE_DECIMAL:
                # DATA: unbounded zigzag varints (unscaled values);
                # SECONDARY: per-value scale run — every scale must
                # match the type's declared scale (carried twice).
                sraw = streams.get((c, _STREAM_SECONDARY))
                if sraw is None:
                    raise ValueError("orc decimal misses SECONDARY")
                decl_scale = types[c].get(6, [0])[0]
                vals = _zz_varints(_orc_chunks(draw, kind), n_present)
                scales = rlev2_decode(_orc_chunks(sraw, kind),
                                      signed=True)
                if len(scales) != len(vals):
                    raise ValueError(
                        "orc decimal value/scale count mismatch")
                if any(s != decl_scale for s in scales):
                    raise ValueError(
                        "orc decimal scale disagrees with the type")
            else:
                # string DIRECT_V2 / DICTIONARY_V2 — shared with the
                # compound-child decode
                vals = _string_values(streams, encs, c, draw, kind,
                                      n_present)
            if bits is None:
                if len(vals) != srows:
                    raise ValueError(
                        "orc data stream row count disagrees with stripe"
                    )
                columns[ti].extend(vals)
            else:
                # nullable: DATA holds only the present values,
                # woven back through the PRESENT bitmap
                if len(vals) != n_present:
                    raise ValueError("orc present/data count mismatch")
                it = iter(vals)
                columns[ti].extend(
                    next(it) if b else None for b in bits
                )
        stripe_rows += srows
        n_stripes += 1
    if n_stripes == 0:
        raise ValueError("orc file has no stripes")
    if stripe_rows != n_rows:
        raise ValueError("orc footer/stripe row count mismatch")
    # a column whose stripe carried neither PRESENT nor DATA is
    # silently skipped above; this closes that hole — every column
    # must have decoded exactly numberOfRows values (the same
    # decoded-vs-declared closure parquetnested applies)
    for ti, col in enumerate(columns):
        if len(col) != n_rows:
            raise ValueError(
                f"orc column {ti} decoded {len(col)} rows, footer "
                f"declares {n_rows}"
            )
    # second carried-twice check: footer IntegerStatistics vs decoded
    stats = [_grouped(_pb_fields(st)) for st in footer.get(7, [])]
    for ti, (tag, cid, child, tk) in enumerate(top):
        if tag != "prim" or cid >= len(stats):
            continue
        cs = stats[cid]
        non_null = [v for v in columns[ti] if v is not None]
        if cs.get(1, [None])[0] not in (None, len(non_null)):
            raise ValueError("orc column statistics value count mismatch")
        if not non_null:
            continue
        ints = cs.get(2, [None])[0]
        if ints is not None and tk == _TYPE_LONG:
            ig = _grouped(_pb_fields(ints))
            dec_min, dec_max = min(non_null), max(non_null)
            dec_sum = sum(non_null)
            for fld, dec in ((1, dec_min), (2, dec_max), (3, dec_sum)):
                if fld in ig and _zz(ig[fld][0]) != dec:
                    raise ValueError("orc footer statistics mismatch")
        strs = cs.get(4, [None])[0]
        if strs is not None and tk == _TYPE_STRING:
            # StringStatistics: 1 minimum, 2 maximum (UTF-8 bytes,
            # bytewise order), 3 sum of lengths (sint64)
            sg = _grouped(_pb_fields(strs))
            enc_nn = [v.encode("utf-8") for v in non_null]
            for fld, dec in ((1, min(enc_nn)), (2, max(enc_nn))):
                if fld in sg and sg[fld][0] != dec:
                    raise ValueError("orc footer statistics mismatch")
            if 3 in sg and _zz(sg[3][0]) != sum(len(b) for b in enc_nn):
                raise ValueError("orc footer statistics mismatch")
    return {
        "compression": _KIND_NAMES.get(kind, str(kind)),
        "n_rows": n_rows,
        "n_stripes": n_stripes,
        "n_cols": n_cols,
        "columns": columns,
        "encodings": [sorted(s) for s in enc_seen],
    }


# ------------------------------------------------ fixture writer

_ORC_GROUPS = 10
_ORC_CODECS = ("uncompressed", "zlib", "snappy", "lz4", "zstd")


def _orc_n(g: int) -> int:
    return 3000 + 173 * g


def _orc_cols(g: int, n: int) -> dict[str, list[int]]:
    """Five closed-form long columns, each shaped to force a distinct
    RLEv2 sub-encoding out of the independent C++ writer."""
    return {
        "a": [1000 * g + 3 * i for i in range(n)],  # affine → DELTA
        "b": [(i * i * 7 + 13 * i + 997 * g) % 65536
              for i in range(n)],  # sawtooth → DIRECT
        "c": [(i // 64) % 11 for i in range(n)],  # plateaus → SHORT_REPEAT
        "d": [i % 97 + (1_000_000_000 if i % 101 == 7 else 0)
              for i in range(n)],  # outliers → PATCHED_BASE
        "e": [(i * 13 % 2001) - 1000 for i in range(n)],  # signed zigzag
    }


def build_orc(g: int, codec: str) -> bytes:
    """pyarrow (the independent ORC C++ writer) writes the fixture;
    small stripe/chunk sizes force the multi-stripe and multi-chunk
    paths."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    n = _orc_n(g)
    cols = _orc_cols(g, n)
    t = pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=codec, stripe_size=4096,
        compression_block_size=4096,
    )
    return buf.getvalue()


def _retail(data: bytes, new_footer: bytes, kind: int,
            ps_fields: list[tuple[int, int | bytes]],
            footer_start: int) -> bytes:
    """Rebuild the file tail around a patched footer: frame it as one
    isOriginal chunk (legal inside any compressed file), then re-emit
    the postscript with the new footerLength."""
    if kind == 0:
        framed = new_footer
    else:
        h = len(new_footer) << 1 | 1
        framed = bytes((h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF))
        framed += new_footer
    ps = [(f, len(framed) if f == 1 else v) for f, v in ps_fields]
    ps_raw = _pb_build(ps)
    return data[:footer_start] + framed + ps_raw + bytes([len(ps_raw)])


def _orc_payload(doc_id: int) -> bytes:
    g = doc_id % _ORC_GROUPS
    corrupt = doc_id % 11 == 3
    mismatch = doc_id % 17 == 2 and not corrupt
    unsup = doc_id % 13 == 5 and not (corrupt or mismatch)
    # the unsupported class needs a real compression varint to patch,
    # so it always builds zlib (kind 1 → rewritten to 3 = LZO)
    codec = "zlib" if unsup else _ORC_CODECS[g % len(_ORC_CODECS)]
    data = build_orc(g, codec)
    if corrupt:
        return data[:-8]  # kills postscript length byte + magic
    if not (mismatch or unsup):
        return data
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len : len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd.get(2, [0])[0]
    footer_len = psd[1][0]
    footer_start = len(data) - 1 - ps_len - footer_len
    if unsup:
        ps = [(f, 3 if f == 2 else v) for f, v in ps_fields]
        ps_raw = _pb_build(ps)
        return data[:footer_start + footer_len] + ps_raw + bytes([len(ps_raw)])
    # mismatch: patch footer numberOfRows (+1) — the stripes keep
    # their true counts, so the carried-twice value disagrees
    footer = _pb_fields(_orc_chunks(data[footer_start:footer_start
                                         + footer_len], kind))
    patched = _pb_build([(f, v + 1 if f == 6 else v) for f, v in footer])
    return _retail(data, patched, kind, ps_fields, footer_start)


# ------------------------------------------------ spark + oracle


def _orc_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache: dict[tuple, tuple] = {}

    def facts(doc_id: int) -> tuple:
        g = doc_id % _ORC_GROUPS
        key = (g, doc_id % 11 == 3, doc_id % 17 == 2, doc_id % 13 == 5)
        if key not in cache:
            try:
                f = walk_orc(_orc_payload(doc_id))
                sums = [sum(c) for c in f["columns"]]
                cache[key] = ("decoded", f["n_rows"], *sums)
            except NotImplementedError:
                cache[key] = ("unsupported", 0, 0, 0, 0, 0, 0)
            except ValueError as exc:
                status = ("mismatch"
                          if "row count mismatch" in str(exc)
                          else "corrupt")
                cache[key] = (status, 0, 0, 0, 0, 0, 0)
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt", 0, 0, 0, 0, 0, 0)
        return cache[key]

    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(d),) + facts(int(d)) for d in pdf["doc_id"]]
        yield pd.DataFrame(
            out,
            columns=["doc_id", "status", "n_rows", "a_sum", "b_sum",
                     "c_sum", "d_sum", "e_sum"],
        ).astype(
            {"doc_id": "int64", "n_rows": "int64", "a_sum": "int64",
             "b_sum": "int64", "c_sum": "int64", "d_sum": "int64",
             "e_sum": "int64"}
        )


def _orc_oracle() -> str:
    bad = ("d.doc_id % 11 = 3 OR d.doc_id % 17 = 2 "
           "OR d.doc_id % 13 = 5")
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_ORC_GROUPS} AS g FROM documents
    ),
    recs AS (
      SELECT g, unnest(range(0, 3000 + 173 * g)) AS i FROM grp
    ),
    vals AS (
      SELECT g,
             1000 * g + 3 * i AS a,
             (i * i * 7 + 13 * i + 997 * g) % 65536 AS b,
             (i // 64) % 11 AS c,
             i % 97 + CASE WHEN i % 101 = 7
                           THEN 1000000000 ELSE 0 END AS dd,
             (i * 13 % 2001) - 1000 AS e
      FROM recs
    ),
    sums AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(a) AS BIGINT) AS a_sum,
             CAST(SUM(b) AS BIGINT) AS b_sum,
             CAST(SUM(c) AS BIGINT) AS c_sum,
             CAST(SUM(dd) AS BIGINT) AS d_sum,
             CAST(SUM(e) AS BIGINT) AS e_sum
      FROM vals GROUP BY g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 3 THEN 'corrupt'
                WHEN d.doc_id % 17 = 2 THEN 'mismatch'
                WHEN d.doc_id % 13 = 5 THEN 'unsupported'
                ELSE 'decoded' END AS status,
           CASE WHEN {bad} THEN 0 ELSE s.n_rows END AS n_rows,
           CASE WHEN {bad} THEN 0 ELSE s.a_sum END AS a_sum,
           CASE WHEN {bad} THEN 0 ELSE s.b_sum END AS b_sum,
           CASE WHEN {bad} THEN 0 ELSE s.c_sum END AS c_sum,
           CASE WHEN {bad} THEN 0 ELSE s.d_sum END AS d_sum,
           CASE WHEN {bad} THEN 0 ELSE s.e_sum END AS e_sum
    FROM documents d
    JOIN sums s ON d.doc_id % {_ORC_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("ingest_orc_walk", oracle=_orc_oracle())
def ingest_orc_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC read with no ORC/protobuf library: native protobuf wire
    decode of the PostScript/Footer/StripeFooter tail, chunked-stream
    decompression through this repo's OWN zlib/snappy/lz4/zstd
    decoders, and a full RLEv2 integer decoder (SHORT_REPEAT, DIRECT,
    PATCHED_BASE incl. the gap-255 continuation, DELTA) for DIRECT_V2
    long columns. pyarrow's ORC C++ writer is the independent runtime
    WRITER across all five compression kinds; the five fixture columns
    are shaped to force each RLEv2 sub-encoding; the DuckDB oracle
    replays the closed-form value lattice and never sees an ORC byte.
    Both carried-twice integrity values are cross-checked (stripe row
    sums vs footer numberOfRows; footer IntegerStatistics vs decoded
    min/max/sum). Typed verdicts, each non-vacuous: tail truncation
    ('corrupt'), a patched footer numberOfRows ('mismatch'), an LZO
    compression kind ('unsupported').

    Scale notes (100 TB): the postscript-first walk is the format's
    stripe-split planning path; Arrow-batched mapInPandas, parallel
    across files, ~60 B of integer facts per file re-enter the JVM."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _orc_batches,
        schema=(
            "doc_id long, status string, n_rows long, a_sum long, "
            "b_sum long, c_sum long, d_sum long, e_sum long"
        ),
    ).transform(_presentation_sort, "doc_id")


# ------------------------------------- nullable (PRESENT) fixture

_ON_GROUPS = 10


def _on_n(g: int) -> int:
    return 2500 + 140 * g


def _on_cols(g: int, n: int) -> dict[str, list]:
    """Two nullable closed-form columns (distinct null strides) and
    one ALL-NULL column — the PRESENT-with-no-DATA edge."""
    return {
        "v": [None if i % 5 == 3 else (7 * i + 3 * g) % 10000
              for i in range(n)],
        "u": [None if i % 7 == 2
              else ((i * i * 3 + 11 * i + 31 * g) % 20000) - 10000
              for i in range(n)],
        "w": [None] * n,
    }


def build_orc_nullable(g: int, codec: str) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    cols = _on_cols(g, _on_n(g))
    t = pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=codec, stripe_size=4096,
        compression_block_size=4096,
    )
    return buf.getvalue()


def _on_payload(doc_id: int) -> bytes:
    g = doc_id % _ON_GROUPS
    blob = build_orc_nullable(g, _ORC_CODECS[g % len(_ORC_CODECS)])
    if doc_id % 11 == 3:
        blob = blob[:-7]  # cut inside postscript/footer
    return blob


_ON_FACT_MEMO: dict[tuple, tuple] = {}


def _on_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache = _ON_FACT_MEMO

    def facts(doc_id: int) -> tuple:
        g = doc_id % _ON_GROUPS
        key = (g, doc_id % 11 == 3)
        if key not in cache:
            try:
                f = walk_orc(_on_payload(doc_id))
                v, u, w = f["columns"]
                cache[key] = (
                    "decoded", f["n_rows"],
                    sum(1 for x in v if x is not None),
                    sum(x for x in v if x is not None),
                    sum(1 for x in u if x is not None),
                    sum(x for x in u if x is not None),
                    sum(1 for x in w if x is not None),
                )
            except NotImplementedError:
                cache[key] = ("unsupported", 0, 0, 0, 0, 0, 0)
            except ValueError:
                cache[key] = ("corrupt", 0, 0, 0, 0, 0, 0)
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt", 0, 0, 0, 0, 0, 0)
        return cache[key]

    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(d),) + facts(int(d)) for d in pdf["doc_id"]]
        yield pd.DataFrame(
            out,
            columns=["doc_id", "status", "n_rows", "v_nonnull",
                     "v_sum", "u_nonnull", "u_sum", "w_nonnull"],
        ).astype({
            "doc_id": "int64", "n_rows": "int64", "v_nonnull": "int64",
            "v_sum": "int64", "u_nonnull": "int64", "u_sum": "int64",
            "w_nonnull": "int64",
        })


def _on_oracle() -> str:
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_ON_GROUPS} AS g FROM documents
    ),
    vals AS (
      SELECT r.g, i,
             (i % 5 != 3) AS v_ok,
             (7 * i + 3 * r.g) % 10000 AS v,
             (i % 7 != 2) AS u_ok,
             ((i * i * 3 + 11 * i + 31 * r.g) % 20000) - 10000 AS u
      FROM (SELECT g, 2500 + 140 * g AS n FROM grp) r,
           LATERAL (SELECT unnest(range(0, r.n)) AS i)
    ),
    sums AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN v_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS v_nonnull,
             CAST(SUM(CASE WHEN v_ok THEN v ELSE 0 END) AS BIGINT)
               AS v_sum,
             CAST(SUM(CASE WHEN u_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS u_nonnull,
             CAST(SUM(CASE WHEN u_ok THEN u ELSE 0 END) AS BIGINT)
               AS u_sum
      FROM vals GROUP BY g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 3 THEN 'corrupt'
                ELSE 'decoded' END AS status,
           CASE WHEN d.doc_id % 11 = 3 THEN 0 ELSE s.n_rows END
             AS n_rows,
           CASE WHEN d.doc_id % 11 = 3 THEN 0 ELSE s.v_nonnull END
             AS v_nonnull,
           CASE WHEN d.doc_id % 11 = 3 THEN 0 ELSE s.v_sum END
             AS v_sum,
           CASE WHEN d.doc_id % 11 = 3 THEN 0 ELSE s.u_nonnull END
             AS u_nonnull,
           CASE WHEN d.doc_id % 11 = 3 THEN 0 ELSE s.u_sum END
             AS u_sum,
           CAST(0 AS BIGINT) AS w_nonnull
    FROM documents d
    JOIN sums s ON d.doc_id % {_ON_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("ingest_orc_nullable_walk", oracle=_on_oracle())
def ingest_orc_nullable_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC NULLABLE columns through the native walk (r13): PRESENT
    streams decoded via ORC Byte-RLE + MSB-first bit weave, DATA
    holding only present values, and an ALL-NULL column exercising
    the PRESENT-with-no-DATA edge — across all five codecs through
    the repo's own decompressors, multi-stripe forced at 4 KiB. The
    footer IntegerStatistics cross-check now runs against NON-NULL
    values (numberOfValues is the non-null count per spec). Oracle
    replays both null strides and value sums closed-form.

    Scale notes (100 TB): nullable columns are the norm in real
    warehouses; the PRESENT bitmap is what keeps a null-heavy
    column's storage near zero, and a reader without it cannot open
    most production ORC files. Per-file map-side decode, memoized."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _on_batches,
        schema=(
            "doc_id long, status string, n_rows long, v_nonnull long, "
            "v_sum long, u_nonnull long, u_sum long, w_nonnull long"
        ),
    ).transform(_presentation_sort, "doc_id")


# ------------------------------------------ string columns (r14)

_OS_GROUPS = 10


def _os_n(g: int) -> int:
    return 2600 + 150 * g


def _os_cols(g: int, n: int) -> dict[str, list]:
    """A long key plus three closed-form string columns shaped to
    force BOTH string encodings out of the independent C++ writer:
    13-distinct tags → DICTIONARY_V2, per-row-unique values →
    DIRECT_V2 (ratio 1.0 above the 0.9 dictionary threshold), and a
    nullable 7-distinct column → DICTIONARY_V2 under PRESENT."""
    return {
        "key": list(range(n)),
        "s_dict": [f"k{(i * 7 + g) % 13}" for i in range(n)],
        "s_uniq": [
            f"v{g}_{(i * i * 3 + 11 * i + 31 * g) % 100000}_{i}"
            for i in range(n)
        ],
        "s_null": [None if (i + g) % 5 == 0 else f"t{(i * 3 + g) % 7}"
                   for i in range(n)],
    }


def build_orc_strings(g: int, codec: str) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    n = _os_n(g)
    cols = _os_cols(g, n)
    t = pa.table({
        k: pa.array(v, pa.int64() if k == "key" else pa.string())
        for k, v in cols.items()
    })
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=codec, stripe_size=4096,
        compression_block_size=4096,
        dictionary_key_size_threshold=0.9,
    )
    return buf.getvalue()


def _os_payload(doc_id: int) -> bytes:
    g = doc_id % _OS_GROUPS
    corrupt = doc_id % 11 == 3
    mismatch = doc_id % 17 == 2 and not corrupt
    unsup = doc_id % 13 == 5 and not (corrupt or mismatch)
    data = build_orc_strings(g, _ORC_CODECS[g % len(_ORC_CODECS)])
    if corrupt:
        return data[:-8]  # kills postscript length byte + magic
    if not (mismatch or unsup):
        return data
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len : len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd.get(2, [0])[0]
    footer_len = psd[1][0]
    footer_start = len(data) - 1 - ps_len - footer_len
    footer = _pb_fields(_orc_chunks(
        data[footer_start : footer_start + footer_len], kind))
    if mismatch:
        # footer numberOfRows (+1): stripes keep their true counts,
        # so the carried-twice value disagrees
        patched = _pb_build(
            [(f, v + 1 if f == 6 else v) for f, v in footer])
    else:
        # retype the LAST type message (the s_null string column) to
        # BINARY (8) — the 'unsupported' boundary is now only the
        # genuinely exotic kinds (DECIMAL/DATE/TIMESTAMP decode as of
        # r14, so the patch target moved from 14 to 8)
        n_types = sum(1 for f, _ in footer if f == 4)
        out, seen = [], 0
        for f, v in footer:
            if f == 4:
                seen += 1
                if seen == n_types:
                    tf = _pb_fields(v)
                    v = _pb_build(
                        [(ff, 8 if ff == 1 else vv) for ff, vv in tf])
            out.append((f, v))
        patched = _pb_build(out)
    return _retail(data, patched, kind, ps_fields, footer_start)


_OS_ZERO = (0,) * 13


# worker-process-scope decode memo (avrowalk r12/r13 lesson: a
# function-local cache rebuilds per partition iterator AND per pass)
_OS_FACT_MEMO: dict[tuple, tuple] = {}


def _os_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache = _OS_FACT_MEMO

    def facts(doc_id: int) -> tuple:
        g = doc_id % _OS_GROUPS
        key = (g, doc_id % 11 == 3, doc_id % 17 == 2, doc_id % 13 == 5)
        if key not in cache:
            try:
                f = walk_orc(_os_payload(doc_id))
                kcol, sdict, suniq, snull = f["columns"]
                defects = sum(1 for i, v in enumerate(kcol) if v != i)
                sdict_tag = sdict_w = 0
                for i, s in enumerate(sdict):
                    tag = int(s[1:])
                    sdict_tag += tag
                    sdict_w += (i + 1) * tag
                ulen = ua = uaw = 0
                for i, s in enumerate(suniq):
                    ulen += len(s)
                    gg, a, ii = s[1:].split("_")
                    ua += int(a)
                    uaw += (i + 1) * int(a)
                    defects += (int(ii) != i) + (int(gg) != g)
                nn = ntag = nw = 0
                for i, s in enumerate(snull):
                    if s is None:
                        continue
                    tag = int(s[1:])
                    nn += 1
                    ntag += tag
                    nw += (i + 1) * tag
                cache[key] = (
                    "decoded", f["n_rows"],
                    sum(1 for e in f["encodings"] if e == [_ENC_DICT_V2]),
                    sum(1 for e in f["encodings"]
                        if e == [_ENC_DIRECT_V2]),
                    sdict_tag, sdict_w, ulen, ua, uaw, defects,
                    nn, ntag, nw,
                )
            except NotImplementedError:
                cache[key] = ("unsupported",) + _OS_ZERO[1:]
            except ValueError as exc:
                status = ("mismatch"
                          if "row count mismatch" in str(exc)
                          else "corrupt")
                cache[key] = (status,) + _OS_ZERO[1:]
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt",) + _OS_ZERO[1:]
        return cache[key]

    cols = ["doc_id", "status", "n_rows", "dict_cols", "direct_cols",
            "sdict_tagsum", "sdict_wsum", "suniq_len", "suniq_asum",
            "suniq_awsum", "order_defects", "snull_nonnull",
            "snull_tagsum", "snull_wsum"]
    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(d),) + facts(int(d)) for d in pdf["doc_id"]]
        yield pd.DataFrame(out, columns=cols).astype(
            {c: "int64" for c in cols if c != "status"})


def _os_oracle() -> str:
    bad = ("d.doc_id % 11 = 3 OR d.doc_id % 17 = 2 "
           "OR d.doc_id % 13 = 5")
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_OS_GROUPS} AS g FROM documents
    ),
    recs AS (
      SELECT g, unnest(range(0, 2600 + 150 * g)) AS i FROM grp
    ),
    vals AS (
      SELECT g, i,
             (i * 7 + g) % 13 AS kd,
             (i * i * 3 + 11 * i + 31 * g) % 100000 AS a,
             ((i + g) % 5 = 0) AS snull_is_null,
             (i * 3 + g) % 7 AS kt
      FROM recs
    ),
    sums AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(kd) AS BIGINT) AS sdict_tagsum,
             CAST(SUM((i + 1) * kd) AS BIGINT) AS sdict_wsum,
             CAST(SUM(LENGTH('v' || CAST(g AS VARCHAR) || '_'
                             || CAST(a AS VARCHAR) || '_'
                             || CAST(i AS VARCHAR))) AS BIGINT)
               AS suniq_len,
             CAST(SUM(a) AS BIGINT) AS suniq_asum,
             CAST(SUM((i + 1) * a) AS BIGINT) AS suniq_awsum,
             CAST(SUM(CASE WHEN snull_is_null THEN 0 ELSE 1 END)
                  AS BIGINT) AS snull_nonnull,
             CAST(SUM(CASE WHEN snull_is_null THEN 0 ELSE kt END)
                  AS BIGINT) AS snull_tagsum,
             CAST(SUM(CASE WHEN snull_is_null THEN 0
                      ELSE (i + 1) * kt END) AS BIGINT) AS snull_wsum
      FROM vals GROUP BY g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 3 THEN 'corrupt'
                WHEN d.doc_id % 17 = 2 THEN 'mismatch'
                WHEN d.doc_id % 13 = 5 THEN 'unsupported'
                ELSE 'decoded' END AS status,
           CASE WHEN {bad} THEN 0 ELSE s.n_rows END AS n_rows,
           CAST(CASE WHEN {bad} THEN 0 ELSE 2 END AS BIGINT)
             AS dict_cols,
           CAST(CASE WHEN {bad} THEN 0 ELSE 2 END AS BIGINT)
             AS direct_cols,
           CASE WHEN {bad} THEN 0 ELSE s.sdict_tagsum END
             AS sdict_tagsum,
           CASE WHEN {bad} THEN 0 ELSE s.sdict_wsum END AS sdict_wsum,
           CASE WHEN {bad} THEN 0 ELSE s.suniq_len END AS suniq_len,
           CASE WHEN {bad} THEN 0 ELSE s.suniq_asum END AS suniq_asum,
           CASE WHEN {bad} THEN 0 ELSE s.suniq_awsum END
             AS suniq_awsum,
           CAST(0 AS BIGINT) AS order_defects,
           CASE WHEN {bad} THEN 0 ELSE s.snull_nonnull END
             AS snull_nonnull,
           CASE WHEN {bad} THEN 0 ELSE s.snull_tagsum END
             AS snull_tagsum,
           CASE WHEN {bad} THEN 0 ELSE s.snull_wsum END AS snull_wsum
    FROM documents d
    JOIN sums s ON d.doc_id % {_OS_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("ingest_orc_string_walk", oracle=_os_oracle())
def ingest_orc_string_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC STRING columns through the native walk (r14) — the
    default encoding shape of every real warehouse dimension:
    DIRECT_V2 (LENGTH run + concatenated UTF-8 bytes) and
    DICTIONARY_V2 (dictionary blob + entry-length run + index run),
    both through the existing RLEv2 machinery, nullable via the r13
    PRESENT path, across all five codecs through the repo's own
    decompressors. The fixture forces BOTH encodings out of
    pyarrow's independent C++ writer (13-distinct tags vs per-row
    unique values around the 0.9 dictionary threshold); decoded
    strings are parsed back to their closed-form integers so value
    sums, byte lengths, and row-order weights are integer-exact on
    both engines, and `order_defects` pins that every decoded
    component sits in its original row. StringStatistics
    (min/max/sum-of-lengths) are cross-checked against the decode.
    Typed verdicts: postscript cut ('corrupt'), footer
    numberOfRows+1 ('mismatch'), a column retyped to DECIMAL
    ('unsupported' — the boundary is now only exotic kinds).

    Scale notes (100 TB): dictionary decode is what keeps
    low-cardinality string scans cheap (indices, not bytes, cross
    the wire); per-file map-side decode, memoized per worker; only
    integer facts re-enter the JVM.

    Reference: none in /root/reference (SURVEY.md §2l extension);
    public ORC v1 spec (stream kinds, DICTIONARY_V2/DIRECT_V2)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    # spread the distinct (group, variant) decodes across the worker
    # pool (the sf0.1 documents scan is ONE input split — avrowalk
    # r13 lesson), and sort without a global orderBy (range
    # partitioning samples its child, re-executing the decode)
    combo = F.concat_ws(
        ":",
        (F.col("doc_id") % _OS_GROUPS),
        (F.col("doc_id") % 11 == 3).cast("int"),
        (F.col("doc_id") % 17 == 2).cast("int"),
        (F.col("doc_id") % 13 == 5).cast("int"),
    )
    out = d.repartition(32, combo).mapInPandas(
        _os_batches,
        schema=(
            "doc_id long, status string, n_rows long, dict_cols long, "
            "direct_cols long, sdict_tagsum long, sdict_wsum long, "
            "suniq_len long, suniq_asum long, suniq_awsum long, "
            "order_defects long, snull_nonnull long, "
            "snull_tagsum long, snull_wsum long"
        ),
    )
    return out.repartition(1).sortWithinPartitions("doc_id")


# --------------------------- timestamp / date / decimal (r14)

_OT_GROUPS = 10
_OT_EP = _ORC_EPOCH


def _ot_n(g: int) -> int:
    return 2400 + 120 * g


def _ot_nfrac(i: int) -> int:
    """Nanosecond fractions hitting every trailing-zero class of the
    SECONDARY coding: whole seconds, milliseconds, microseconds, and
    odd full-precision nanos."""
    m = i % 4
    if m == 0:
        return 0
    if m == 1:
        return ((i % 997) + 1) * 10**6
    if m == 2:
        return ((i % 99991) + 1) * 10**3
    return (i * 2654435761 % 10**9) | 1


def _ot_cols(g: int, n: int) -> dict[str, list]:
    """Closed-form timestamp (epoch nanos), nullable date (days),
    and decimal(13,2) (unscaled ints) columns."""
    ts = [
        (_OT_EP + (i * 37 + 13 * g) % 200_000_000) * 10**9
        + _ot_nfrac(i)
        for i in range(n)
    ]
    d = [None if (i + g) % 6 == 3
         else (i * 11 + 3 * g) % 40000 - 5000 for i in range(n)]
    dec = [((i * 31 + 997 * g) % 2_000_000_000) - 1_000_000_000
           for i in range(n)]
    return {"ts": ts, "d": d, "dec": dec}


def build_orc_temporal(g: int, codec: str) -> bytes:
    import decimal as _decimal
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    cols = _ot_cols(g, _ot_n(g))
    t = pa.table({
        "ts": pa.array(cols["ts"], pa.timestamp("ns")),
        "d": pa.array(cols["d"], pa.date32()),
        "dec": pa.array(
            [_decimal.Decimal(u).scaleb(-2) for u in cols["dec"]],
            pa.decimal128(13, 2)),
    })
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=codec, stripe_size=4096,
        compression_block_size=4096,
    )
    return buf.getvalue()


def _ot_payload(doc_id: int) -> bytes:
    g = doc_id % _OT_GROUPS
    corrupt = doc_id % 11 == 3
    mismatch = doc_id % 17 == 2 and not corrupt
    unsup = doc_id % 13 == 5 and not (corrupt or mismatch)
    data = build_orc_temporal(g, _ORC_CODECS[g % len(_ORC_CODECS)])
    if corrupt:
        return data[:-8]
    if not (mismatch or unsup):
        return data
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len : len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd.get(2, [0])[0]
    footer_len = psd[1][0]
    footer_start = len(data) - 1 - ps_len - footer_len
    footer = _pb_fields(_orc_chunks(
        data[footer_start : footer_start + footer_len], kind))
    if mismatch:
        patched = _pb_build(
            [(f, v + 1 if f == 6 else v) for f, v in footer])
    else:
        # retype the timestamp column (2nd Type message) to BINARY
        # (8) — still an honestly-unsupported kind
        out, seen = [], 0
        for f, v in footer:
            if f == 4:
                seen += 1
                if seen == 2:
                    tf = _pb_fields(v)
                    v = _pb_build(
                        [(ff, 8 if ff == 1 else vv) for ff, vv in tf])
            out.append((f, v))
        patched = _pb_build(out)
    return _retail(data, patched, kind, ps_fields, footer_start)


_OT_ZERO = (0,) * 11

_OT_FACT_MEMO: dict[tuple, tuple] = {}


def _ot_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache = _OT_FACT_MEMO

    def facts(doc_id: int) -> tuple:
        g = doc_id % _OT_GROUPS
        key = (g, doc_id % 11 == 3, doc_id % 17 == 2, doc_id % 13 == 5)
        if key not in cache:
            try:
                f = walk_orc(_ot_payload(doc_id))
                ts, d, dec = f["columns"]
                sec_sum = nano_sum = ts_w = 0
                for i, v in enumerate(ts):
                    sec = v // 10**9 - _OT_EP
                    sec_sum += sec
                    nano_sum += v % 10**9
                    ts_w += (i + 1) * (sec % 100003)
                d_nn = d_sum = d_w = 0
                for i, v in enumerate(d):
                    if v is None:
                        continue
                    d_nn += 1
                    d_sum += v
                    d_w += (i + 1) * v
                dec_sum = sum(dec)
                dec_neg = sum(1 for v in dec if v < 0)
                cache[key] = (
                    "decoded", f["n_rows"], sec_sum, nano_sum, ts_w,
                    d_nn, d_sum, d_w, dec_sum, dec_neg,
                    sum((i + 1) * v for i, v in enumerate(dec)),
                )
            except NotImplementedError:
                cache[key] = ("unsupported",) + _OT_ZERO[1:]
            except ValueError as exc:
                status = ("mismatch"
                          if "row count mismatch" in str(exc)
                          else "corrupt")
                cache[key] = (status,) + _OT_ZERO[1:]
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt",) + _OT_ZERO[1:]
        return cache[key]

    cols = ["doc_id", "status", "n_rows", "ts_sec_sum", "ts_nano_sum",
            "ts_wsum", "d_nonnull", "d_sum", "d_wsum", "dec_sum",
            "dec_neg", "dec_wsum"]
    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(x),) + facts(int(x)) for x in pdf["doc_id"]]
        yield pd.DataFrame(out, columns=cols).astype(
            {c: "int64" for c in cols if c != "status"})


def _ot_oracle() -> str:
    bad = ("d.doc_id % 11 = 3 OR d.doc_id % 17 = 2 "
           "OR d.doc_id % 13 = 5")
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_OT_GROUPS} AS g FROM documents
    ),
    recs AS (
      SELECT g, unnest(range(0, 2400 + 120 * g)) AS i FROM grp
    ),
    vals AS (
      SELECT g, i,
             (i * 37 + 13 * g) % 200000000 AS sec,
             CASE i % 4
               WHEN 0 THEN 0
               WHEN 1 THEN ((i % 997) + 1) * 1000000
               WHEN 2 THEN ((i % 99991) + 1) * 1000
               ELSE ((i * 2654435761) % 1000000000) | 1
             END AS nfrac,
             ((i + g) % 6 = 3) AS d_null,
             (i * 11 + 3 * g) % 40000 - 5000 AS days,
             ((i * 31 + 997 * g) % 2000000000) - 1000000000 AS u
      FROM recs
    ),
    sums AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(sec) AS BIGINT) AS ts_sec_sum,
             CAST(SUM(nfrac) AS BIGINT) AS ts_nano_sum,
             CAST(SUM((i + 1) * (sec % 100003)) AS BIGINT) AS ts_wsum,
             CAST(SUM(CASE WHEN d_null THEN 0 ELSE 1 END) AS BIGINT)
               AS d_nonnull,
             CAST(SUM(CASE WHEN d_null THEN 0 ELSE days END)
               AS BIGINT) AS d_sum,
             CAST(SUM(CASE WHEN d_null THEN 0 ELSE (i + 1) * days END)
               AS BIGINT) AS d_wsum,
             CAST(SUM(u) AS BIGINT) AS dec_sum,
             CAST(SUM(CASE WHEN u < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS dec_neg,
             CAST(SUM((i + 1) * u) AS BIGINT) AS dec_wsum
      FROM vals GROUP BY g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 3 THEN 'corrupt'
                WHEN d.doc_id % 17 = 2 THEN 'mismatch'
                WHEN d.doc_id % 13 = 5 THEN 'unsupported'
                ELSE 'decoded' END AS status,
           CASE WHEN {bad} THEN 0 ELSE s.n_rows END AS n_rows,
           CASE WHEN {bad} THEN 0 ELSE s.ts_sec_sum END AS ts_sec_sum,
           CASE WHEN {bad} THEN 0 ELSE s.ts_nano_sum END
             AS ts_nano_sum,
           CASE WHEN {bad} THEN 0 ELSE s.ts_wsum END AS ts_wsum,
           CASE WHEN {bad} THEN 0 ELSE s.d_nonnull END AS d_nonnull,
           CASE WHEN {bad} THEN 0 ELSE s.d_sum END AS d_sum,
           CASE WHEN {bad} THEN 0 ELSE s.d_wsum END AS d_wsum,
           CASE WHEN {bad} THEN 0 ELSE s.dec_sum END AS dec_sum,
           CASE WHEN {bad} THEN 0 ELSE s.dec_neg END AS dec_neg,
           CASE WHEN {bad} THEN 0 ELSE s.dec_wsum END AS dec_wsum
    FROM documents d
    JOIN sums s ON d.doc_id % {_OT_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("ingest_orc_temporal_walk", oracle=_ot_oracle())
def ingest_orc_temporal_walk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC TIMESTAMP / DATE / DECIMAL through the native walk (r14) —
    the kinds the r13 verdict called the remaining exotic boundary.
    TIMESTAMP: signed RLEv2 seconds relative to the format's
    2015-01-01 epoch + the SECONDARY stream's trailing-zero-coded
    unsigned nanos (all four zero classes — whole seconds, ms, µs,
    odd nanos — forced by the fixture); DATE: signed days through
    the long path; DECIMAL(13,2): unbounded zigzag varint unscaled
    values with the per-value scale run cross-checked against the
    type's declared scale (carried twice). Nullable dates ride the
    PRESENT weave. pyarrow is the independent writer across the five
    codecs; every fact (second/nano sums, day sums, unscaled decimal
    sums, row-order weights) is integer-exact and replayed
    closed-form by DuckDB. Typed verdicts: postscript cut
    ('corrupt'), footer rows+1 ('mismatch'), a column retyped to
    BINARY ('unsupported').

    Scale notes (100 TB): event-time columns ARE timestamps; a
    reader without this kind cannot open a real events table. The
    decode stays O(values) streaming; per-file map-side, memoized;
    integer facts only re-enter the JVM."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    combo = F.concat_ws(
        ":",
        (F.col("doc_id") % _OT_GROUPS),
        (F.col("doc_id") % 11 == 3).cast("int"),
        (F.col("doc_id") % 17 == 2).cast("int"),
        (F.col("doc_id") % 13 == 5).cast("int"),
    )
    out = d.repartition(32, combo).mapInPandas(
        _ot_batches,
        schema=("doc_id long, status string, n_rows long, "
                "ts_sec_sum long, ts_nano_sum long, ts_wsum long, "
                "d_nonnull long, d_sum long, d_wsum long, "
                "dec_sum long, dec_neg long, dec_wsum long"),
    )
    return out.repartition(1).sortWithinPartitions("doc_id")


# --------------------------------- LIST columns (r14, embeddings)

_OL_GROUPS = 10


def _ol_n(g: int) -> int:
    return 2200 + 110 * g


def _ol_lists(g: int) -> list[list | None]:
    """Closed-form embeddings-shaped list<float32> column: NULL
    lists, empty lists, NULL elements, float32-exact values s/64."""
    out: list[list | None] = []
    for i in range(_ol_n(g)):
        if (i * 7 + g) % 13 == 4:
            out.append(None)
        elif (i * 11 + g) % 17 == 5:
            out.append([])
        else:
            row = []
            for j in range(1 + (i + g) % 6):
                if (i + 5 * j + g) % 19 == 6:
                    row.append(None)
                else:
                    s = ((29 * i + 17 * j + 997 * g) % 4096) - 2048
                    row.append(s / 64.0)
            out.append(row)
    return out


def build_orc_list(g: int, codec: str) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({
        "key": pa.array(range(_ol_n(g)), pa.int64()),
        "emb": pa.array(_ol_lists(g), pa.list_(pa.float32())),
    })
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=codec, stripe_size=4096,
        compression_block_size=4096,
    )
    return buf.getvalue()


def _ol_payload(doc_id: int) -> bytes:
    g = doc_id % _OL_GROUPS
    corrupt = doc_id % 11 == 3
    mismatch = doc_id % 17 == 2 and not corrupt
    unsup = doc_id % 13 == 5 and not (corrupt or mismatch)
    data = build_orc_list(g, _ORC_CODECS[g % len(_ORC_CODECS)])
    if corrupt:
        return data[:-8]
    if not (mismatch or unsup):
        return data
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len : len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd.get(2, [0])[0]
    footer_len = psd[1][0]
    footer_start = len(data) - 1 - ps_len - footer_len
    footer = _pb_fields(_orc_chunks(
        data[footer_start : footer_start + footer_len], kind))
    if mismatch:
        patched = _pb_build(
            [(f, v + 1 if f == 6 else v) for f, v in footer])
    else:
        # retype the LIST ELEMENT (4th Type message: root, key, list,
        # element) to BINARY (8) — lists of unsupported leaves stay a
        # typed boundary
        out, seen = [], 0
        for f, v in footer:
            if f == 4:
                seen += 1
                if seen == 4:
                    tf = _pb_fields(v)
                    v = _pb_build(
                        [(ff, 8 if ff == 1 else vv) for ff, vv in tf])
            out.append((f, v))
        patched = _pb_build(out)
    return _retail(data, patched, kind, ps_fields, footer_start)


_OL_ZERO = (0,) * 8

_OL_FACT_MEMO: dict[tuple, tuple] = {}


def _ol_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache = _OL_FACT_MEMO

    def facts(doc_id: int) -> tuple:
        g = doc_id % _OL_GROUPS
        key = (g, doc_id % 11 == 3, doc_id % 17 == 2, doc_id % 13 == 5)
        if key not in cache:
            try:
                f = walk_orc(_ol_payload(doc_id))
                kcol, emb = f["columns"]
                defects = sum(1 for i, v in enumerate(kcol) if v != i)
                n_null = n_empty = n_nullel = n_vals = ssum = wsum = 0
                for i, row in enumerate(emb):
                    if row is None:
                        n_null += 1
                        continue
                    if row == []:
                        n_empty += 1
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
                    "decoded", f["n_rows"], n_null, n_empty, n_nullel,
                    n_vals, ssum, wsum, defects,
                )
            except NotImplementedError:
                cache[key] = ("unsupported",) + _OL_ZERO
            except ValueError as exc:
                status = ("mismatch"
                          if "row count mismatch" in str(exc)
                          else "corrupt")
                cache[key] = (status,) + _OL_ZERO
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt",) + _OL_ZERO
        return cache[key]

    cols = ["doc_id", "status", "n_rows", "n_null_lists",
            "n_empty_lists", "n_null_elems", "n_values", "sum_scaled",
            "wsum_scaled", "order_defects"]
    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(x),) + facts(int(x)) for x in pdf["doc_id"]]
        yield pd.DataFrame(out, columns=cols).astype(
            {c: "int64" for c in cols if c != "status"})


def _ol_oracle() -> str:
    bad = ("d.doc_id % 11 = 3 OR d.doc_id % 17 = 2 "
           "OR d.doc_id % 13 = 5")
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_OL_GROUPS} AS g FROM documents
    ),
    rr AS (
      SELECT g, i,
             ((i * 7 + g) % 13 = 4) AS null_list,
             ((i * 7 + g) % 13 <> 4
              AND (i * 11 + g) % 17 = 5) AS empty_list,
             1 + (i + g) % 6 AS len
      FROM (SELECT g, unnest(range(0, 2200 + 110 * g)) AS i FROM grp)
    ),
    el AS (
      SELECT rr.g, rr.i, j,
             ((rr.i + 5 * j + rr.g) % 19 = 6) AS null_elem,
             ((29 * rr.i + 17 * j + 997 * rr.g) % 4096) - 2048 AS s
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
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN null_list THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_lists,
             CAST(SUM(CASE WHEN empty_list THEN 1 ELSE 0 END)
               AS BIGINT) AS n_empty_lists
      FROM rr GROUP BY g
    ),
    sums AS (
      SELECT r.g, r.n_rows, r.n_null_lists, r.n_empty_lists,
             e.n_null_elems, e.n_values, e.sum_scaled, e.wsum_scaled
      FROM rsums r JOIN esums e ON r.g = e.g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 3 THEN 'corrupt'
                WHEN d.doc_id % 17 = 2 THEN 'mismatch'
                WHEN d.doc_id % 13 = 5 THEN 'unsupported'
                ELSE 'decoded' END AS status,
           CASE WHEN {bad} THEN 0 ELSE s.n_rows END AS n_rows,
           CASE WHEN {bad} THEN 0 ELSE s.n_null_lists END
             AS n_null_lists,
           CASE WHEN {bad} THEN 0 ELSE s.n_empty_lists END
             AS n_empty_lists,
           CASE WHEN {bad} THEN 0 ELSE s.n_null_elems END
             AS n_null_elems,
           CASE WHEN {bad} THEN 0 ELSE s.n_values END AS n_values,
           CASE WHEN {bad} THEN 0 ELSE s.sum_scaled END AS sum_scaled,
           CASE WHEN {bad} THEN 0 ELSE s.wsum_scaled END
             AS wsum_scaled,
           CAST(0 AS BIGINT) AS order_defects
    FROM documents d
    JOIN sums s ON d.doc_id % {_OL_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("ingest_orc_list_walk", oracle=_ol_oracle())
def ingest_orc_list_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC LIST columns through the native walk (r14) — the
    embeddings shape (``list<float>``) in the OTHER columnar format,
    so both warehouse formats' nested vector layout now decodes
    natively. The type TREE is rebuilt from the root's packed
    subtypes; the LIST column carries a PRESENT weave (null lists)
    plus an RLEv2 LENGTH run over present rows (zero lengths = empty
    lists), and the CHILD column carries its own PRESENT weave (null
    elements) over raw IEEE-754 float DATA. Values are float32-exact
    (s/64) so element sums and row-and-position weights are
    integer-exact in the DuckDB oracle; ``order_defects`` pins both
    row and element order. Typed verdicts: postscript cut
    ('corrupt'), footer rows+1 ('mismatch'), the list ELEMENT
    retyped to BINARY ('unsupported').

    Scale notes (100 TB): the LENGTH-run + child-stream split is why
    ORC vector scans stream — offsets are a prefix sum, elements are
    contiguous IEEE; per-file map-side decode, memoized; only
    integer facts re-enter the JVM."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    combo = F.concat_ws(
        ":",
        (F.col("doc_id") % _OL_GROUPS),
        (F.col("doc_id") % 11 == 3).cast("int"),
        (F.col("doc_id") % 17 == 2).cast("int"),
        (F.col("doc_id") % 13 == 5).cast("int"),
    )
    out = d.repartition(32, combo).mapInPandas(
        _ol_batches,
        schema=("doc_id long, status string, n_rows long, "
                "n_null_lists long, n_empty_lists long, "
                "n_null_elems long, n_values long, sum_scaled long, "
                "wsum_scaled long, order_defects long"),
    )
    return out.repartition(1).sortWithinPartitions("doc_id")


# ----------------------------------- MAP compound type (round 15)

_OM_GROUPS = 10


def _om_n(g: int) -> int:
    return 2300 + 115 * g


def _om_maps(g: int) -> list[list | None]:
    """Closed-form map<string,long> column: NULL maps, empty maps,
    NULL values, per-row-distinct keys 'k0'..'k8' (a tiny repeated
    alphabet, so the writer's dictionary path engages for keys)."""
    out: list[list | None] = []
    for i in range(_om_n(g)):
        if (i * 7 + g) % 13 == 4:
            out.append(None)
        elif (i * 11 + g) % 17 == 5:
            out.append([])
        else:
            row = []
            for j in range(1 + (i + g) % 5):
                k = f"k{(i + g + j) % 9}"
                if (i + 5 * j + g) % 19 == 6:
                    row.append((k, None))
                else:
                    row.append((k, ((29 * i + 17 * j + 997 * g)
                                    % 10007) - 5000))
            out.append(row)
    return out


def build_orc_map(g: int, codec: str) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({
        "key": pa.array(range(_om_n(g)), pa.int64()),
        "m": pa.array(_om_maps(g), pa.map_(pa.string(), pa.int64())),
    })
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=codec, stripe_size=4096,
        compression_block_size=4096,
    )
    return buf.getvalue()


def _om_payload(doc_id: int) -> bytes:
    g = doc_id % _OM_GROUPS
    corrupt = doc_id % 11 == 3
    mismatch = doc_id % 17 == 2 and not corrupt
    unsup = doc_id % 13 == 5 and not (corrupt or mismatch)
    data = build_orc_map(g, _ORC_CODECS[g % len(_ORC_CODECS)])
    if corrupt:
        return data[:-8]
    if not (mismatch or unsup):
        return data
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len : len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd.get(2, [0])[0]
    footer_len = psd[1][0]
    footer_start = len(data) - 1 - ps_len - footer_len
    footer = _pb_fields(_orc_chunks(
        data[footer_start : footer_start + footer_len], kind))
    if mismatch:
        patched = _pb_build(
            [(f, v + 1 if f == 6 else v) for f, v in footer])
    else:
        # retype the map VALUE child (5th Type message: root, key,
        # map, map-key, map-value) to BINARY (8) — maps of
        # unsupported leaves stay a typed boundary
        out, seen = [], 0
        for f, v in footer:
            if f == 4:
                seen += 1
                if seen == 5:
                    tf = _pb_fields(v)
                    v = _pb_build(
                        [(ff, 8 if ff == 1 else vv) for ff, vv in tf])
            out.append((f, v))
        patched = _pb_build(out)
    return _retail(data, patched, kind, ps_fields, footer_start)


_OM_ZERO = (0,) * 8

_OM_FACT_MEMO: dict[tuple, tuple] = {}


def _om_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache = _OM_FACT_MEMO

    def facts(doc_id: int) -> tuple:
        g = doc_id % _OM_GROUPS
        key = (g, doc_id % 11 == 3, doc_id % 17 == 2, doc_id % 13 == 5)
        if key not in cache:
            try:
                f = walk_orc(_om_payload(doc_id))
                kcol, maps = f["columns"]
                if any(v != i for i, v in enumerate(kcol)):
                    raise ValueError("orc map fixture key disorder")
                n_null = n_empty = n_nullv = n_vals = 0
                key_wsum = val_sum = val_wsum = 0
                for i, row in enumerate(maps):
                    if row is None:
                        n_null += 1
                        continue
                    if row == []:
                        n_empty += 1
                        continue
                    for j, (mk, mv) in enumerate(row):
                        kd = int(mk[1:])
                        key_wsum += (i + 1) * (j + 1) * kd
                        if mv is None:
                            n_nullv += 1
                        else:
                            n_vals += 1
                            val_sum += mv
                            val_wsum += (i + 1) * (j + 1) * mv
                cache[key] = (
                    "decoded", f["n_rows"], n_null, n_empty, n_nullv,
                    n_vals, key_wsum, val_sum, val_wsum,
                )
            except NotImplementedError:
                cache[key] = ("unsupported",) + _OM_ZERO
            except ValueError as exc:
                status = ("mismatch"
                          if "row count mismatch" in str(exc)
                          else "corrupt")
                cache[key] = (status,) + _OM_ZERO
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt",) + _OM_ZERO
        return cache[key]

    cols = ["doc_id", "status", "n_rows", "n_null_maps",
            "n_empty_maps", "n_null_vals", "n_values", "key_wsum",
            "val_sum", "val_wsum"]
    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(x),) + facts(int(x)) for x in pdf["doc_id"]]
        yield pd.DataFrame(out, columns=cols).astype(
            {c: "int64" for c in cols if c != "status"})


def _om_oracle() -> str:
    bad = ("d.doc_id % 11 = 3 OR d.doc_id % 17 = 2 "
           "OR d.doc_id % 13 = 5")
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_OM_GROUPS} AS g FROM documents
    ),
    rr AS (
      SELECT g, i,
             ((i * 7 + g) % 13 = 4) AS null_map,
             ((i * 7 + g) % 13 <> 4
              AND (i * 11 + g) % 17 = 5) AS empty_map,
             1 + (i + g) % 5 AS len
      FROM (SELECT g, unnest(range(0, 2300 + 115 * g)) AS i FROM grp)
    ),
    el AS (
      SELECT rr.g, rr.i, j,
             (rr.i + rr.g + j) % 9 AS kd,
             ((rr.i + 5 * j + rr.g) % 19 = 6) AS null_val,
             ((29 * rr.i + 17 * j + 997 * rr.g) % 10007) - 5000 AS v
      FROM rr, LATERAL (SELECT unnest(range(0, rr.len)) AS j)
      WHERE NOT rr.null_map AND NOT rr.empty_map
    ),
    esums AS (
      SELECT g,
             CAST(SUM(CASE WHEN null_val THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_vals,
             CAST(SUM(CASE WHEN null_val THEN 0 ELSE 1 END) AS BIGINT)
               AS n_values,
             CAST(SUM((i + 1) * (j + 1) * kd) AS BIGINT) AS key_wsum,
             CAST(SUM(CASE WHEN null_val THEN 0 ELSE v END) AS BIGINT)
               AS val_sum,
             CAST(SUM(CASE WHEN null_val THEN 0
                      ELSE (i + 1) * (j + 1) * v END) AS BIGINT)
               AS val_wsum
      FROM el GROUP BY g
    ),
    rsums AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN null_map THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_maps,
             CAST(SUM(CASE WHEN empty_map THEN 1 ELSE 0 END)
               AS BIGINT) AS n_empty_maps
      FROM rr GROUP BY g
    ),
    sums AS (
      SELECT r.g, r.n_rows, r.n_null_maps, r.n_empty_maps,
             e.n_null_vals, e.n_values, e.key_wsum, e.val_sum,
             e.val_wsum
      FROM rsums r JOIN esums e ON r.g = e.g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 3 THEN 'corrupt'
                WHEN d.doc_id % 17 = 2 THEN 'mismatch'
                WHEN d.doc_id % 13 = 5 THEN 'unsupported'
                ELSE 'decoded' END AS status,
           CASE WHEN {bad} THEN 0 ELSE s.n_rows END AS n_rows,
           CASE WHEN {bad} THEN 0 ELSE s.n_null_maps END
             AS n_null_maps,
           CASE WHEN {bad} THEN 0 ELSE s.n_empty_maps END
             AS n_empty_maps,
           CASE WHEN {bad} THEN 0 ELSE s.n_null_vals END
             AS n_null_vals,
           CASE WHEN {bad} THEN 0 ELSE s.n_values END AS n_values,
           CASE WHEN {bad} THEN 0 ELSE s.key_wsum END AS key_wsum,
           CASE WHEN {bad} THEN 0 ELSE s.val_sum END AS val_sum,
           CASE WHEN {bad} THEN 0 ELSE s.val_wsum END AS val_wsum
    FROM documents d
    JOIN sums s ON d.doc_id % {_OM_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("ingest_orc_map_walk", oracle=_om_oracle())
def ingest_orc_map_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC MAP columns decoded natively — in ORC's type tree a map is
    LIST-of-(key,value): the map column carries PRESENT + an RLEv2
    LENGTH run (entry counts for present rows; zero = empty map), and
    the key/value CHILDREN are ordinary columns over the concatenated
    entries — keys through the string machinery (the tiny 'k0'..'k8'
    alphabet engages DICTIONARY_V2), values with their own PRESENT
    weave for per-entry nulls. pyarrow's ORC C++ writer is the
    independent runtime writer across all five compression kinds; the
    DuckDB oracle replays the closed-form map lattice and never sees
    an ORC byte; position-weighted key/value sums pin row AND entry
    order. Typed verdicts: postscript cut ('corrupt'), footer rows+1
    ('mismatch'), the map VALUE child retyped to BINARY
    ('unsupported').

    Scale notes (100 TB): identical stream shape to the LIST walk —
    LENGTH runs are a prefix sum, entries contiguous; map-side
    per-file decode, memoized facts, integers only back to the JVM."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    combo = F.concat_ws(
        ":",
        (F.col("doc_id") % _OM_GROUPS),
        (F.col("doc_id") % 11 == 3).cast("int"),
        (F.col("doc_id") % 17 == 2).cast("int"),
        (F.col("doc_id") % 13 == 5).cast("int"),
    )
    out = d.repartition(32, combo).mapInPandas(
        _om_batches,
        schema=("doc_id long, status string, n_rows long, "
                "n_null_maps long, n_empty_maps long, "
                "n_null_vals long, n_values long, key_wsum long, "
                "val_sum long, val_wsum long"),
    )
    return out.repartition(1).sortWithinPartitions("doc_id")


# -------------------------------- STRUCT compound type (round 15)

_OST_GROUPS = 10


def _ost_n(g: int) -> int:
    return 2400 + 130 * g


def _ost_structs(g: int) -> list[dict | None]:
    """Closed-form struct{a: long?, b: double, s: string?} column:
    NULL structs, NULL fields, a float64-exact double (s/64) and a
    small string alphabet."""
    out: list[dict | None] = []
    for i in range(_ost_n(g)):
        if (i * 7 + g) % 13 == 4:
            out.append(None)
            continue
        a = (None if (i * 3 + g) % 11 == 7
             else ((13 * i + 7 * g) % 20011) - 10000)
        b = (((i * 29 + 31 * g) % 8192) - 4096) / 64.0
        s = (None if (i + g) % 23 == 9
             else f"s{(i * 5 + g) % 97}")
        out.append({"a": a, "b": b, "s": s})
    return out


def build_orc_struct(g: int, codec: str) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    t = pa.table({
        "key": pa.array(range(_ost_n(g)), pa.int64()),
        "st": pa.array(_ost_structs(g), pa.struct(
            [("a", pa.int64()), ("b", pa.float64()),
             ("s", pa.string())])),
    })
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=codec, stripe_size=4096,
        compression_block_size=4096,
    )
    return buf.getvalue()


def _ost_payload(doc_id: int) -> bytes:
    g = doc_id % _OST_GROUPS
    corrupt = doc_id % 11 == 3
    mismatch = doc_id % 17 == 2 and not corrupt
    unsup = doc_id % 13 == 5 and not (corrupt or mismatch)
    data = build_orc_struct(g, _ORC_CODECS[g % len(_ORC_CODECS)])
    if corrupt:
        return data[:-8]
    if not (mismatch or unsup):
        return data
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len : len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd.get(2, [0])[0]
    footer_len = psd[1][0]
    footer_start = len(data) - 1 - ps_len - footer_len
    footer = _pb_fields(_orc_chunks(
        data[footer_start : footer_start + footer_len], kind))
    if mismatch:
        patched = _pb_build(
            [(f, v + 1 if f == 6 else v) for f, v in footer])
    else:
        # retype struct field 'b' (5th Type message: root, key,
        # struct, a, b, s) to BINARY (8) — structs with unsupported
        # field kinds stay a typed boundary
        out, seen = [], 0
        for f, v in footer:
            if f == 4:
                seen += 1
                if seen == 5:
                    tf = _pb_fields(v)
                    v = _pb_build(
                        [(ff, 8 if ff == 1 else vv) for ff, vv in tf])
            out.append((f, v))
        patched = _pb_build(out)
    return _retail(data, patched, kind, ps_fields, footer_start)


_OST_ZERO = (0,) * 8

_OST_FACT_MEMO: dict[tuple, tuple] = {}


def _ost_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache = _OST_FACT_MEMO

    def facts(doc_id: int) -> tuple:
        g = doc_id % _OST_GROUPS
        key = (g, doc_id % 11 == 3, doc_id % 17 == 2, doc_id % 13 == 5)
        if key not in cache:
            try:
                f = walk_orc(_ost_payload(doc_id))
                kcol, sts = f["columns"]
                if any(v != i for i, v in enumerate(kcol)):
                    raise ValueError("orc struct fixture key disorder")
                n_null_st = n_null_a = n_null_s = 0
                a_sum = b_sum = s_wsum = wsum = 0
                for i, st in enumerate(sts):
                    if st is None:
                        n_null_st += 1
                        continue
                    a, b, s = st
                    bs = int(round(b * 64))
                    b_sum += bs
                    if a is None:
                        n_null_a += 1
                    else:
                        a_sum += a
                    if s is None:
                        n_null_s += 1
                    else:
                        s_wsum += (i + 1) * int(s[1:])
                    wsum += (i + 1) * (bs + (0 if a is None else a))
                cache[key] = (
                    "decoded", f["n_rows"], n_null_st, n_null_a,
                    a_sum, b_sum, n_null_s, s_wsum, wsum,
                )
            except NotImplementedError:
                cache[key] = ("unsupported",) + _OST_ZERO
            except ValueError as exc:
                status = ("mismatch"
                          if "row count mismatch" in str(exc)
                          else "corrupt")
                cache[key] = (status,) + _OST_ZERO
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt",) + _OST_ZERO
        return cache[key]

    cols = ["doc_id", "status", "n_rows", "n_null_structs",
            "n_null_a", "a_sum", "b_scaled_sum", "n_null_s",
            "s_suffix_wsum", "wsum"]
    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(x),) + facts(int(x)) for x in pdf["doc_id"]]
        yield pd.DataFrame(out, columns=cols).astype(
            {c: "int64" for c in cols if c != "status"})


def _ost_oracle() -> str:
    bad = ("d.doc_id % 11 = 3 OR d.doc_id % 17 = 2 "
           "OR d.doc_id % 13 = 5")
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_OST_GROUPS} AS g FROM documents
    ),
    rr AS (
      SELECT g, i,
             ((i * 7 + g) % 13 = 4) AS null_st,
             ((i * 3 + g) % 11 = 7) AS null_a,
             ((13 * i + 7 * g) % 20011) - 10000 AS a,
             ((i * 29 + 31 * g) % 8192) - 4096 AS bs,
             ((i + g) % 23 = 9) AS null_s,
             (i * 5 + g) % 97 AS sd
      FROM (SELECT g, unnest(range(0, 2400 + 130 * g)) AS i FROM grp)
    ),
    sums AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN null_st THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_structs,
             CAST(SUM(CASE WHEN NOT null_st AND null_a
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_null_a,
             CAST(SUM(CASE WHEN NOT null_st AND NOT null_a
                      THEN a ELSE 0 END) AS BIGINT) AS a_sum,
             CAST(SUM(CASE WHEN NOT null_st THEN bs ELSE 0 END)
               AS BIGINT) AS b_scaled_sum,
             CAST(SUM(CASE WHEN NOT null_st AND null_s
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_null_s,
             CAST(SUM(CASE WHEN NOT null_st AND NOT null_s
                      THEN (i + 1) * sd ELSE 0 END) AS BIGINT)
               AS s_suffix_wsum,
             CAST(SUM(CASE WHEN NOT null_st
                      THEN (i + 1) * (bs + CASE WHEN null_a
                           THEN 0 ELSE a END)
                      ELSE 0 END) AS BIGINT) AS wsum
      FROM rr GROUP BY g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 3 THEN 'corrupt'
                WHEN d.doc_id % 17 = 2 THEN 'mismatch'
                WHEN d.doc_id % 13 = 5 THEN 'unsupported'
                ELSE 'decoded' END AS status,
           CASE WHEN {bad} THEN 0 ELSE s.n_rows END AS n_rows,
           CASE WHEN {bad} THEN 0 ELSE s.n_null_structs END
             AS n_null_structs,
           CASE WHEN {bad} THEN 0 ELSE s.n_null_a END AS n_null_a,
           CASE WHEN {bad} THEN 0 ELSE s.a_sum END AS a_sum,
           CASE WHEN {bad} THEN 0 ELSE s.b_scaled_sum END
             AS b_scaled_sum,
           CASE WHEN {bad} THEN 0 ELSE s.n_null_s END AS n_null_s,
           CASE WHEN {bad} THEN 0 ELSE s.s_suffix_wsum END
             AS s_suffix_wsum,
           CASE WHEN {bad} THEN 0 ELSE s.wsum END AS wsum
    FROM documents d
    JOIN sums s ON d.doc_id % {_OST_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("ingest_orc_struct_walk", oracle=_ost_oracle())
def ingest_orc_struct_walk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC STRUCT columns decoded natively: the struct column itself
    carries only a PRESENT weave (null structs), and each FIELD is an
    ordinary child column recording one value per struct-present row
    — long with its own null weave, raw-IEEE double, and string
    through the shared DIRECT_V2/DICTIONARY_V2 machinery. pyarrow's
    ORC C++ writer is the independent runtime writer across all five
    compression kinds; the DuckDB oracle replays the closed-form
    field lattice; row-weighted field sums pin both the PRESENT weave
    and field alignment (a misweave shifts every downstream row).
    Typed verdicts: postscript cut ('corrupt'), footer rows+1
    ('mismatch'), one field retyped to BINARY ('unsupported').

    Scale notes (100 TB): struct fields are plain columns — the walk
    keeps ORC's columnar independence (each field prunable on its
    own); map-side per-file decode, memoized facts, integers only
    back to the JVM."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    combo = F.concat_ws(
        ":",
        (F.col("doc_id") % _OST_GROUPS),
        (F.col("doc_id") % 11 == 3).cast("int"),
        (F.col("doc_id") % 17 == 2).cast("int"),
        (F.col("doc_id") % 13 == 5).cast("int"),
    )
    out = d.repartition(32, combo).mapInPandas(
        _ost_batches,
        schema=("doc_id long, status string, n_rows long, "
                "n_null_structs long, n_null_a long, a_sum long, "
                "b_scaled_sum long, n_null_s long, "
                "s_suffix_wsum long, wsum long"),
    )
    return out.repartition(1).sortWithinPartitions("doc_id")


# ----------------------------------- UNION compound type (round 15)

_OU_GROUPS = 10


def _ou_n(g: int) -> int:
    return 2200 + 120 * g


def _ou_rows(g: int) -> list[tuple[int, object]]:
    """Closed-form tagged union rows: variant 0 is a nullable long,
    variant 1 a nullable small-alphabet string; the tag mix is
    unbalanced (2:1) so both dense-offset paths carry real load."""
    out: list[tuple[int, object]] = []
    for i in range(_ou_n(g)):
        if (i * 5 + g) % 3 == 1:
            v = (None if (i + 2 * g) % 13 == 5
                 else f"u{(i * 3 + g) % 53}")
            out.append((1, v))
        else:
            v = (None if (i + g) % 11 == 7
                 else ((17 * i + 3 * g) % 9973) - 4986)
            out.append((0, v))
    return out


def build_orc_union(g: int, codec: str) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    tags, offs, c0, c1 = [], [], [], []
    for tg, v in _ou_rows(g):
        tags.append(tg)
        if tg == 0:
            offs.append(len(c0))
            c0.append(v)
        else:
            offs.append(len(c1))
            c1.append(v)
    arr = pa.UnionArray.from_dense(
        pa.array(tags, pa.int8()), pa.array(offs, pa.int32()),
        [pa.array(c0, pa.int64()), pa.array(c1, pa.string())])
    t = pa.table({
        "key": pa.array(range(_ou_n(g)), pa.int64()),
        "u": arr,
    })
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=codec, stripe_size=4096,
        compression_block_size=4096,
    )
    return buf.getvalue()


def _ou_payload(doc_id: int) -> bytes:
    g = doc_id % _OU_GROUPS
    corrupt = doc_id % 11 == 3
    mismatch = doc_id % 17 == 2 and not corrupt
    unsup = doc_id % 13 == 5 and not (corrupt or mismatch)
    data = build_orc_union(g, _ORC_CODECS[g % len(_ORC_CODECS)])
    if corrupt:
        return data[:-8]
    if not (mismatch or unsup):
        return data
    ps_len = data[-1]
    ps_fields = _pb_fields(data[len(data) - 1 - ps_len : len(data) - 1])
    psd = _grouped(ps_fields)
    kind = psd.get(2, [0])[0]
    footer_len = psd[1][0]
    footer_start = len(data) - 1 - ps_len - footer_len
    footer = _pb_fields(_orc_chunks(
        data[footer_start : footer_start + footer_len], kind))
    if mismatch:
        patched = _pb_build(
            [(f, v + 1 if f == 6 else v) for f, v in footer])
    else:
        # retype the union's LONG variant (4th Type message: root,
        # key, union, long-variant, string-variant) to BINARY (8) —
        # unions with unsupported variant kinds stay a typed boundary
        out, seen = [], 0
        for f, v in footer:
            if f == 4:
                seen += 1
                if seen == 4:
                    tf = _pb_fields(v)
                    v = _pb_build(
                        [(ff, 8 if ff == 1 else vv) for ff, vv in tf])
            out.append((f, v))
        patched = _pb_build(out)
    return _retail(data, patched, kind, ps_fields, footer_start)


_OU_ZERO = (0,) * 8

_OU_FACT_MEMO: dict[tuple, tuple] = {}


def _ou_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache = _OU_FACT_MEMO

    def facts(doc_id: int) -> tuple:
        g = doc_id % _OU_GROUPS
        key = (g, doc_id % 11 == 3, doc_id % 17 == 2, doc_id % 13 == 5)
        if key not in cache:
            try:
                f = walk_orc(_ou_payload(doc_id))
                kcol, us = f["columns"]
                if any(v != i for i, v in enumerate(kcol)):
                    raise ValueError("orc union fixture key disorder")
                n_v0 = n_v0_null = n_v1 = n_v1_null = 0
                v0_sum = v0_wsum = s_wsum = 0
                for i, (tg, v) in enumerate(us):
                    if tg == 0:
                        n_v0 += 1
                        if v is None:
                            n_v0_null += 1
                        else:
                            v0_sum += v
                            v0_wsum += (i + 1) * v
                    else:
                        n_v1 += 1
                        if v is None:
                            n_v1_null += 1
                        else:
                            s_wsum += (i + 1) * int(v[1:])
                cache[key] = (
                    "decoded", f["n_rows"], n_v0, n_v0_null, v0_sum,
                    v0_wsum, n_v1, n_v1_null, s_wsum,
                )
            except NotImplementedError:
                cache[key] = ("unsupported",) + _OU_ZERO
            except ValueError as exc:
                status = ("mismatch"
                          if "row count mismatch" in str(exc)
                          else "corrupt")
                cache[key] = (status,) + _OU_ZERO
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt",) + _OU_ZERO
        return cache[key]

    cols = ["doc_id", "status", "n_rows", "n_v0", "n_v0_null",
            "v0_sum", "v0_wsum", "n_v1", "n_v1_null", "s_wsum"]
    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(x),) + facts(int(x)) for x in pdf["doc_id"]]
        yield pd.DataFrame(out, columns=cols).astype(
            {c: "int64" for c in cols if c != "status"})


def _ou_oracle() -> str:
    bad = ("d.doc_id % 11 = 3 OR d.doc_id % 17 = 2 "
           "OR d.doc_id % 13 = 5")
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_OU_GROUPS} AS g FROM documents
    ),
    rr AS (
      SELECT g, i,
             ((i * 5 + g) % 3 = 1) AS is_s,
             ((i + g) % 11 = 7) AS v0_null,
             ((17 * i + 3 * g) % 9973) - 4986 AS v0,
             ((i + 2 * g) % 13 = 5) AS v1_null,
             (i * 3 + g) % 53 AS sd
      FROM (SELECT g, unnest(range(0, 2200 + 120 * g)) AS i FROM grp)
    ),
    sums AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN NOT is_s THEN 1 ELSE 0 END) AS BIGINT)
               AS n_v0,
             CAST(SUM(CASE WHEN NOT is_s AND v0_null
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_v0_null,
             CAST(SUM(CASE WHEN NOT is_s AND NOT v0_null
                      THEN v0 ELSE 0 END) AS BIGINT) AS v0_sum,
             CAST(SUM(CASE WHEN NOT is_s AND NOT v0_null
                      THEN (i + 1) * v0 ELSE 0 END) AS BIGINT)
               AS v0_wsum,
             CAST(SUM(CASE WHEN is_s THEN 1 ELSE 0 END) AS BIGINT)
               AS n_v1,
             CAST(SUM(CASE WHEN is_s AND v1_null
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_v1_null,
             CAST(SUM(CASE WHEN is_s AND NOT v1_null
                      THEN (i + 1) * sd ELSE 0 END) AS BIGINT)
               AS s_wsum
      FROM rr GROUP BY g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 3 THEN 'corrupt'
                WHEN d.doc_id % 17 = 2 THEN 'mismatch'
                WHEN d.doc_id % 13 = 5 THEN 'unsupported'
                ELSE 'decoded' END AS status,
           CASE WHEN {bad} THEN 0 ELSE s.n_rows END AS n_rows,
           CASE WHEN {bad} THEN 0 ELSE s.n_v0 END AS n_v0,
           CASE WHEN {bad} THEN 0 ELSE s.n_v0_null END AS n_v0_null,
           CASE WHEN {bad} THEN 0 ELSE s.v0_sum END AS v0_sum,
           CASE WHEN {bad} THEN 0 ELSE s.v0_wsum END AS v0_wsum,
           CASE WHEN {bad} THEN 0 ELSE s.n_v1 END AS n_v1,
           CASE WHEN {bad} THEN 0 ELSE s.n_v1_null END AS n_v1_null,
           CASE WHEN {bad} THEN 0 ELSE s.s_wsum END AS s_wsum
    FROM documents d
    JOIN sums s ON d.doc_id % {_OU_GROUPS} = s.g
    ORDER BY d.doc_id
    """


@register("ingest_orc_union_walk", oracle=_ou_oracle())
def ingest_orc_union_walk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC UNION columns decoded natively — the LAST compound kind:
    the union column carries PRESENT plus a byte-RLE TAG stream in
    DATA, and each variant is an ordinary child column recording its
    tagged rows in row order (long with null weave; string through
    the shared DIRECT_V2/DICTIONARY_V2 machinery). pyarrow's ORC C++
    writer emits dense unions as the independent runtime writer
    across all five compression kinds; the DuckDB oracle replays the
    closed-form tagged lattice; row-weighted per-variant sums pin
    the tag weave (a one-row shift scrambles every downstream
    value). Typed verdicts: postscript cut ('corrupt'), footer
    rows+1 ('mismatch'), the long variant retyped to BINARY
    ('unsupported').

    Scale notes (100 TB): the tag stream is a byte run — variant
    demux is map-side and each variant column stays independently
    prunable; per-file decode, memoized facts, integers only back
    to the JVM."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    combo = F.concat_ws(
        ":",
        (F.col("doc_id") % _OU_GROUPS),
        (F.col("doc_id") % 11 == 3).cast("int"),
        (F.col("doc_id") % 17 == 2).cast("int"),
        (F.col("doc_id") % 13 == 5).cast("int"),
    )
    out = d.repartition(32, combo).mapInPandas(
        _ou_batches,
        schema=("doc_id long, status string, n_rows long, n_v0 long, "
                "n_v0_null long, v0_sum long, v0_wsum long, "
                "n_v1 long, n_v1_null long, s_wsum long"),
    )
    return out.repartition(1).sortWithinPartitions("doc_id")
