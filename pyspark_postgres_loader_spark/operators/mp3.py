"""MP3 (MPEG-1/2/2.5 audio) frame-sync and header decode — the
STRUCTURAL half of the codec, natively from the public ISO/IEC
11172-3 / 13818-3 header layout.

Scope is deliberate and honest: this module implements everything an
ingestion pipeline needs from an MP3 container — frame
synchronization (11-bit syncword), version/layer dispatch, the
bitrate and sample-rate index tables, padding and frame-length
arithmetic (the ``144·bitrate/rate + pad`` family), per-frame VBR
accounting, samples-per-frame / duration math, ID3v2 tag skipping
(syncsafe size), and the Layer III CRC-16 protection check (ANSI
polynomial 0x8005 over header bytes 2-3 + side info, ISO 11172-3
§2.4.3.1) — while AUDIO SAMPLE synthesis (hybrid filterbank, Huffman
spectrum, IMDCT) remains a typed ``NotImplementedError`` in
``real_decode_audio``: that path genuinely needs a real decoder
library, and we do not ship a half-verified one (r8 verdict task 7).

Scale notes (100 TB): the frame walk is a pure per-payload map —
Arrow-batched ``mapInPandas``, ~60 bytes of integer facts per row
re-enter the JVM. For corpus triage (codec census, duration
histograms, bitrate-mode stats, corrupt-file quarantine) the header
walk IS the workload; sample decode only runs on the (much smaller)
selected subset.

Reference: no counterpart (SURVEY.md §2l multimodal extension).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load_table
from ..functions.planctl import presentation_sort as _presentation_sort

# bitrate tables, kbps, index 1..14 (index 0 = free format, 15 = bad)
_BR_V1_L1 = [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]
_BR_V1_L2 = [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]
_BR_V1_L3 = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BR_V2_L1 = [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256]
_BR_V2_L23 = [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]

# sample rates by version: index 0..2 (3 = reserved)
_SR = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
       "2.5": [11025, 12000, 8000]}

_VERSION_BITS = {0b00: "2.5", 0b10: "2", 0b11: "1"}  # 0b01 reserved
_LAYER_BITS = {0b01: 3, 0b10: 2, 0b11: 1}  # 0b00 reserved


def _bitrate_kbps(version: str, layer: int, idx: int) -> int:
    if idx == 0:
        raise NotImplementedError("free-format MP3 bitrate")
    if idx == 15:
        raise ValueError("invalid MP3 bitrate index 15")
    if version == "1":
        table = {1: _BR_V1_L1, 2: _BR_V1_L2, 3: _BR_V1_L3}[layer]
    else:
        table = _BR_V2_L1 if layer == 1 else _BR_V2_L23
    return table[idx - 1]


def _samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576  # Layer III halves for MPEG2/2.5


def _frame_length(version: str, layer: int, br_kbps: int, sr: int,
                  pad: int) -> int:
    """ISO frame-length arithmetic, integer floor division (the spec's
    truncating divide): Layer I counts 4-byte slots; Layer III halves
    its coefficient for the low-sampling-frequency versions."""
    br = br_kbps * 1000
    if layer == 1:
        return (12 * br // sr + pad) * 4
    coef = 144 if (layer == 2 or version == "1") else 72
    return coef * br // sr + pad


def _sideinfo_len(version: str, mono: bool) -> int:
    """Layer III side-info byte count (what the CRC covers besides
    header bytes 2-3)."""
    if version == "1":
        return 17 if mono else 32
    return 9 if mono else 17


def crc16_mp3(data: bytes) -> int:
    """CRC-16 with the ANSI polynomial 0x8005 (MSB-first), init 0xFFFF
    — the MP3 protection checksum (ISO 11172-3 §2.4.3.1)."""
    crc = 0xFFFF
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


def _skip_id3v2(payload: bytes) -> int:
    """Return the offset past a leading ID3v2 tag (header 'ID3' + 2
    version bytes + flags + 4-byte SYNCSAFE size), or 0 if absent."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            raise ValueError("ID3v2 size bytes must be syncsafe")
        size = (size << 7) | b
    return 10 + size


def decode_mp3_frames(payload: bytes):
    """Walk every MP3 frame: sync, parse, length-check, CRC-verify
    (Layer III). Returns ``(version, layer, sample_rate, frames)``
    with frames a list of dicts carrying per-frame bitrate_kbps,
    frame length, padding, crc flag. Raises ``ValueError`` for
    malformed streams (bad sync, reserved fields, truncation, CRC
    mismatch surfaces as ValueError('MP3 CRC mismatch')) and
    ``NotImplementedError`` for free-format bitrate — the typed
    quarantine contract every codec here follows."""
    pos = _skip_id3v2(payload)
    if pos >= len(payload):
        raise ValueError("MP3 stream has no frames after ID3 tag")
    version = layer = sr = None
    frames: list[dict] = []
    while pos < len(payload):
        if pos + 4 > len(payload):
            raise ValueError("truncated MP3 frame header")
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 frame sync at {pos}")
        vbits, lbits = (b1 >> 3) & 0x3, (b1 >> 1) & 0x3
        if vbits not in _VERSION_BITS:
            raise ValueError("reserved MPEG version bits")
        if lbits not in _LAYER_BITS:
            raise ValueError("reserved MPEG layer bits")
        v, lay = _VERSION_BITS[vbits], _LAYER_BITS[lbits]
        if version is None:
            version, layer = v, lay
        elif (v, lay) != (version, layer):
            raise ValueError("MP3 version/layer changed mid-stream")
        has_crc = (b1 & 0x1) == 0  # protection bit 0 → CRC present
        br_idx, sr_idx, pad = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
        if sr_idx == 3:
            raise ValueError("reserved MP3 sample-rate index")
        this_sr = _SR[v][sr_idx]
        if sr is None:
            sr = this_sr
        elif this_sr != sr:
            raise ValueError("MP3 sample rate changed mid-stream")
        br = _bitrate_kbps(v, lay, br_idx)  # may raise typed errors
        flen = _frame_length(v, lay, br, sr, pad)
        if pos + flen > len(payload):
            raise ValueError("truncated MP3 frame body")
        if has_crc:
            mono = ((b3 >> 6) & 0x3) == 0b11  # channel mode 3 = mono
            if lay == 3:
                si = _sideinfo_len(v, mono)
                if 6 + si > flen:
                    raise ValueError("MP3 frame too short for side info")
                stored = (payload[pos + 4] << 8) | payload[pos + 5]
                calc = crc16_mp3(
                    payload[pos + 2 : pos + 4]
                    + payload[pos + 6 : pos + 6 + si]
                )
                if stored != calc:
                    raise ValueError("MP3 CRC mismatch")
        frames.append(
            {"bitrate_kbps": br, "length": flen, "padding": pad,
             "crc": has_crc}
        )
        pos += flen
    if not frames:
        raise ValueError("MP3 stream has no frames")
    return version, layer, sr, frames


# ------------------------------------------------------------- encoder

def build_mp3(
    version: str,
    layer: int,
    sr_idx: int,
    frame_brs: list[int],  # per-frame bitrate INDEX (VBR)
    pads: list[int],
    with_crc: bool = False,
    mono: bool = True,
    fill=lambda f, i: (7 * i + 11 * f) % 251,
    id3_extra: int | None = None,
) -> bytes:
    """Assemble a spec-shaped MP3 stream: real headers, correct frame
    lengths, valid Layer III CRCs over the (filler) side info, and an
    optional leading ID3v2 tag with a syncsafe size."""
    vbits = {"1": 0b11, "2": 0b10, "2.5": 0b00}[version]
    lbits = {1: 0b11, 2: 0b10, 3: 0b01}[layer]
    sr = _SR[version][sr_idx]
    out = bytearray()
    if id3_extra is not None:
        if id3_extra >= 128:
            raise ValueError("keep the fixture ID3 body under one syncsafe byte")
        out += b"ID3" + bytes((4, 0, 0, 0, 0, 0, id3_extra))
        out += bytes((i * 3 + 1) % 251 for i in range(id3_extra))
    for f, (bi, pad) in enumerate(zip(frame_brs, pads)):
        br = _bitrate_kbps(version, layer, bi)
        flen = _frame_length(version, layer, br, sr, pad)
        crc_here = with_crc and layer == 3
        prot = 0 if crc_here else 1
        b1 = 0xE0 | (vbits << 3) | (lbits << 1) | prot
        b2 = (bi << 4) | (sr_idx << 2) | (pad << 1)
        b3 = (0b11 << 6) if mono else 0  # mode: mono / stereo
        hdr = bytes((0xFF, b1, b2, b3))
        plen = flen - 4 - (2 if crc_here else 0)
        body = bytes(fill(f, i) for i in range(plen))
        if crc_here:
            si = _sideinfo_len(version, mono)
            crc = crc16_mp3(hdr[2:4] + body[:si])
            out += hdr + bytes((crc >> 8, crc & 0xFF)) + body
        else:
            out += hdr + body
    return bytes(out)


# ------------------------------------------------- driver-oracled query

_MP3_GROUPS = 12
# group → (version, layer); CRC only on Layer III groups with g%4==1
_MP3_VL = [("1", 3), ("2", 3), ("1", 2), ("1", 1), ("2.5", 3), ("2", 2)]


def _mp3_payload(doc_id: int) -> bytes:
    """Deterministic MP3 fixture: version/layer rotate through the six
    real combinations, sample-rate index g%3, 3..6 frames per doc with
    a VBR bitrate-index pattern 1+((g+f)%14) and alternating padding —
    so the oracle re-derives every frame length from the spec tables.
    ``g%5==2`` prepends an ID3v2 tag (skipped by sync). Quarantine:
    ``doc_id%11==6`` truncates ('corrupt'); ``doc_id%17==4`` patches
    the first bitrate index to 0, free format ('unsupported');
    ``doc_id%19==7`` (CRC groups only) flips a stored CRC bit
    ('crc_error')."""
    g = doc_id % _MP3_GROUPS
    version, layer = _MP3_VL[g % 6]
    n_frames = 3 + g % 4
    with_crc = layer == 3 and g % 4 == 1
    payload = build_mp3(
        version,
        layer,
        sr_idx=g % 3,
        frame_brs=[1 + ((g + f) % 14) for f in range(n_frames)],
        pads=[f % 2 for f in range(n_frames)],
        with_crc=with_crc,
        fill=lambda f, i: (7 * i + 11 * f + g) % 251,
        id3_extra=17 if g % 5 == 2 else None,
    )
    if doc_id % 17 == 4 and doc_id % 11 != 6:
        # free-format: zero the first frame's bitrate index (byte 2 of
        # the first header, past any ID3 tag)
        off = _skip_id3v2(payload) + 2
        payload = payload[:off] + bytes([payload[off] & 0x0F]) + payload[off + 1 :]
    if doc_id % 19 == 7 and with_crc and doc_id % 11 != 6 and doc_id % 17 != 4:
        off = _skip_id3v2(payload) + 4  # first frame's stored CRC hi byte
        payload = payload[:off] + bytes([payload[off] ^ 0x01]) + payload[off + 1 :]
    if doc_id % 11 == 6:
        payload = payload[: len(payload) // 2]
    return payload


def _mp3_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cache: dict[tuple, tuple] = {}

    def facts(doc_id: int) -> tuple:
        g = doc_id % _MP3_GROUPS
        key = (g, doc_id % 11 == 6, doc_id % 17 == 4, doc_id % 19 == 7)
        if key not in cache:
            try:
                version, layer, sr, frames = decode_mp3_frames(
                    _mp3_payload(doc_id)
                )
                spf = _samples_per_frame(version, layer)
                total_samples = spf * len(frames)
                wsum = 0
                for f, fr in enumerate(frames):
                    plen = fr["length"] - 4 - (2 if fr["crc"] else 0)
                    wsum += (f + 1) * sum(
                        (i + 1) * ((7 * i + 11 * f + g) % 251)
                        for i in range(plen)
                    )
                cache[key] = (
                    "decoded", version, layer, sr, len(frames),
                    total_samples, total_samples * 1_000_000 // sr,
                    sum(fr["bitrate_kbps"] for fr in frames),
                    sum(fr["length"] for fr in frames), wsum,
                )
            except NotImplementedError:
                cache[key] = ("unsupported", "", 0, 0, 0, 0, 0, 0, 0, 0)
            except ValueError as exc:
                status = "crc_error" if "CRC" in str(exc) else "corrupt"
                cache[key] = (status, "", 0, 0, 0, 0, 0, 0, 0, 0)
            except Exception:  # noqa: BLE001 — malformed bytes quarantine
                cache[key] = ("corrupt", "", 0, 0, 0, 0, 0, 0, 0, 0)
        return cache[key]

    for pdf in it:
        if pdf.empty:
            continue
        out = [(int(d),) + facts(int(d)) for d in pdf["doc_id"]]
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "status", "version", "layer", "sample_rate",
                "n_frames", "total_samples", "duration_us",
                "bitrate_sum_kbps", "frame_bytes", "payload_wsum",
            ],
        ).astype(
            {
                "doc_id": "int64", "layer": "int32", "sample_rate": "int32",
                "n_frames": "int32", "total_samples": "int64",
                "duration_us": "int64", "bitrate_sum_kbps": "int64",
                "frame_bytes": "int64", "payload_wsum": "int64",
            }
        )


def _mp3_oracle() -> str:
    """Closed-form replay of the frame walk: the spec's bitrate /
    sample-rate tables as list literals, the frame-length arithmetic
    (integer floor, Layer I slot count, Layer III low-rate halving),
    samples-per-frame, floor-division duration, and the filler-byte
    weighted sum over the derived payload lengths — so a wrong frame
    length anywhere shifts ``payload_wsum`` and fails the hash."""

    def lst(v):
        return "[" + ", ".join(str(x) for x in v) + "]"

    # g % 6 → version tag / layer / crc-eligible
    ver = ("CASE g % 6 WHEN 0 THEN '1' WHEN 1 THEN '2' WHEN 2 THEN '1' "
           "WHEN 3 THEN '1' WHEN 4 THEN '2.5' ELSE '2' END")
    lay = ("CASE g % 6 WHEN 0 THEN 3 WHEN 1 THEN 3 WHEN 2 THEN 2 "
           "WHEN 3 THEN 1 WHEN 4 THEN 3 ELSE 2 END")
    return f"""
    WITH grp AS (
      SELECT DISTINCT doc_id % {_MP3_GROUPS} AS g FROM documents
    ),
    meta AS (
      SELECT g, {ver} AS version, {lay} AS layer,
             3 + g % 4 AS n_frames,
             ({lay} = 3 AND g % 4 = 1) AS with_crc,
             CASE {ver}
               WHEN '1' THEN {lst(_SR['1'])}[g % 3 + 1]
               WHEN '2' THEN {lst(_SR['2'])}[g % 3 + 1]
               ELSE {lst(_SR['2.5'])}[g % 3 + 1] END AS sr,
             CASE WHEN {lay} = 1 THEN 384
                  WHEN {lay} = 2 THEN 1152
                  WHEN {ver} = '1' THEN 1152 ELSE 576 END AS spf
      FROM grp
    ),
    frames AS (
      SELECT g, version, layer, sr, spf, n_frames, with_crc,
             unnest(range(0, n_frames)) AS f
      FROM meta
    ),
    fr AS (
      SELECT *,
             CASE WHEN version = '1' AND layer = 1
                    THEN {lst(_BR_V1_L1)}[1 + (g + f) % 14]
                  WHEN version = '1' AND layer = 2
                    THEN {lst(_BR_V1_L2)}[1 + (g + f) % 14]
                  WHEN version = '1' AND layer = 3
                    THEN {lst(_BR_V1_L3)}[1 + (g + f) % 14]
                  WHEN layer = 1
                    THEN {lst(_BR_V2_L1)}[1 + (g + f) % 14]
                  ELSE {lst(_BR_V2_L23)}[1 + (g + f) % 14] END AS br,
             f % 2 AS pad
      FROM frames
    ),
    flen AS (
      SELECT *,
             CASE WHEN layer = 1
                    THEN (12 * br * 1000 // sr + pad) * 4
                  WHEN layer = 2 OR version = '1'
                    THEN 144 * br * 1000 // sr + pad
                  ELSE 72 * br * 1000 // sr + pad END AS length
      FROM fr
    ),
    plen AS (
      SELECT *, length - 4 - CASE WHEN with_crc THEN 2 ELSE 0 END AS payload_len
      FROM flen
    ),
    wsums AS (
      SELECT g, f, (f + 1) * CAST(SUM(
               (i + 1) * ((7 * i + 11 * f + g) % 251)) AS BIGINT) AS w
      FROM (SELECT g, f, unnest(range(0, payload_len)) AS i FROM plen)
      GROUP BY g, f
    ),
    sums AS (
      SELECT p.g,
             ANY_VALUE(p.version) AS version,
             ANY_VALUE(p.layer) AS layer,
             ANY_VALUE(p.sr) AS sr,
             ANY_VALUE(p.n_frames) AS n_frames,
             ANY_VALUE(p.spf) AS spf,
             CAST(SUM(p.br) AS BIGINT) AS bitrate_sum_kbps,
             CAST(SUM(p.length) AS BIGINT) AS frame_bytes
      FROM plen p GROUP BY p.g
    ),
    ws AS (
      SELECT g, CAST(SUM(w) AS BIGINT) AS payload_wsum FROM wsums GROUP BY g
    ),
    facts AS (
      SELECT s.g, s.version, s.layer, s.sr, s.n_frames,
             CAST(s.n_frames * s.spf AS BIGINT) AS total_samples,
             CAST(s.n_frames * s.spf * 1000000 // s.sr AS BIGINT)
               AS duration_us,
             s.bitrate_sum_kbps, s.frame_bytes, w.payload_wsum,
             (s.layer = 3 AND s.g % 4 = 1) AS crc_group
      FROM sums s JOIN ws w ON s.g = w.g
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 11 = 6 THEN 'corrupt'
                WHEN d.doc_id % 17 = 4 THEN 'unsupported'
                WHEN d.doc_id % 19 = 7 AND t.crc_group THEN 'crc_error'
                ELSE 'decoded' END AS status,
           CASE WHEN d.doc_id % 11 = 6 OR d.doc_id % 17 = 4
                  OR (d.doc_id % 19 = 7 AND t.crc_group)
                THEN '' ELSE t.version END AS version,
           CASE WHEN d.doc_id % 11 = 6 OR d.doc_id % 17 = 4
                  OR (d.doc_id % 19 = 7 AND t.crc_group)
                THEN 0 ELSE t.layer END AS layer,
           CASE WHEN d.doc_id % 11 = 6 OR d.doc_id % 17 = 4
                  OR (d.doc_id % 19 = 7 AND t.crc_group)
                THEN 0 ELSE t.sr END AS sample_rate,
           CASE WHEN d.doc_id % 11 = 6 OR d.doc_id % 17 = 4
                  OR (d.doc_id % 19 = 7 AND t.crc_group)
                THEN 0 ELSE t.n_frames END AS n_frames,
           CASE WHEN d.doc_id % 11 = 6 OR d.doc_id % 17 = 4
                  OR (d.doc_id % 19 = 7 AND t.crc_group)
                THEN 0 ELSE t.total_samples END AS total_samples,
           CASE WHEN d.doc_id % 11 = 6 OR d.doc_id % 17 = 4
                  OR (d.doc_id % 19 = 7 AND t.crc_group)
                THEN 0 ELSE t.duration_us END AS duration_us,
           CASE WHEN d.doc_id % 11 = 6 OR d.doc_id % 17 = 4
                  OR (d.doc_id % 19 = 7 AND t.crc_group)
                THEN 0 ELSE t.bitrate_sum_kbps END AS bitrate_sum_kbps,
           CASE WHEN d.doc_id % 11 = 6 OR d.doc_id % 17 = 4
                  OR (d.doc_id % 19 = 7 AND t.crc_group)
                THEN 0 ELSE t.frame_bytes END AS frame_bytes,
           CASE WHEN d.doc_id % 11 = 6 OR d.doc_id % 17 = 4
                  OR (d.doc_id % 19 = 7 AND t.crc_group)
                THEN 0 ELSE t.payload_wsum END AS payload_wsum
    FROM documents d
    JOIN facts t ON d.doc_id % {_MP3_GROUPS} = t.g
    ORDER BY d.doc_id
    """


@register("audio_mp3_frame_walk", oracle=_mp3_oracle())
def audio_mp3_frame_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 frame-sync + header decode under oracle discipline: real
    multi-frame VBR streams (six version/layer combinations, per-frame
    bitrate-table lookups, alternating padding, optional ID3v2 prefix,
    Layer III CRC-16 protection) walked by the native parser; the
    DuckDB oracle re-derives every frame length from the spec's
    bitrate/sample-rate tables, so the position-weighted payload sum
    pins the ``144·br/sr + pad`` arithmetic per frame. Four oracled
    statuses: 'decoded', 'corrupt' (truncation), 'unsupported'
    (free-format bitrate — the typed stub boundary), and 'crc_error'
    (flipped protection word, proving the CRC executes). AUDIO SAMPLE
    synthesis stays a typed NotImplementedError in
    ``real_decode_audio`` — the structural walk is the honest scope.

    Scale notes (100 TB): pure per-payload map, same mapInPandas shape
    as every codec query; the walk reads 4-6 bytes per frame header
    and SKIPS payload bytes (the fixture's wsum reads them only to pin
    the length arithmetic), so corpus-census cost is I/O-bound."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _mp3_batches,
        schema=(
            "doc_id long, status string, version string, layer int, "
            "sample_rate int, n_frames int, total_samples long, "
            "duration_us long, bitrate_sum_kbps long, frame_bytes long, "
            "payload_wsum long"
        ),
    ).transform(_presentation_sort, "doc_id")
