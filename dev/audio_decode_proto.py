#!/usr/bin/env python3
"""Prototype of the mm_audio_decode oracle: synthesize canonical
44-byte PCM8 WAV payloads from doc text, roundtrip through a BLOB,
parse the header + per-channel stats from hex-byte arithmetic."""
import sys
import duckdb
import struct

DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def le_hex(expr, nbytes):
    """SQL: little-endian hex of integer expr over nbytes bytes."""
    parts = [f"lpad(hex((({expr}) // {256 ** k}) % 256), 2, '0')" for k in range(nbytes)]
    return " || ".join(parts)


# per-doc: channels = 1 + doc_id % 2, frames = n_chars, rate 8000
ENC = f"""
WITH g AS (
  SELECT doc_id, n_chars, CAST(1 + doc_id % 2 AS INTEGER) AS ch, n_chars AS frames, text
  FROM documents WHERE n_chars > 0
), e AS (
  SELECT doc_id, ch, frames,
    '52494646' || {le_hex('36 + frames * ch', 4)} || '57415645'
    || '666D7420' || {le_hex('16', 4)} || {le_hex('1', 2)} || {le_hex('ch', 2)}
    || {le_hex('8000', 4)} || {le_hex('8000 * ch', 4)} || {le_hex('ch', 2)} || {le_hex('8', 2)}
    || '64617461' || {le_hex('frames * ch', 4)}
    || hex(encode(substr(repeat(text, (frames * ch) // n_chars + 1), 1, frames * ch))) AS hx
  FROM g
), blobbed AS (
  SELECT doc_id, hex(from_hex(hx)) AS hx FROM e
)
"""

BYTE = "CAST(('0x' || substr(hx, 2*({p}) - 1, 2)) AS INTEGER)"


def b(p):
    return BYTE.format(p=p)


DEC = ENC + f"""
, parsed AS (
  SELECT doc_id, hx,
    (substr(hx, 1, 8) = '52494646') AS riff_ok,
    (substr(hx, 17, 8) = '57415645') AS wave_ok,
    ({b(21)} + 256 * {b(22)}) AS audio_format,
    ({b(23)} + 256 * {b(24)}) AS n_channels,
    ({b(25)} + 256 * {b(26)} + 65536 * {b(27)} + 16777216 * {b(28)}) AS sample_rate,
    ({b(35)} + 256 * {b(36)}) AS bits,
    ({b(41)} + 256 * {b(42)} + 65536 * {b(43)} + 16777216 * {b(44)}) AS data_size
  FROM blobbed
), stats AS (
  SELECT doc_id, riff_ok, wave_ok, (audio_format = 1) AS fmt_pcm_ok,
    n_channels, sample_rate, bits,
    CAST(data_size AS BIGINT) AS data_size,
    CAST(data_size // n_channels AS BIGINT) AS n_frames,
    (length(hx) = 2 * (44 + data_size)) AS payload_complete,
    CAST(list_max(list_transform(range(0, data_size // n_channels),
      i -> {BYTE.format(p='45 + i * n_channels')})) AS INTEGER) AS peak_l,
    ROUND(sqrt(list_sum(list_transform(range(0, data_size // n_channels),
      i -> CAST({BYTE.format(p='45 + i * n_channels')} AS DOUBLE) ** 2))
      / (data_size // n_channels)), 6) AS rms_l,
    CASE WHEN n_channels = 2 THEN CAST(list_max(list_transform(range(0, data_size // 2),
      i -> {BYTE.format(p='46 + i * 2')})) AS INTEGER) END AS peak_r,
    CASE WHEN n_channels = 2 THEN ROUND(sqrt(list_sum(list_transform(range(0, data_size // 2),
      i -> CAST({BYTE.format(p='46 + i * 2')} AS DOUBLE) ** 2))
      / (data_size // 2)), 6) END AS rms_r
  FROM parsed
)
SELECT doc_id, riff_ok, wave_ok, fmt_pcm_ok, n_channels, sample_rate, bits,
  data_size, n_frames, payload_complete,
  ROUND(CAST(n_frames AS DOUBLE) * 1000 / sample_rate, 6) AS duration_ms,
  peak_l, rms_l, peak_r, rms_r
FROM stats ORDER BY doc_id
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DIR}/documents.parquet'")
df = con.execute(DEC).df()
print("rows:", len(df))
print(df.head(6).to_string())
assert df.riff_ok.all() and df.wave_ok.all() and df.fmt_pcm_ok.all()
assert df.payload_complete.all()
assert (df.bits == 8).all() and (df.sample_rate == 8000).all()

# cross-check one doc against python's struct/wave maths
row = con.execute(ENC + "SELECT doc_id, ch, frames, hx FROM blobbed JOIN g USING (doc_id) LIMIT 1").fetchone()
doc_id, ch, frames, hx = row
raw = bytes.fromhex(hx)
assert raw[:4] == b'RIFF' and raw[8:12] == b'WAVE'
(n_ch,) = struct.unpack('<H', raw[22:24])
(rate,) = struct.unpack('<I', raw[24:28])
(dsz,) = struct.unpack('<I', raw[40:44])
assert n_ch == ch and rate == 8000 and dsz == frames * ch, (n_ch, rate, dsz)
samples_l = raw[44::n_ch][:dsz // n_ch]
import math
rms = math.sqrt(sum(x * x for x in samples_l) / len(samples_l))
got = df[df.doc_id == doc_id].iloc[0]
assert abs(got.rms_l - round(rms, 6)) < 1e-9, (got.rms_l, rms)
assert got.peak_l == max(samples_l)
print("python struct cross-check OK: doc", doc_id, "ch", n_ch, "rms_l", got.rms_l)
