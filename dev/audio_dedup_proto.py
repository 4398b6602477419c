#!/usr/bin/env python3
"""Prototype of the mm_audio_dedup oracle: 48-bit frame-energy dHash
over decoded PCM samples, 4x12-bit banded Hamming <= 3."""
import sys
import duckdb

DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def le_hex(expr, nbytes):
    parts = [f"lpad(hex((({expr}) // {256 ** k}) % 256), 2, '0')" for k in range(nbytes)]
    return " || ".join(parts)


# frame k energy over the decoded data string ds (n = len bytes):
# positions [k*n//49, (k+1)*n//49)
E = ("COALESCE(list_sum(list_transform(range((({k})*n)//49, ((({k})+1)*n)//49),"
     " i -> ord(substr(ds, i + 1, 1)))), 0)")

SQL = f"""
WITH g AS (
  SELECT doc_id, n_chars, CAST(1 + doc_id % 2 AS INTEGER) AS ch, n_chars AS frames, text
  FROM documents WHERE n_chars > 0
), e AS (
  SELECT doc_id,
    '52494646' || {le_hex('36 + frames * ch', 4)} || '57415645'
    || '666D7420' || {le_hex('16', 4)} || {le_hex('1', 2)} || {le_hex('ch', 2)}
    || {le_hex('8000', 4)} || {le_hex('8000 * ch', 4)} || {le_hex('ch', 2)} || {le_hex('8', 2)}
    || '64617461' || {le_hex('frames * ch', 4)}
    || hex(encode(substr(repeat(text, (frames * ch) // n_chars + 1), 1, frames * ch))) AS hx
  FROM g
), dsed AS (
  SELECT doc_id,
    CAST(('0x' || substr(hx, 2*41 - 1, 2)) AS INTEGER)
      + 256 * CAST(('0x' || substr(hx, 2*42 - 1, 2)) AS INTEGER)
      + 65536 * CAST(('0x' || substr(hx, 2*43 - 1, 2)) AS INTEGER)
      + 16777216 * CAST(('0x' || substr(hx, 2*44 - 1, 2)) AS INTEGER) AS n,
    decode(from_hex(substr(hx, 89, 2 * (length(hx) // 2 - 44)))) AS ds
  FROM e
), clips AS (
  SELECT doc_id, n, ds FROM dsed
  UNION ALL
  SELECT doc_id + 1000000, n,
    chr((ord(substr(ds, 1, 1)) + 7) % 128) || substr(ds, 2) AS ds
  FROM dsed WHERE doc_id % 10 = 0
), hs AS (
  SELECT doc_id,
    list_sum(list_transform(range(0, 48), k ->
      CASE WHEN {E.format(k='k + 1')} > {E.format(k='k')}
           THEN (1::BIGINT << k) ELSE 0::BIGINT END)) AS ah
  FROM clips
), bands AS (
  SELECT doc_id, ah, i AS band, (ah >> (12*i)) & 4095 AS bv
  FROM hs, range(0, 4) r(i)
), cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.ah AS ah1, b.ah AS ah2
  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT d1, d2, CAST(bit_count(xor(ah1, ah2)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(ah1, ah2)) <= 3
ORDER BY d1, d2
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DIR}/documents.parquet'")
df = con.execute(SQL).df()
print("pairs:", len(df), " hamming dist:", dict(df.hamming.value_counts()))
print("planted twin pairs:", ((df.d2 - df.d1) == 1000000).sum())
print(df.head(5).to_string())
