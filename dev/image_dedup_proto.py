#!/usr/bin/env python3
"""Prototype of the mm_image_dedup oracle: dHash-48 over decoded PPM
pixels, 4x12-bit banded Hamming <= 3. Usage:
python3 dev/image_dedup_proto.py /root/testdata/sf0.01"""
import sys
import duckdb

DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# luminance of sampled grid pixel p (0-based) over pixel string px
LUM = ("(ord(substr(px, 3*({p}) + 1, 1)) + ord(substr(px, 3*({p}) + 2, 1))"
       " + ord(substr(px, 3*({p}) + 3, 1)))")
P0 = "((((b // 6) * h) // 8) * w + (((b % 6) * w) // 7))"
P1 = "((((b // 6) * h) // 8) * w + ((((b % 6) + 1) * w) // 7))"

SQL = f"""
WITH geom AS (
  SELECT doc_id, n_chars, n_chars % 8 + 4 AS w, n_chars % 6 + 3 AS h, text
  FROM documents WHERE n_chars > 0
), px0 AS (
  SELECT doc_id, w, h,
    substr(repeat(text, (3*w*h) // n_chars + 1), 1, 3*w*h) AS px
  FROM geom
), imgs AS (
  SELECT doc_id, w, h, px FROM px0
  UNION ALL
  SELECT doc_id + 1000000, w, h,
    chr((ord(substr(px, 1, 1)) + 7) % 128) || substr(px, 2) AS px
  FROM px0 WHERE doc_id % 10 = 0
), hs AS (
  SELECT doc_id,
    list_sum(list_transform(range(0, 48), b ->
      CASE WHEN {LUM.format(p=P1)} > {LUM.format(p=P0)}
           THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS dh
  FROM imgs
), bands AS (
  SELECT doc_id, dh, i AS band, (dh >> (12*i)) & 4095 AS bv
  FROM hs, range(0, 4) r(i)
), cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.dh AS dh1, b.dh AS dh2
  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT d1, d2, CAST(bit_count(xor(dh1, dh2)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(dh1, dh2)) <= 3
ORDER BY d1, d2
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DIR}/documents.parquet'")
df = con.execute(SQL).df()
print("pairs:", len(df), " hamming dist:", dict(df.hamming.value_counts()))
print("planted twin pairs (d2 = d1 + 1e6):", ((df.d2 - df.d1) == 1000000).sum())
print(df.head(8).to_string())
# band bucket sizes (scale check)
b = con.execute(f"""
WITH geom AS (SELECT doc_id, n_chars, n_chars % 8 + 4 AS w, n_chars % 6 + 3 AS h, text
  FROM documents WHERE n_chars > 0),
px0 AS (SELECT doc_id, w, h, substr(repeat(text, (3*w*h) // n_chars + 1), 1, 3*w*h) AS px FROM geom),
imgs AS (SELECT doc_id, w, h, px FROM px0 UNION ALL
  SELECT doc_id + 1000000, w, h, chr((ord(substr(px,1,1)) + 7) % 128) || substr(px, 2) FROM px0 WHERE doc_id % 10 = 0),
hs AS (SELECT doc_id, list_sum(list_transform(range(0, 48), b ->
      CASE WHEN {LUM.format(p=P1)} > {LUM.format(p=P0)} THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS dh FROM imgs),
bands AS (SELECT doc_id, dh, i AS band, (dh >> (12*i)) & 4095 AS bv FROM hs, range(0,4) r(i))
SELECT band, bv, COUNT(*) c FROM bands GROUP BY 1,2 ORDER BY c DESC LIMIT 5""").fetchall()
print("top band buckets:", b)
