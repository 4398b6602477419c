#!/usr/bin/env python3
"""Prototype of the round-12 composed curation-v2 oracle (full filter
stack: exact -> near -> line/span prefix scrub -> contaminate -> lang ->
quality -> PII -> pack) against DuckDB, before the Scala/SQL twin is
written. Usage: python3 dev/curation_v2_proto.py /root/testdata/sf0.01
"""
import sys
import duckdb

DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

PLANT = (
    "{t}"
    " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 250) || '.0.' || (doc_id % 100) ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' call +1-202-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
)

EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
PHONE = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

BODY = f"""
WITH tok AS (
  SELECT doc_id, source, lang, md5(text) AS fp, string_split(text, ' ') AS w
  FROM documents
), toks AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) - 1 AS pos FROM tok),
words AS (SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS i FROM tok),
nsh0 AS (SELECT doc_id,
         word || ' ' || lead(word, 1) OVER win || ' ' || lead(word, 2) OVER win AS s,
         lead(word, 2) OVER win AS w2
        FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
nsh AS (SELECT DISTINCT doc_id, s FROM nsh0 WHERE w2 IS NOT NULL),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM nsh GROUP BY 1),
inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
          FROM nsh a JOIN nsh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
neard AS (SELECT DISTINCT d2 FROM inter
          JOIN sizes x ON d1 = x.doc_id JOIN sizes y ON d2 = y.doc_id
          WHERE CAST(i AS DOUBLE) / ((x.n + y.n) - i) >= 0.5),
g0 AS (SELECT doc_id, word,
         lead(word, 1) OVER win AS w1, lead(word, 2) OVER win AS w2,
         lead(word, 3) OVER win AS w3, lead(word, 4) OVER win AS w4,
         lead(word, 5) OVER win AS w5, lead(word, 6) OVER win AS w6,
         lead(word, 7) OVER win AS w7
       FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
g AS (SELECT DISTINCT doc_id,
        word || ' ' || w1 || ' ' || w2 || ' ' || w3 || ' ' || w4
          || ' ' || w5 || ' ' || w6 || ' ' || w7 AS s8
      FROM g0 WHERE w7 IS NOT NULL),
gbench AS (SELECT DISTINCT s8 FROM g WHERE doc_id % 4 = 3),
contam AS (SELECT t.doc_id
           FROM g t LEFT JOIN gbench b ON t.s8 = b.s8
           WHERE t.doc_id % 4 <> 3 GROUP BY 1
           HAVING CAST(COUNT(b.s8) AS DOUBLE) / COUNT(*) >= 0.5),
keepers AS (SELECT fp, MIN(doc_id) AS keeper FROM tok GROUP BY 1),
seg AS (SELECT doc_id, i // 4 AS seg_id,
               string_agg(word, ' ' ORDER BY i) AS line
        FROM (SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) - 1 AS i FROM tok)
        GROUP BY 1, 2),
lf AS (SELECT DISTINCT md5(line) AS lfp, doc_id FROM seg),
lrk AS (SELECT lfp, doc_id, ROW_NUMBER() OVER (PARTITION BY lfp ORDER BY doc_id) AS k FROM lf),
boilseg AS (SELECT s.doc_id, s.seg_id
            FROM seg s JOIN lrk r ON md5(s.line) = r.lfp AND s.doc_id = r.doc_id
            WHERE r.k >= 3),
ssh AS (SELECT doc_id, t.i, md5(array_to_string(list_slice(w, t.i + 1, t.i + 5), ' ')) AS sfp
       FROM tok, UNNEST(generate_series(0, len(w) - 5)) AS t(i) WHERE len(w) >= 5),
sfd AS (SELECT DISTINCT sfp, doc_id FROM ssh),
srk AS (SELECT sfp, doc_id, ROW_NUMBER() OVER (PARTITION BY sfp ORDER BY doc_id) AS k FROM sfd),
scov AS (SELECT DISTINCT s.doc_id, t.pos
        FROM ssh s JOIN srk r ON s.sfp = r.sfp AND s.doc_id = r.doc_id AND r.k >= 2,
             UNNEST(generate_series(s.i, s.i + 4)) AS t(pos)),
m AS (SELECT t.doc_id, t.pos, t.tok,
        (b.seg_id IS NOT NULL) AS line_rm, (c.pos IS NOT NULL) AS span_rm
      FROM toks t
      LEFT JOIN boilseg b ON t.doc_id = b.doc_id AND t.pos // 4 = b.seg_id
      LEFT JOIN scov c ON t.doc_id = c.doc_id AND t.pos = c.pos),
perdoc AS (SELECT doc_id,
    COUNT(*) AS n_tokens,
    CAST(COUNT(*) FILTER (WHERE line_rm) AS BIGINT) AS n_line_rm,
    CAST(COUNT(*) FILTER (WHERE span_rm) AS BIGINT) AS n_span_rm,
    CAST(COUNT(*) FILTER (WHERE line_rm OR span_rm) AS BIGINT) AS n_removed,
    CAST(COUNT(*) FILTER (WHERE NOT (line_rm OR span_rm)) AS BIGINT) AS n_kept,
    COUNT(*) FILTER (WHERE NOT (line_rm OR span_rm) AND tok IN ('the', 'a')) AS n_stop,
    COUNT(DISTINCT tok) FILTER (WHERE NOT (line_rm OR span_rm)) AS n_distinct,
    COUNT(*) FILTER (WHERE NOT (line_rm OR span_rm) AND tok IN ('the', 'a', 'of')) AS s_en,
    COUNT(*) FILTER (WHERE NOT (line_rm OR span_rm) AND tok IN ('der', 'die', 'das')) AS s_de,
    COUNT(*) FILTER (WHERE NOT (line_rm OR span_rm) AND tok IN ('le', 'la', 'les')) AS s_fr,
    COUNT(*) FILTER (WHERE NOT (line_rm OR span_rm) AND tok IN ('el', 'los', 'las')) AS s_es,
    COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE NOT (line_rm OR span_rm)), '') AS kept_text
  FROM m GROUP BY 1),
sc AS (SELECT p.doc_id, t.source, t.lang, t.fp,
    p.n_tokens, p.n_line_rm, p.n_span_rm, p.n_removed, p.n_kept, p.kept_text,
    CASE WHEN p.n_kept > 0 THEN
      ROUND(((CAST(0.4 AS DOUBLE) * least(CAST(p.n_kept AS DOUBLE) / 50.0, 1.0))
        + (CAST(0.3 AS DOUBLE) * (1.0 - (CAST(p.n_stop AS DOUBLE) / p.n_kept))))
        + (CAST(0.3 AS DOUBLE) * (CAST(p.n_distinct AS DOUBLE) / p.n_kept)), 6) END AS quality_score,
    CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
         WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
         WHEN s_es > 0 THEN 'es'
         ELSE 'und' END AS pred_lang
  FROM perdoc p JOIN tok t USING (doc_id)),
d AS (SELECT sc.*,
    CASE WHEN sc.doc_id <> k.keeper THEN 'exact_dup'
         WHEN sc.doc_id IN (SELECT d2 FROM neard) THEN 'near_dup'
         WHEN 2 * sc.n_kept < sc.n_tokens THEN 'heavy_dup'
         WHEN sc.doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
         WHEN sc.pred_lang <> 'en' THEN 'lang'
         WHEN sc.quality_score < 0.7 THEN 'low_quality'
         END AS drop_reason
  FROM sc JOIN keepers k ON sc.fp = k.fp),
fin AS (SELECT d.*,
    CASE WHEN drop_reason IS NULL THEN {PLANT.format(t="kept_text")} END AS t0
  FROM d),
fin2 AS (SELECT fin.*,
    CASE WHEN drop_reason IS NULL THEN
      regexp_replace(regexp_replace(regexp_replace(t0,
        '{EMAIL}', '<EMAIL>', 'g'),
        '{IPV4}', '<IP>', 'g'),
        '{PHONE}', '<PHONE>', 'g') END AS red
  FROM fin)
"""

DECISIONS = BODY + f"""
SELECT doc_id, source, lang, pred_lang, n_tokens, n_line_rm, n_span_rm, n_removed,
  n_kept AS n_tokens_kept, quality_score, drop_reason,
  CASE WHEN drop_reason IS NULL THEN
    CAST(len(regexp_extract_all(t0, '{EMAIL}'))
       + len(regexp_extract_all(t0, '{IPV4}'))
       + len(regexp_extract_all(t0, '{PHONE}')) AS BIGINT) END AS n_pii,
  CASE WHEN drop_reason IS NULL THEN CAST(len(string_split(red, ' ')) AS BIGINT) END AS final_tokens,
  CASE WHEN drop_reason IS NULL THEN md5(red) END AS final_fp
FROM fin2 ORDER BY doc_id
"""

PACK = BODY + """
, o AS (
  SELECT source, doc_id, CAST(len(string_split(red, ' ')) AS BIGINT) AS n_tokens,
    COALESCE(SUM(len(string_split(red, ' '))) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM fin2 WHERE drop_reason IS NULL
)
SELECT source, CAST(start_off // 512 AS BIGINT) AS seq_id,
  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM o GROUP BY 1, 2 ORDER BY source, seq_id
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DIR}/documents.parquet'")
dec = con.execute(DECISIONS).df()
print("decision mix:")
print(dec["drop_reason"].fillna("RETAINED").value_counts())
print("retained final_tokens sum:", dec["final_tokens"].sum(),
      " n_pii>0 docs:", (dec["n_pii"] > 0).sum())
print(dec.head(8).to_string())
pack = con.execute(PACK).df()
print("pack rows:", len(pack))
print(pack.head(6).to_string())
