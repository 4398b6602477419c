#!/usr/bin/env python3
"""Dev-only: pin the wholePackOracleCtes rebuild against a reference
greedy fold on planted rows, including the zero-token edges (boundary
zero doc, mid-window zero doc, > budget consecutive zero docs) the r19
ADVICE flagged. Mirrors TextOps.wholePackOracleCtes verbatim with the
tSql slot fed from VALUES."""
import duckdb, sys

BUDGET = 512
BLOCK = 4096

rows = [
    ("a", 10, 100), ("a", 20, 480), ("a", 30, 512), ("a", 40, 600),
    ("a", 41, 5), ("a", 4095, 5), ("a", 4096, 100),
    ("a", 4100, 1024), ("a", 4101, 1),
    ("b", 15, 1500), ("b", 16, 513), ("b", 17, 5), ("b", 5000, 512),
    ("z", 0, 512), ("z", 1, 0), ("z", 4096, 10),
    ("z", 8192, 10), ("z", 8193, 0), ("z", 8194, 20),
    # > budget consecutive zero-token docs (the band-join truncation
    # hazard): 600 zeros between two real docs in one block
    ("q", 0, 100), *[("q", 1 + i, 0) for i in range(600)], ("q", 601, 50),
]


def reference(rows, budget=BUDGET):
    out = {}
    byblk = {}
    for s, d, n in rows:
        byblk.setdefault((s, d // BLOCK), []).append((d, n))
    nwin = {}
    for (s, blk), ds in sorted(byblk.items()):
        poff = 0
        last_off, last_n = 0, 0
        for d, n in sorted(ds):
            fill = poff % budget
            if fill != 0 and fill + n > budget:
                poff += budget - fill
            out[(s, d)] = [n, poff, blk]
            last_off, last_n = poff, n
            poff += n
            if n > budget and poff % budget != 0:
                poff += budget - poff % budget
        nwin[(s, blk)] = (last_off + max(last_n, 1) + budget - 1) // budget
    woff = {}
    for s in sorted({k[0] for k in nwin}):
        acc = 0
        for k in sorted(k for k in nwin if k[0] == s):
            woff[k] = acc
            acc += nwin[k]
    res = []
    for (s, d), (n, poff, blk) in out.items():
        res.append((s, d, n, woff[(s, blk)] + poff // budget,
                    poff % budget, n > budget))
    return sorted(res)


def oracle_ctes(t_sql, budget=BUDGET):
    # keep in lockstep with TextOps.wholePackOracleCtes
    return f"""wpt AS ({t_sql}
), wptr AS (
  SELECT source, blk, doc_id, n,
    ROW_NUMBER() OVER (PARTITION BY source, blk ORDER BY doc_id) AS rn,
    SUM(n) OVER (PARTITION BY source, blk ORDER BY doc_id
      ROWS UNBOUNDED PRECEDING) AS s
  FROM wpt
), wpzc AS (
  SELECT source, blk, COUNT(*) FILTER (WHERE n = 0) AS zc
  FROM wpt GROUP BY 1, 2
), wpnxt AS (
  SELECT r.source, r.blk, r.rn,
    GREATEST(COALESCE(MAX(j.rn), r.rn), r.rn) AS je,
    CASE WHEN MAX(j.rn) IS NULL THEN r.s ELSE MAX(j.s) END AS je_s
  FROM wptr r
  JOIN wpzc z ON z.source = r.source AND z.blk = r.blk
  LEFT JOIN wptr j
    ON j.source = r.source AND j.blk = r.blk
   AND j.rn >= r.rn AND j.rn <= r.rn + {budget} + z.zc
   AND j.s <= r.s - r.n + {budget}
  GROUP BY r.source, r.blk, r.rn, r.s, r.n
), wpg AS (
  SELECT source, blk, CAST(1 AS BIGINT) AS r,
    CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS w0
  FROM (SELECT DISTINCT source, blk FROM wptr)
  UNION ALL
  SELECT g.source, g.blk, n.je + 1, n.je_s,
    g.w0 + (n.je_s - g.s0 + {budget - 1}) // {budget}
  FROM wpg g JOIN wpnxt n ON n.source = g.source AND n.blk = g.blk AND n.rn = g.r
), wpgrp AS (
  SELECT g.source, g.blk, g.r, n.je, n.je_s, g.s0, g.w0
  FROM wpg g JOIN wpnxt n ON n.source = g.source AND n.blk = g.blk AND n.rn = g.r
), wpd0 AS (
  SELECT d.source, d.blk, d.doc_id, d.n,
    wpgrp.w0 + (d.s - d.n - wpgrp.s0) // {budget} AS lseq,
    (d.s - d.n - wpgrp.s0) % {budget} AS off_in_seq,
    wpgrp.w0 + (d.s - d.n - wpgrp.s0 + GREATEST(d.n, 1) - 1) // {budget} AS lw_end
  FROM wptr d
  JOIN wpgrp ON wpgrp.source = d.source AND wpgrp.blk = d.blk
          AND d.rn >= wpgrp.r AND d.rn <= wpgrp.je
), wpbw AS (
  SELECT source, blk, MAX(lw_end) + 1 AS nwin FROM wpd0 GROUP BY 1, 2
), wpbwo AS (
  SELECT source, blk,
    COALESCE(SUM(nwin) OVER (PARTITION BY source ORDER BY blk
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS w_off
  FROM wpbw
), wppd AS (
  SELECT d0.source, d0.doc_id, d0.n AS n_tokens,
    CAST(wpbwo.w_off + d0.lseq AS BIGINT) AS seq_id,
    CAST(d0.off_in_seq AS BIGINT) AS offset_in_seq,
    d0.n > {budget} AS is_split
  FROM wpd0 d0
  JOIN wpbwo ON wpbwo.source = d0.source AND wpbwo.blk = d0.blk
)"""


def main():
    vals = ", ".join(f"('{s}', {d}, {n})" for s, d, n in rows)
    t_sql = (f"SELECT source, doc_id, CAST(n AS BIGINT) AS n, "
             f"doc_id // {BLOCK} AS blk FROM (VALUES {vals}) "
             f"v(source, doc_id, n)")
    q = ("WITH RECURSIVE " + oracle_ctes(t_sql) +
         "\nSELECT source, doc_id, n_tokens, seq_id, offset_in_seq, is_split"
         "\nFROM wppd ORDER BY source, doc_id")
    got = [tuple(r) for r in duckdb.sql(q).fetchall()]
    got = sorted((s, d, n, sq, o, bool(sp)) for s, d, n, sq, o, sp in got)
    want = reference(rows)
    if got != want:
        for g, w in zip(got, want):
            if g != w:
                print(f"MISMATCH: oracle={g} reference={w}")
        print(f"counts: oracle={len(got)} reference={len(want)}")
        sys.exit(1)
    print(f"OK: {len(got)} rows, oracle == reference fold "
          f"(incl. boundary-zero, mid-window-zero, 600-zero-run)")


if __name__ == "__main__":
    main()
