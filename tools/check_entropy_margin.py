#!/usr/bin/env python3
"""d25 rounding-safety check: no document's raw character entropy may sit
near a round-to-4-decimals boundary, where a 1-ulp libm difference between
the JVM (`Math.log(p)/ln2`) and DuckDB (`log2`) could flip the rounded
value the driver hashes. Same stance as the e4/e8 fixture margin asserts:
the corpus is frozen, so a healthy margin here proves the gate is safe.

Usage: python3 tools/check_entropy_margin.py [sfDir]
"""
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
rows = con.execute("""
WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
  counts AS (SELECT doc_id, c, count(*)::DOUBLE AS n FROM ch GROUP BY 1, 2),
  tot AS (SELECT doc_id, sum(n) AS nn FROM counts GROUP BY 1)
SELECT counts.doc_id, list_sum(list(-(n/nn)*log2(n/nn) ORDER BY c)) AS entropy
FROM counts JOIN tot ON counts.doc_id = tot.doc_id GROUP BY 1
""").fetchall()
worst = (None, 1.0)
for doc_id, ent in rows:
    scaled = ent * 1e4
    # distance (in 1e-4 units) to the nearest .5 rounding boundary
    frac = abs((scaled - int(scaled)) - 0.5)
    if frac < worst[1]:
        worst = (doc_id, frac)
print(f"{len(rows)} docs; worst margin to a round-4 boundary: "
      f"{worst[1]:.3e} (doc {worst[0]}) in 1e-4 units")
assert worst[1] > 1e-6, "entropy too close to a rounding boundary for libm parity"
print("OK")
