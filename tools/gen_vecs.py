#!/usr/bin/env python3
"""Vectors-only scale fixtures: embeddings.parquet at arbitrary n.

Dev tooling only (like gen_sf1.py) — produces the decade pairs where the
ANN/near-dup tier's DATA term dominates the 4-6 s per-query fixed floor
(round-7 verdict: the sf1cr→sf10cr "1.0×" hier reading was an
overhead-floor artifact at n = 20k→200k; the asymptote needs n in the
millions to bind). Output dirs are gitignored; measured ratios go to
SCALE.md.

Content contract (matches the sf0.1 embeddings schema: vec_id BIGINT,
embedding FLOAT[64], label INT):
 - base vectors are fresh deterministic hash draws in [-1, 1] per
   (vec_id, dim) — near-orthogonal in expectation, like the testdata;
 - every FAMILY-th id (vec_id % FAMILY == 1) is a NEAR-DUP twin of its
   predecessor: same base draw with one component nudged by 0.001, so
   cosine ≈ 1 >> the 0.35 near-dup threshold. Twin rate is constant in
   n, so true-pair volume stays LINEAR as n grows — scaling measurements
   see the algorithm, not a growing answer;
 - labels cycle 0..9 (only used by fixture-pinned queries, not these).

Usage: python3 tools/gen_vecs.py <dstDir> --n=2000000 [--family=16] [--dim=64]
"""
import duckdb, os, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
def flag(name, default):
    hits = [a for a in sys.argv[1:] if a.startswith(f"--{name}=")]
    return hits[0].split("=", 1)[1] if hits else default

DST = args[0]
N = int(flag("n", "2000000"))
FAMILY = int(flag("family", "16"))
DIM = int(flag("dim", "64"))
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO 16")

# the twin shares its predecessor's draws; one dim nudged keeps it a
# near-dup (cosine ~ 1) without being byte-identical
q = f"""
COPY (
  SELECT vec_id,
    list_transform(range(0, {DIM}), d ->
      CAST(
        (CAST(hash(base_id * 131 + d * 7) % 2001 AS DOUBLE) - 1000.0) / 1000.0
        + CASE WHEN is_twin AND d = 0 THEN 0.001 ELSE 0.0 END
      AS FLOAT)) AS embedding,
    CAST(vec_id % 10 AS INT) AS label
  FROM (
    SELECT vec_id,
      CASE WHEN vec_id % {FAMILY} = 1 THEN vec_id - 1 ELSE vec_id END AS base_id,
      vec_id % {FAMILY} = 1 AS is_twin
    FROM (SELECT unnest(range(0, {N})) AS vec_id)
  )
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
"""
con.execute(q)
n = con.execute(f"SELECT count(*) FROM '{DST}/embeddings.parquet'").fetchone()[0]
print("embeddings", n, "->", DST)
