#!/usr/bin/env python3
"""Prototype check: DuckDB SQL partial_ratio (bit-parallel Allison-Dix over
RapidFuzz windows) vs a Python port of graft Fuzz.partialRatioCutoff.
Run: python3 tools/proto_partial_ratio.py
"""
import duckdb
import random
import string


# ---- Python port of Fuzz.scala (the audited Spark-side scorer) ----
def lcs(s, l):
    m = len(s)
    if m == 0:
        return 0
    masks = {}
    for i, c in enumerate(s):
        masks[c] = masks.get(c, 0) | (1 << i)
    full = (1 << m) - 1
    v = full
    for c in l:
        mt = masks.get(c, 0)
        u = v & mt
        v = ((v + u) | (v & ~mt)) & full
    return m - bin(v & full).count("1")


def partial_ratio_double(a, b):
    s, l = (a, b) if len(a) <= len(b) else (b, a)
    m, n = len(s), len(l)
    if m == 0:
        return 100.0 if n == 0 else 0.0
    best = 0.0
    for j in range(1, m):
        best = max(best, 200.0 * lcs(s, l[0:j]) / (m + j))
    for i in range(0, n - m + 1):
        best = max(best, 200.0 * lcs(s, l[i:i + m]) / (m + m))
    for j in range(1, m):
        best = max(best, 200.0 * lcs(s, l[n - j:n]) / (m + j))
    return best


def java_round(x):
    import math
    return math.floor(x + 0.5)


def partial_ratio_cutoff(a, b, cutoff):
    d = partial_ratio_double(a.lower(), b.lower())
    return java_round(d) if d >= cutoff else 0


# ---- DuckDB SQL version (the oracle candidate) ----
SCORER_SQL = """
WITH src AS (SELECT * FROM pairs),
pr1 AS (SELECT *,
  CASE WHEN strlen(a) <= strlen(b) THEN lower(a) ELSE lower(b) END AS pr_s,
  CASE WHEN strlen(a) <= strlen(b) THEN lower(b) ELSE lower(a) END AS pr_l
  FROM src),
pr2 AS (SELECT *, strlen(pr_s) AS pr_m, strlen(pr_l) AS pr_n FROM pr1),
pr3 AS (SELECT *,
  CASE WHEN pr_m = 0 THEN 0 ELSE (1::BIGINT << pr_m) - 1 END AS pr_full,
  list_transform(string_split(pr_l, ''), ch ->
    list_sum(list_transform(range(1, pr_m + 1),
      i -> CASE WHEN substr(pr_s, i::INT, 1) = ch THEN (1::BIGINT << (i::INT - 1)) ELSE 0::BIGINT END))::BIGINT) AS pr_ml
  FROM pr2),
pr4 AS (SELECT *,
  list_concat(list_concat(
    list_transform(range(1, pr_m), j -> {'wa': 1::INT, 'wb': j::INT}),
    list_transform(range(1, pr_n - pr_m + 2), i -> {'wa': i::INT, 'wb': (i + pr_m - 1)::INT})),
    list_transform(range(1, pr_m), j -> {'wa': (pr_n - j + 1)::INT, 'wb': pr_n::INT})) AS pr_wins
  FROM pr3),
pr5 AS (SELECT *,
  CASE WHEN pr_m = 0 THEN (CASE WHEN pr_n = 0 THEN 100.0 ELSE 0.0 END)
       ELSE list_max(list_transform(pr_wins, w ->
         200.0 * (pr_m - bit_count(list_reduce(list_prepend(pr_full, list_slice(pr_ml, w.wa, w.wb)),
                    (v, mk) -> ((v + (v & mk)) | (v & ~mk)) & pr_full)))
           / (pr_m + (w.wb - w.wa + 1)))) END AS pr_best
  FROM pr4),
scored AS (SELECT *, CASE WHEN pr_best >= {cutoff} THEN round(pr_best)::BIGINT ELSE 0::BIGINT END AS score FROM pr5)
SELECT i, score FROM scored ORDER BY i
"""


def main():
    rng = random.Random(42)
    cases = [
        ("ab", "ba"),          # RapidFuzz edge: equal length still uses edge windows
        ("a", "apple"),        # 1-char needle
        ("test", "test2"),
        ("", ""),
        ("", "x"),
        ("abcd", "abcd"),
        ("kitten", "sitting"),
        ("aaaa", "aa"),
        ("Vanilla", "vanilla "),
    ]
    alpha = string.ascii_lowercase[:6] + " X"
    for _ in range(400):
        la = rng.randint(0, 30)
        lb = rng.randint(0, 55)
        a = "".join(rng.choice(alpha) for _ in range(la))
        b = "".join(rng.choice(alpha) for _ in range(lb))
        cases.append((a, b))

    # long-needle set for the HUGEINT (128-bit) variant: 63-126 chars,
    # past the BIGINT bit vector AND past the Spark scorer's 64-bit
    # Allison-Dix fast path (these exercise the DP path, q105's subject)
    long_cases = [("a" * 126, "a" * 200), ("ab" * 63, "ba" * 100)]
    for _ in range(200):
        la = rng.randint(63, 126)
        lb = rng.randint(1, 200)
        a = "".join(rng.choice(alpha) for _ in range(la))
        b = "".join(rng.choice(alpha) for _ in range(lb))
        long_cases.append((a, b))

    con = duckdb.connect()
    for label, cs, sql in (
        ("BIGINT", cases, SCORER_SQL),
        ("HUGEINT", long_cases, SCORER_SQL.replace("BIGINT", "HUGEINT")),
    ):
        for cutoff in (0, 60, 90):
            con.execute("CREATE OR REPLACE TABLE pairs AS SELECT * FROM (VALUES "
                        + ",".join(f"({i}, ?, ?)" for i in range(len(cs)))
                        + ") t(i, a, b)",
                        [x for c in cs for x in c])
            rows = con.execute(sql.replace("{cutoff}", str(cutoff))).fetchall()
            bad = 0
            for (i, got) in rows:
                want = partial_ratio_cutoff(cs[i][0], cs[i][1], cutoff)
                if got != want:
                    bad += 1
                    if bad <= 5:
                        print(f"MISMATCH {label} cutoff={cutoff} a={cs[i][0]!r} b={cs[i][1]!r}: sql={got} py={want}")
            print(f"{label} cutoff={cutoff}: {len(rows) - bad}/{len(rows)} match")
            if bad:
                raise SystemExit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
