#!/usr/bin/env python3
"""Marginal-cost audit: median DuckDB wall time of each benched query's
oracle SQL on the same sf parquet, next to the Spark bench numbers.

Reads bench.json (written by graft.Bench) and the oracle_sql.json a
graft.Verify run dumps. Fixture-reading oracles (read_csv/read_blob over
/tmp fixture trees) are skipped — DuckDB would be timing file IO the
Spark side also re-creates, not the operator.

Usage: python3 tools/duck_ratio.py <sfDir> <verifyOutDir>
"""
import json, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf, vdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{vdir}/oracle_sql.json"))
    bench = json.load(open("bench.json"))
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    # r14 (VERDICT item 3): where Bench's end-of-suite isolation pass
    # re-timed a query (every in-suite median >= 1 s), the ISOLATED
    # min-of-2 is the honest Spark number — in-suite medians carry
    # suite contention. The ratio column uses isolated where present;
    # the in-suite median stays visible beside it.
    isolated = bench.get("isolated", {})
    rows, skipped = [], []
    for q, spark_s in bench["queries"].items():
        sql = oracle.get(q)
        if not sql or any(m in sql for m in ("read_blob", "read_csv", "read_json", "'/tmp/")):
            skipped.append(q)
            continue
        ts = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            ts.append(time.time() - t0)
        duck = sorted(ts)[1]
        iso = isolated.get(q)
        best = iso if iso is not None else spark_s
        rows.append((best / duck, q, spark_s, iso, duck))
    rows.sort(reverse=True)
    print(f"{'ratio':>7} {'query':30s} {'suite':>7} {'iso':>7} {'duck':>7}")
    for r, q, s, iso, d in rows:
        iso_s = f"{iso:7.2f}" if iso is not None else "      -"
        print(f"{r:7.1f} {q:30s} {s:7.2f} {iso_s} {d:7.2f}")
    print("skipped (fixture-bound):", " ".join(skipped))
    st, dt = sum(r[2] for r in rows), sum(r[4] for r in rows)
    print(f"totals: spark {st:.1f}s duck {dt:.1f}s aggregate ratio {st/dt:.1f}x")
    iso_rows = [r for r in rows if r[3] is not None]
    if iso_rows:
        sit = sum(r[3] for r in iso_rows)
        dit = sum(r[4] for r in iso_rows)
        print(f"isolated subset ({len(iso_rows)} queries >=1s): "
              f"spark_iso {sit:.1f}s duck {dit:.1f}s ratio {sit/dit:.1f}x")
    # Floor-normalized comparator (r12 VERDICT item 2): raw Spark totals
    # are not comparable across rounds on this host — the driver-side
    # planning floor drifts (DRIFT_r12.md) and taxes every multi-job
    # query uniformly. The standing cross-round metric is
    # total / sql_floor_ms (dimensionless); healthy floor is ~20-30 ms.
    floor = bench.get("sql_floor_ms")
    if floor:
        pre = bench.get("sql_floor_pre_ms")
        post = bench.get("sql_floor_post_ms")
        prepost = (f" (pre {pre:.1f} / post {post:.1f})"
                   if pre is not None and post is not None else "")
        print(f"floor: sql_floor_ms {floor:.1f}{prepost}; "
              f"normalized spark_total/floor = {st / floor:.2f} "
              f"(cross-round comparator; healthy floor ~20-30 ms)")


if __name__ == "__main__":
    main()
