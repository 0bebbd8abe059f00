#!/usr/bin/env python3
"""Local correctness checker mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [qid...]

Loads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same test parquet, and
compares schemas + values cell-by-cell (columns sorted by name, rows in
result order — the strictest plausible reading of the driver's hash check).
"""
import sys, json, math, datetime
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qid in sorted(oracle):
        if only and qid not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{qid}/*.parquet')"
            ).fetch_arrow_table()
            want = con.execute(oracle[qid]).fetch_arrow_table()
            gcols, wcols = sorted(got.column_names), sorted(want.column_names)
            if gcols != wcols:
                raise AssertionError(f"columns differ: spark={gcols} oracle={wcols}")
            # The DRIVER canonicalizes rows via pandas sort_values over all
            # columns, which crashes on list/struct/map cells (r2:
            # q_embed_quantize). Reject them here too so a local PASS can't
            # mask a driver-side crash — serialize collections first.
            import pyarrow.types as pat
            complex_cols = [c for c in gcols if pat.is_nested(
                got.schema.field(c).type)]
            if complex_cols:
                raise AssertionError(
                    f"non-scalar output columns {complex_cols} would crash "
                    "the driver's pandas canonicalizer - serialize them "
                    "(array_join / to_json)")
            g = got.select(gcols).to_pylist()
            w = want.select(wcols).to_pylist()
            if len(g) != len(w):
                raise AssertionError(f"row count: spark={len(g)} oracle={len(w)}")
            for i, (rg, rw) in enumerate(zip(g, w)):
                for c in gcols:
                    a, b = norm(rg[c]), norm(rw[c])
                    if a != b:
                        raise AssertionError(
                            f"row {i} col {c}: spark={a!r} oracle={b!r}")
            # schema note (informational): compare arrow types loosely
            ts_g = {c: str(got.schema.field(c).type) for c in gcols}
            ts_w = {c: str(want.schema.field(c).type) for c in wcols}
            note = "" if ts_g == ts_w else f"  [type diff: {[(c, ts_g[c], ts_w[c]) for c in gcols if ts_g[c] != ts_w[c]]}]"
            print(f"PASS {qid} rows={len(g)}{note}")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {qid}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
