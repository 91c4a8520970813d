"""Run EVERY oracled query against its DuckDB oracle at one scale and
write the full correctness matrix (VERDICT r4 item 5: the driver samples
~50 of the registered queries per round; this harness covers all of them
once so no family ships unexercised).

    python tools/full_oracle_matrix.py [--sf /root/testdata/sf0.01] \
        [--out CORRECTNESS_full_r05.json] [--num-cpus 16]

Per query: rows_match (row counts equal), schema_match (sorted column
names + dtypes equal), hash_match (full value equality after the canon
transform — columns sorted by name, rows sorted by all columns — the same
compare tests/test_ops.py uses, strictly stronger than a value hash).
Queries without an oracle_sql entry are recorded as rows-only (the
engine result must execute and produce a stable schema).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _pdf(res):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="CORRECTNESS_full_r05.json")
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    import ray

    ray.init(
        address="local", num_cpus=args.num_cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR", log_to_driver=False,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    os.environ["GRAFT_ORACLE_SF_DIR"] = args.sf
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    queries = E.queries()
    oracles = E.oracle_sql()
    names = list(queries)
    if args.only:
        names = [n for n in args.only.split(",") if n in queries]

    results: dict = {}
    t_start = time.time()
    for i, name in enumerate(names):
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.time()
        try:
            rdf = _pdf(queries[name](args.sf))
            rec["spark_rows"] = int(len(rdf))
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                rec["oracle_rows"] = int(len(odf))
                rc, oc = _canon(rdf), _canon(odf)
                rec["rows_match"] = len(rdf) == len(odf)
                rec["schema_match"] = list(rc.columns) == list(oc.columns) and [
                    str(d) for d in rc.dtypes
                ] == [str(d) for d in oc.dtypes]
                rec["hash_match"] = bool(
                    rec["rows_match"] and rec["schema_match"] and rc.equals(oc)
                )
            else:
                rec["rows_match"] = True          # rows-only contract: it ran
                rec["err"] = "no_oracle"
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        status = (
            "PASS" if rec["hash_match"]
            else ("rows-only" if rec["err"] == "no_oracle" else "FAIL")
        )
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({rec['sec']}s)",
              file=sys.stderr, flush=True)

    oracled = [n for n in names if n in oracles]
    summary = {
        "sf_dir": args.sf,
        "n_queries": len(names),
        "n_oracled": len(oracled),
        "n_hash_match": sum(bool(results[n]["hash_match"]) for n in oracled),
        "n_fail": sum(
            1 for n in names
            if results[n]["err"] not in (None, "no_oracle")
            or (n in oracles and not results[n]["hash_match"])
        ),
        "total_sec": round(time.time() - t_start, 1),
    }
    out = {"_summary": summary, **results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    ray.shutdown()
    return 0 if summary["n_fail"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
