#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: runs Verify's parquet
dumps against the DuckDB oracle SQL and diffs values. Driver-side tooling
only — not part of the engine."""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}"); n_fail += 1; continue
        g, e = got[gc].reset_index(drop=True), exp[gc].reset_index(drop=True)
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        # compare values cell-wise with dtype normalization
        ok = True
        for c in gc:
            a, b = g[c], e[c]
            try:
                if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                    import numpy as np
                    # tiny atol: parallel double aggregation order is
                    # nondeterministic, so rounded sums can differ by 1 ULP
                    if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                        ok = False
                else:
                    av, bv = a.astype(object), b.astype(object)
                    if not (av.fillna("<NULL>") == bv.fillna("<NULL>")).all():
                        ok = False
            except Exception as ex:
                print(f"  {name}.{c}: compare error {ex}"); ok = False
            if not ok:
                print(f"FAIL {name}: column '{c}' differs")
                mism = None
                try:
                    import numpy as np
                    if a.dtype.kind in "fc":
                        mism = (~np.isclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)).to_numpy().nonzero()[0][:5]
                    else:
                        mism = (a.astype(object).fillna("<N>") != b.astype(object).fillna("<N>")).to_numpy().nonzero()[0][:5]
                    for i in mism:
                        print(f"    row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}")
                except Exception:
                    pass
                break
        # also check exact dtypes loosely (schema match)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(g)} rows)")
        else:
            n_fail += 1
    # queries without oracle → rows-only
    qdirs = [os.path.basename(p) for p in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(p)]
    for name in sorted(set(qdirs) - set(oracles)):
        got = load_spark(outdir, name)
        status = "ROWS-ONLY PASS" if got is not None and len(got) > 0 else "ROWS-ONLY FAIL"
        print(f"{status} {name} ({0 if got is None else len(got)} rows)")
    print(f"\n{n_pass} pass / {n_fail} fail (of {len(oracles)} oracle-checked)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
