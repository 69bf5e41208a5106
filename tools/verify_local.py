#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

1. Runs graft.Verify (java -cp classes + /opt/spark/jars) at sfDir.
2. Loads each <name>.parquet result, runs the matching oracle SQL from
   oracle_sql.json in DuckDB (with the sfDir tables registered as views),
   sorts columns by name and rows by all columns, and compares values.
"""
import json, os, subprocess, sys, glob

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/work/verify_out"
REPO = "/root/repo"
CLASSES = f"{REPO}/target/scala-2.13/classes"

ADD_OPENS = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
          "sun.security.action", "sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]


def run_verify():
    jars = ":".join(sorted(glob.glob("/opt/spark/jars/*.jar")))
    cmd = (["java", "-Xmx8g"] + ADD_OPENS +
           ["-Dspark.ui.enabled=false", "-cp", f"{CLASSES}:{jars}",
            "graft.Verify", SF, OUT])
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-8000:])
    if r.returncode != 0:
        print(f"[verify_local] graft.Verify FAILED rc={r.returncode}")
        sys.exit(1)


def compare():
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    for t in glob.glob(f"{SF}/*.parquet"):
        name = os.path.basename(t).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

    with open(f"{OUT}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{OUT}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        ok = list(got.columns) == list(exp.columns) and len(got) == len(exp)
        if ok and list(got.dtypes) != list(exp.dtypes):
            # Driver hashes values dtype-sensitively (int64 vs float64 from
            # HUGEINT differ) — no coercion here, mirror the real gate.
            print(f"  dtype mismatch: got={list(got.dtypes)} exp={list(exp.dtypes)}")
            ok = False
        elif ok:
            g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
            ok = g.equals(e)
            if not ok:
                diff = (g != e)
                bad = diff.any(axis=1)
                print(f"  first diffs for {name}:")
                print("  got:", g[bad].head(3).to_dict("records"))
                print("  exp:", e[bad].head(3).to_dict("records"))
        else:
            print(f"  schema/rows: got cols={list(got.columns)} n={len(got)}"
                  f" exp cols={list(exp.columns)} n={len(exp)}")
        print(("PASS" if ok else "FAIL"), name, f"({len(got)} rows)")
        n_pass += ok
        n_fail += not ok
    print(f"[verify_local] {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    if os.environ.get("SKIP_SPARK") != "1":
        run_verify()
    compare()
