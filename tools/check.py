#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify (via java, classpath = compiled classes + spark jars),
then for every query compares the Spark parquet output against the
oracle SQL run in DuckDB over the same testdata parquet — rows sorted,
columns sorted by name, exact equality (floats compared to 9 dp).

Usage: python3 tools/check.py [sfdir] [--only q1_agg,q2_...] [--skip-verify]
"""
import duckdb, json, math, os, subprocess, sys, glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
OUT = "/tmp/verify_out"
ONLY = None
for a in sys.argv:
    if a.startswith("--only"):
        ONLY = set(a.split("=", 1)[1].split(","))
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

ADD_OPENS = []
for p in ("java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect "
          "java.base/java.io java.base/java.net java.base/java.nio java.base/java.util "
          "java.base/java.util.concurrent java.base/java.util.concurrent.atomic "
          "java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action "
          "java.base/sun.util.calendar").split():
    ADD_OPENS += ["--add-opens", p + "=ALL-UNNAMED"]

def run_verify():
    cp = f"{REPO}/target/scala-2.13/classes:" + ":".join(glob.glob("/opt/spark/jars/*.jar"))
    cmd = (["java"] + ADD_OPENS +
           ["-Xmx8g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-cp", cp, "graft.Verify", SF, OUT])
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("  !", line)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-5000:])
        sys.exit(f"verify failed rc={r.returncode}")

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    return v

def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracle):
        if ONLY and name not in ONLY: continue
        pdir = f"{OUT}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output"); nfail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
            gcols = sorted(got.columns)
            grows = con.sql(f"SELECT {', '.join(gcols)} FROM got").fetchall()
            exp = con.sql(oracle[name])
            ecols = sorted(exp.columns)
            erows = con.sql(f"SELECT {', '.join(ecols)} FROM exp").fetchall()
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:300]}"); nfail += 1; continue
        if gcols != ecols:
            print(f"FAIL {name}: columns spark={gcols} oracle={ecols}"); nfail += 1; continue
        g = sorted((tuple(norm(v) for v in r) for r in grows), key=repr)
        e = sorted((tuple(norm(v) for v in r) for r in erows), key=repr)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)"); npass += 1
        else:
            nfail += 1
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)} cols={gcols}")
            sg, se = set(g), set(e)
            for r in list(sg - se)[:3]: print(f"   spark-only: {r}")
            for r in list(se - sg)[:3]: print(f"   oracle-only: {r}")
    print(f"\n{npass} pass / {nfail} fail")
    sys.exit(1 if nfail else 0)

main()
