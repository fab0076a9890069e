#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 dev/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle query in DuckDB against views over the sfDir parquet tables, and
compares with the Spark-written parquet under <verifyOutDir>/<name>/.
Reports exact match (hash-equivalent) and tolerant match per query.

Dev-only tooling — the shipped library never depends on this.
"""
import duckdb, json, sys, glob, math

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cells_equal(a, b, tol):
    if a is None and b is None:
        return True
    # Both-NaT (null timestamps) counts as equal — but ONLY NaT: a Spark
    # NULL (None) vs a DuckDB NaN must still register as a MISMATCH.
    import pandas as pd
    if a is pd.NaT and b is pd.NaT:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        return tol and abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

def compare(sdf, ddf):
    if sorted(sdf.columns) != sorted(ddf.columns):
        return "SCHEMA-MISMATCH cols spark=%s duck=%s" % (sorted(sdf.columns), sorted(ddf.columns))
    if len(sdf) != len(ddf):
        return f"ROWCOUNT-MISMATCH spark={len(sdf)} duck={len(ddf)}"
    s, d = canon(sdf), canon(ddf)
    exact, close = True, True
    first_bad = None
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not cells_equal(a, b, tol=False):
                exact = False
                if not cells_equal(a, b, tol=True):
                    close = False
                    if first_bad is None:
                        first_bad = (c, i, a, b)
                    break
    if exact:
        return "EXACT"
    if close:
        return "CLOSE (float ulp only)"
    return f"MISMATCH first at col={first_bad[0]} row={first_bad[1]}: spark={first_bad[2]!r} duck={first_bad[3]!r}"

def main():
    # optional: --json <path> appends driver-format per-query records
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    # --subset: the caller declares an intentional filtered Verify run, so
    # oracle entries without result dirs are ignored regardless of how
    # large the subset is (the <half heuristic below misfires on e.g. the
    # 147-of-175 x16 sweep, where the exclusions are deliberate:
    # above-ceiling dispatch twins and fixture-calibrated audits).
    declared_subset = "--subset" in args
    if declared_subset:
        args.remove("--subset")
    sfdir, outdir = args[0], args[1]
    records = {}
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; ScaleUp fixtures are Spark
        # part-directories - glob the parts in that case
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    result_dirs = sorted(glob.glob(f"{outdir}/*/"))
    names = [p.rstrip("/").split("/")[-1] for p in result_dirs]
    failures = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name:35s} NO-OUTPUT"); failures += 1
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None, "err": "no_output"}
            continue
        sdf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"{name:35s} rows-only: {len(sdf)} rows" + (" (EMPTY!)" if len(sdf) == 0 else ""))
            if len(sdf) == 0: failures += 1
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(sdf),
                             "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            rel = con.sql(oracle[name])
            dtypes = dict(zip(rel.columns, (str(t) for t in rel.types)))
            ddf = rel.df()
        except Exception as e:
            print(f"{name:35s} ORACLE-SQL-ERROR {e}"); failures += 1
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(sdf),
                             "oracle_rows": None, "err": f"oracle_sql_error: {e}"}
            continue
        # Driver-faithful strictness (round-3 lesson): the driver reads the
        # SPARK parquet via pyarrow→pandas (DECIMAL → object(Decimal)) but
        # the ORACLE via duckdb .df() (DECIMAL and HUGEINT → float64), then
        # hashes typed values. So spark-side DECIMAL, or an oracle HUGEINT
        # (window SUM) against a spark BIGINT, hash-mismatches even when
        # every value is numerically equal — which plain pandas `==` hides.
        # Reproduce the asymmetry and flag family divergence.
        # Int width does NOT matter (t_text_stats ships INT32 vs a BIGINT
        # oracle and hash-passes every driver round) — only the family does.
        INTS = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")
        def fam_spark(t):
            t = str(t)
            if t.startswith("DECIMAL"): return "obj"      # pyarrow → Decimal objects
            if t in INTS: return "int"
            if t in ("FLOAT", "DOUBLE"): return "float"
            return "other"
        def fam_oracle(t):
            t = str(t)
            if t.startswith("DECIMAL") or t == "HUGEINT": return "float"  # .df() coerces
            if t in INTS: return "int"
            if t in ("FLOAT", "DOUBLE"): return "float"
            return "other"
        srel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet' LIMIT 0")
        stypes = dict(zip(srel.columns, (str(t) for t in srel.types)))
        baddt = {c: (stypes.get(c), t) for c, t in dtypes.items()
                 if c in stypes and fam_spark(stypes[c]) != fam_oracle(t)}
        if baddt:
            print(f"{name:35s} TYPE-MISMATCH (spark,oracle)={baddt}")
            failures += 1
            records[name] = {"rows_match": len(sdf) == len(ddf),
                             "schema_match": False, "hash_match": False,
                             "spark_rows": len(sdf), "oracle_rows": len(ddf),
                             "err": f"type_mismatch: {baddt}"}
            continue
        verdict = compare(sdf, ddf)
        print(f"{name:35s} {verdict}")
        if verdict.startswith(("MISMATCH", "SCHEMA", "ROWCOUNT")):
            failures += 1
        records[name] = {
            "rows_match": not verdict.startswith(("ROWCOUNT", "SCHEMA")),
            "schema_match": not verdict.startswith("SCHEMA"),
            "hash_match": verdict == "EXACT",
            "spark_rows": len(sdf), "oracle_rows": len(ddf),
            "err": None if verdict == "EXACT" else verdict}
    # Oracle entries with no result dir only count as failures on a full
    # Verify run; a filtered run (graft.Verify <sf> <out> name...) writes a
    # subset of results but always the complete oracle_sql.json.
    extra = set(oracle) - set(names)
    if extra and (declared_subset or len(names) < len(oracle) // 2):
        print(f"(subset run: {len(extra)} oracle entries without results, ignored)")
    else:
        for name in extra:
            print(f"{name:35s} ORACLE-WITHOUT-RESULT"); failures += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"(wrote {json_out}: {len(records)} records)")
    print(f"\n{'FAIL' if failures else 'OK'}: {failures} failing of {len(names)} queries")
    sys.exit(1 if failures else 0)

main()
