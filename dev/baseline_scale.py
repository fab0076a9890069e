#!/usr/bin/env python3
"""Re-measure the BASELINE.md pandas operators on an arbitrary lineitem
parquet — in particular the x16 scale-up fixture — to locate the
pandas/Spark crossover for the sub-second ops that sit under Spark's
per-job floor at sf0.1.

Dev tooling only (driver-side python env, like check.py): the ops mirror
the reference implementations measured in BASELINE.md (`/tmp/ref_bench.py`
per its Measurement setup), with the same op configs:
  smart_suggest: all 11 cols          sdc_suppress: l_returnflag,l_linestatus t=5
  generalize:    l_extendedprice, 10  dp_noise:     l_quantity, eps=1.0
  synthetic:     3 cols, n=rows, s42  basic_stats:  all 11 cols

Usage: python3 dev/baseline_scale.py <lineitem.parquet|sfDir> [out.json]
"""
import json
import sys
import time

import numpy as np
import pandas as pd
from pandas.api.types import is_datetime64_any_dtype, is_numeric_dtype


def sdc_suppress(df, cols, threshold=5):
    df2 = df.copy()
    for col in cols:
        if col in df2.columns and df2[col].dtype == "object":
            vc = df2[col].value_counts(dropna=False)
            rare = vc[vc < threshold].index
            df2[col] = df2[col].where(~df2[col].isin(rare), "OTHER")
    return df2


def generalize_numeric(df, cols, bins=10):
    df2 = df.copy()
    for col in cols:
        if col in df2.columns and np.issubdtype(df2[col].dtype, np.number):
            real_bins = pd.qcut(df2[col], q=bins, retbins=True, labels=False,
                                duplicates="drop")[1]
            labels = [f"[{real_bins[i]:.2f}, {real_bins[i+1]:.2f})"
                      for i in range(len(real_bins) - 1)]
            df2[col] = pd.qcut(df2[col], q=bins, labels=labels, duplicates="drop")
    return df2


def add_dp_noise(df, cols, epsilon=1.0, sensitivity=1.0):
    df2 = df.copy()
    scale = sensitivity / max(epsilon, 1e-6)
    for col in cols:
        if col in df2.columns and np.issubdtype(df2[col].dtype, np.number):
            noise = np.random.laplace(loc=0.0, scale=scale, size=len(df2))
            df2[col] = df2[col] + noise
    return df2


def synthetic_sample(df, n=None, seed=42):
    rng = np.random.default_rng(seed)
    if n is None:
        n = len(df)
    synth = {}
    for col in df.columns:
        s = df[col].dropna()
        if s.empty:
            synth[col] = pd.Series([np.nan] * n)
            continue
        if np.issubdtype(s.dtype, np.number):
            mu, sigma = s.mean(), s.std(ddof=1) or 1.0
            m = int(n * 0.5)
            boot = s.sample(n=n - m, replace=True, random_state=seed).to_numpy()
            gauss = rng.normal(mu, sigma, size=m)
            synth[col] = pd.Series(np.concatenate([boot, gauss]))[:n]
        else:
            vals = s.value_counts(normalize=True)
            choices = rng.choice(vals.index.to_list(), size=n, p=vals.values)
            synth[col] = pd.Series(choices)
    return pd.DataFrame(synth)


def smart_suggest(df):
    suggestions = {"sdc_cols": [], "generalize_cols": [], "dp_cols": [],
                   "dp_epsilon": 1.0}
    for col in df.columns:
        unique = df[col].nunique(dropna=True)
        if df[col].dtype == "object":
            if unique > 20:
                suggestions["sdc_cols"].append(col)
        else:
            if unique > 50:
                suggestions["generalize_cols"].append(col)
                suggestions["dp_cols"].append(col)
            else:
                suggestions["dp_cols"].append(col)
    return suggestions


def basic_stats(df):
    rows = []
    for col in df.columns:
        s = df[col]
        n = len(s)
        miss = int(s.isna().sum())
        row = {"column": col, "dtype": str(s.dtype), "count": int(n),
               "missing": miss,
               "missing_%": round(miss / n * 100.0, 2) if n else np.nan,
               "nunique": int(s.nunique(dropna=True))}
        if is_numeric_dtype(s):
            s_num = pd.to_numeric(s, errors="coerce").dropna()
            row.update({
                "mean": float(s_num.mean()) if not s_num.empty else np.nan,
                "std": float(s_num.std()) if not s_num.empty else np.nan,
                "min": float(s_num.min()) if not s_num.empty else np.nan,
                "p25": float(s_num.quantile(0.25)) if not s_num.empty else np.nan,
                "median": float(s_num.median()) if not s_num.empty else np.nan,
                "p75": float(s_num.quantile(0.75)) if not s_num.empty else np.nan,
                "max": float(s_num.max()) if not s_num.empty else np.nan,
            })
        elif is_datetime64_any_dtype(s):
            s_dt = pd.to_datetime(s, errors="coerce")
            row.update({"min": str(s_dt.min()), "max": str(s_dt.max())})
        else:
            s_safe = s.astype(str)
            row.update({"top": str(s_safe.mode(dropna=True).iloc[0]),
                        "freq": int(s_safe.value_counts(dropna=True).iloc[0])})
        rows.append(row)
    return pd.DataFrame(rows)


def main():
    src = sys.argv[1]
    path = src if src.endswith(".parquet") else f"{src}/lineitem.parquet"
    t0 = time.perf_counter()
    df = pd.read_parquet(path)
    load_s = time.perf_counter() - t0
    # object-dtype strings, as the reference's CSV-loaded frames carry
    for c in df.columns:
        if df[c].dtype.name in ("string", "large_string[pyarrow]"):
            df[c] = df[c].astype(object)

    results = {"rows": len(df), "path": path, "load": round(load_s, 3)}

    def timed(name, fn):
        t = time.perf_counter()
        fn()
        results[name] = round(time.perf_counter() - t, 3)
        print(f"[baseline-scale] {name:<16} {results[name]:8.3f} s", flush=True)

    timed("smart_suggest", lambda: smart_suggest(df))
    timed("sdc_suppress",
          lambda: sdc_suppress(df, ["l_returnflag", "l_linestatus"], 5))
    timed("generalize", lambda: generalize_numeric(df, ["l_extendedprice"], 10))
    timed("dp_noise", lambda: add_dp_noise(df, ["l_quantity"], 1.0))
    timed("synthetic", lambda: synthetic_sample(
        df[["l_quantity", "l_extendedprice", "l_returnflag"]], seed=42))
    timed("basic_stats", lambda: basic_stats(df))

    out = sys.argv[2] if len(sys.argv) > 2 else None
    line = json.dumps(results)
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
