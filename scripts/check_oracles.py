"""Self-check: run every __spark_entry__ query against its DuckDB oracle
at sf0.01 and report row-count / schema / value agreement, mimicking the
driver's CORRECTNESS gate. Usage: python scripts/check_oracles.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize ONLY what the driver's hash canonicalizes.

    The driver hashes serialized values, so differences the old replica
    normalized away were driver-visible: integer WIDTH (r2 HUGEINT reds)
    and float SIGN-OF-ZERO (r3 emb_covariance red). Integer dtypes are
    therefore kept at declared width (nullable Int64 only when NULLs
    force it), and floats are compared bitwise in compare().
    """
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == np.float32:
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            # object columns from toPandas() may hold Python ints when the
            # column is nullable — leave numeric objects numeric so width
            # checks stay meaningful, stringify the rest. Guard is_scalar
            # first: pd.isna(list/ndarray) returns an ARRAY (ambiguous
            # truth value) for sequence cells, e.g. an array column.
            def _numeric_cell(x):
                return isinstance(x, (int, np.integer)) or (
                    pd.api.types.is_scalar(x) and pd.isna(x)
                )

            if not all(_numeric_cell(x) for x in df[c]):
                df[c] = df[c].map(
                    lambda x: str(x.tolist() if isinstance(x, np.ndarray) else x)
                )
    # Row alignment must match the BITWISE comparison semantics below:
    # sort float columns by bit pattern, not ==, so -0.0/+0.0 (and any
    # NaN payloads) order identically in both frames instead of tying
    # and keeping each engine's original order.
    sort_keys = {}
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            sort_keys[c] = pd.Series(
                np.asarray(df[c].values, dtype=np.float64).view(np.int64),
                index=df.index,
            )
        else:
            sort_keys[c] = df[c]
    order = (
        pd.DataFrame(sort_keys)
        .sort_values(list(df.columns), kind="mergesort")
        .index
    )
    return df.loc[order].reset_index(drop=True)


def _int_width(dtype) -> str | None:
    """Declared integer width class ('int8'...'int64'), ignoring
    nullability (pandas Int64 vs numpy int64 both mean BIGINT)."""
    s = str(dtype).lower()
    for w in ("int8", "int16", "int32", "int64"):
        if s == w or s == "u" + w:
            return w
    return None


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count {len(sdf)} vs {len(odf)}")
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        problems.append(f"columns {scols} vs {ocols}")
        return problems
    if problems:
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        s_int, o_int = _int_width(sv.dtype), _int_width(ov.dtype)
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            # BITWISE comparison — the driver hashes serialized bytes, so
            # -0.0 vs +0.0 (IEEE ==-equal) is a driver FAIL. NaNs: both
            # engines emit the canonical quiet NaN through float64, and
            # pandas stores NULL doubles as NaN too, so NaN==NaN is fine.
            sb = np.asarray(sv.values, dtype=np.float64).view(np.int64)
            ob = np.asarray(ov.values, dtype=np.float64).view(np.int64)
            eq = (sb == ob) | (np.isnan(sv.values) & np.isnan(ov.values))
            if not eq.all():
                bad = (~eq).sum()
                diffs = np.abs(sv.values[~eq] - ov.values[~eq])
                # NaN-vs-value disagreements make the numeric diff NaN;
                # count them separately so the headline diagnostic
                # doesn't read 0.0 while the real defect is a NaN
                # pattern mismatch.
                n_nanpat = int(
                    (np.isnan(sv.values[~eq]) != np.isnan(ov.values[~eq])).sum()
                )
                finite = diffs[~np.isnan(diffs)]
                maxdiff = float(finite.max()) if finite.size else 0.0
                nz = int(
                    (np.signbit(sv.values[~eq]) != np.signbit(ov.values[~eq])).sum()
                )
                problems.append(
                    f"col {c}: {bad} bitwise mismatches (max abs diff "
                    f"{maxdiff:.3e}; {nz} sign-of-zero/sign diffs; "
                    f"{n_nanpat} NaN-pattern diffs)"
                )
        elif s_int and o_int:
            if s_int != o_int:
                problems.append(
                    f"col {c}: integer width {sv.dtype} vs {ov.dtype} — "
                    f"driver hash WILL differ (cast both sides to the same width)"
                )
                continue
            sv2 = sv.astype("Int64")
            ov2 = ov.astype("Int64")
            # NA == value yields pd.NA, and np.asarray(bool) on masked
            # arrays CRASHES — a null-pattern regression must report as
            # a FAIL, not kill the whole gate. Fold NA to False first.
            eq = (sv2.values == ov2.values) | (pd.isna(sv2.values) & pd.isna(ov2.values))
            eq = pd.array(eq, dtype="boolean").to_numpy(dtype=bool, na_value=False)
            if not eq.all():
                idx = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {(~eq).sum()} mismatches e.g. {sv.iloc[idx]!r} vs {ov.iloc[idx]!r}"
                )
        else:
            if (s_int is None) != (o_int is None) and not (
                sv.dtype == object and ov.dtype == object
            ):
                problems.append(f"col {c}: dtype class {sv.dtype} vs {ov.dtype}")
                continue
            eq = (sv.astype(str).values == ov.astype(str).values)
            if not eq.all():
                idx = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {(~eq).sum()} mismatches e.g. {sv.iloc[idx]!r} vs {ov.iloc[idx]!r}"
                )
    return problems


def main():
    import __spark_entry__ as E
    from meds_transforms_spark import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    # A typo'd query name must not read as a green gate ("0 pass /
    # 0 fail", exit 0) — report unknown names and fail.
    unknown = sorted(only - set(qs))
    if unknown:
        print(f"FAIL: unknown query name(s): {', '.join(unknown)}")
        print(f"registered: {len(qs)} queries — see __spark_entry__.queries()")
        return 1

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"   - {p}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
