"""Differential-test utilities: compare a Spark DataFrame result against a
DuckDB oracle result the way the driver does (order-insensitive, columns
sorted by name), but stricter — exact value equality, so any engine
divergence (float summation order, type width, null encoding) surfaces
here before the driver's hash check sees it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif isinstance(s.dtype, pd.api.types.pandas_dtype("Int64").__class__) or str(
            s.dtype
        ) in ("Int64", "Int32", "Int16"):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            ok = (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
            if not ok.all():
                bad = np.where(~ok)[0][:5]
                diffs = [(i, av[i], bv[i], abs(av[i] - bv[i])) for i in bad]
                raise AssertionError(
                    f"{name}: column {c!r} float mismatch at rows {diffs}"
                )
        else:
            mism = []
            for i, (x, y) in enumerate(zip(av, bv)):
                same = (x == y) or (pd.isna(x) and pd.isna(y))
                if not same:
                    mism.append((i, x, y))
                    if len(mism) >= 5:
                        break
            assert not mism, f"{name}: column {c!r} mismatch rows {mism}"


def run_pair(spark, duck, qfn, sql, sf_dir, name):
    spark_pdf = qfn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(sql).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
    return len(spark_pdf)
