"""Shared result-comparison helpers for the DuckDB oracle gates
(tools/check.py, tools/check_sf1_staged.py). Mirrors the driver's
compare: columns sorted by name, rows sorted, dtype-kind-sensitive
stringification, exact value equality."""
import math


def kindsig(df):
    """Dtype-kind signature per (sorted) column: the driver stringifies
    values dtype-sensitively, so an int64 Spark column vs a float64
    oracle column (e.g. DuckDB HUGEINT -> pandas float64)
    hash-mismatches even when %.10g-formatted values agree."""
    return {c: df[c].dtype.kind for c in sorted(df.columns)}


def arraycols(df):
    """Array-valued columns crash the driver's pandas sort (unhashable
    numpy.ndarray) — outputs must be scalar-only."""
    import numpy as np
    bad = []
    for c in df.columns:
        if len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            bad.append(c)
    return bad


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                row.append("%.10g" % v)
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            else:
                row.append(str(v))
        rows.append("\x1f".join(row))
    rows.sort()
    return cols, rows


def compare(name, sdf, odf):
    """Return None on match, else a failure message."""
    scols, srows = canon(sdf)
    ocols, orows = canon(odf)
    if scols != ocols:
        return f"schema mismatch: spark={scols} oracle={ocols}"
    sk, ok_ = kindsig(sdf), kindsig(odf)
    if sk != ok_:
        diff = {c: (sk[c], ok_[c]) for c in sk if sk[c] != ok_[c]}
        return f"dtype-kind mismatch (spark, oracle): {diff}"
    if len(srows) != len(orows):
        return f"row count: spark={len(srows)} oracle={len(orows)}"
    if srows != orows:
        bad = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        return f"value mismatch, first diffs: {bad}"
    return None
