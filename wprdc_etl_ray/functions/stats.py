"""Distributed exact statistics beyond plain aggregates.

``linreg_per_key``: simple linear regression (y ~ x) per key with
closed-form normal equations over INTEGER partial sums — the moment
sums (n, Σx, Σy, Σxy, Σx²) are exact int64 partials that pre-combine
per batch and fold through one grouped aggregate (the same shuffle
shape as any grouped_agg), and the tiny finalize computes

    slope_micro     = floor((n·Σxy − Σx·Σy) · 10^6 / (n·Σx² − Σx²_sum))
    intercept_micro = floor((Σy · 10^6 − slope_micro · Σx) / n)

in arbitrary-precision Python ints (one row per key on small results),
so the outputs are integer micro-units a SQL oracle reproduces
bit-for-bit (DuckDB side: HUGEINT + an explicit floored division —
DuckDB ``//`` truncates toward zero for negatives, so oracles use
``(a - ((a % b + b) % b)) // b``).

Why not float running aggregates (DuckDB regr_slope): two engines'
float accumulation orders differ in the last ulp; integer moments make
the cross-engine comparison exact, the project's standard precision
policy."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .relational import grouped_agg


def _floordiv(a: int, b: int) -> int:
    return a // b  # Python // already floors toward -inf


def linreg_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Per-key OLS slope/intercept in integer micro-units. ``x_col`` and
    ``y_col`` must be integer columns (quantize first — cents, hours);
    keys whose x is constant (zero variance) emit null slope/intercept."""

    def moments(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # x*y and x*x are int64: numpy wraps silently past 2^63, which
        # would break the exact-integer contract without any error.
        # |x|,|y| < 2^31 keeps every per-row product < 2^62 exact; the
        # grouped SUM of those products still needs n_rows·max|xy| < 2^63
        # headroom, so callers quantize to units where values are far
        # below this guard (the guard catches the silent-wrap regime the
        # contract forbids; it is a necessary, not sufficient, bound).
        lim = 1 << 31
        for name, v in ((x_col, x), (y_col, y)):
            if len(v) and int(np.abs(v).max()) >= lim:
                raise ValueError(
                    f"linreg_per_key: |{name}| must be < 2^31 to keep the "
                    f"int64 moment partials exact (max seen "
                    f"{int(np.abs(v).max())}); quantize to coarser units"
                )
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "_n": pa.array(np.ones(len(x), np.int64)),
                "_sx": pa.array(x),
                "_sy": pa.array(y),
                "_sxy": pa.array(x * y),
                "_sxx": pa.array(x * x),
            }
        )
        return t

    sums = grouped_agg(
        ds.map_batches(moments, batch_format="pyarrow"),
        [key_col],
        [
            ("_n", "sum", "n"),
            ("_sx", "sum", "sx"),
            ("_sy", "sum", "sy"),
            ("_sxy", "sum", "sxy"),
            ("_sxx", "sum", "sxx"),
        ],
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in b.itertuples(index=False):  # one row per key: tiny
            n, sx, sy, sxy, sxx = (
                int(r.n),
                int(r.sx),
                int(r.sy),
                int(r.sxy),
                int(r.sxx),
            )
            den = n * sxx - sx * sx
            if den == 0:
                slope = intercept = None
            else:
                slope = _floordiv((n * sxy - sx * sy) * scale, den)
                intercept = _floordiv(sy * scale - slope * sx, n)
            rows.append(
                {
                    key_col: getattr(r, key_col),
                    "n": n,
                    "slope_micro": slope,
                    "intercept_micro": intercept,
                }
            )
        out = pd.DataFrame(rows, columns=[key_col, "n", "slope_micro", "intercept_micro"])
        return out

    return sums.map_batches(finalize, batch_format="pandas")
