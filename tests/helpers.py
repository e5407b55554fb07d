"""Test helpers: normalize Ray results and compare to a DuckDB frame."""

import pandas as pd
import pyarrow as pa


def to_pandas(result) -> pd.DataFrame:
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def assert_frames_match(ray_result, duck_df: pd.DataFrame, tol: float = 1e-6):
    """Order-insensitive, name-matched comparison (mirrors the driver's check)."""
    got = to_pandas(ray_result)
    want = duck_df
    assert sorted(got.columns) == sorted(want.columns), \
        f"columns differ: {sorted(got.columns)} vs {sorted(want.columns)}"
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    w = want[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    assert len(g) == len(w), f"row counts differ: {len(g)} vs {len(w)}"
    for c in cols:
        if pd.api.types.is_float_dtype(w[c]):
            pd.testing.assert_series_equal(
                g[c].astype(float), w[c].astype(float),
                check_exact=False, rtol=tol, atol=tol, check_names=False)
        else:
            assert g[c].astype(str).tolist() == w[c].astype(str).tolist(), \
                f"column {c} differs"
