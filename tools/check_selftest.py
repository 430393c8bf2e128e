#!/usr/bin/env python3
"""Unit cases for tools/check.py's driver-faithful compare.

The round-9/10 incident: DuckDB HUGEINT columns arrive in pandas as
float64 (or object), Spark's BIGINT as np.int64; check.py's old
isinstance(a, (int, float)) guard missed numpy scalars so the drift
passed locally while the driver's stringified hash failed. These cases
pin the fixed behavior: HUGEINT-vs-BIGINT drift must FAIL.
"""
import numpy as np
import pandas as pd
from check import cell_eq


def main():
    # numpy int-vs-float drift must FAIL (the r9/r10 bug class)
    assert not cell_eq(np.float64(325110.0), np.int64(325110))
    assert not cell_eq(np.int64(325110), np.float64(325110.0))
    assert not cell_eq(325110.0, np.int64(325110))
    assert not cell_eq(np.float64(5.0), 5)
    # same-kind numpy scalars pass
    assert cell_eq(np.int64(7), np.int64(7))
    assert cell_eq(np.int64(7), 7)
    assert cell_eq(np.float64(7.5), 7.5)
    assert not cell_eq(np.int64(7), np.int64(8))
    # -0.0 vs 0.0 must FAIL (stringified hash differs)
    assert not cell_eq(np.float64(-0.0), np.float64(0.0))
    assert cell_eq(np.float64(-0.0), -0.0)
    # NaN == NaN, None == None
    assert cell_eq(np.float64("nan"), float("nan"))
    assert cell_eq(None, None)
    assert not cell_eq(None, 0)
    # nested lists recurse with the same numpy-aware guard
    assert not cell_eq([np.float64(1.0)], [np.int64(1)])
    assert cell_eq([np.int64(1), np.int64(2)], [1, 2])

    # Fast-path dtype-kind agreement: a float64 frame and an int64 frame
    # whose str() forms happened to agree must NOT be trivially equal.
    exp = pd.DataFrame({"mu": pd.array([1, 2], dtype="float64")})
    got = pd.DataFrame({"mu": pd.array([1, 2], dtype="int64")})
    kinds_agree = all(exp.dtypes[c].kind == got.dtypes[c].kind
                      for c in exp.columns)
    assert not kinds_agree
    # And the slow path then catches it cell-by-cell:
    assert not cell_eq(exp.iloc[0]["mu"], got.iloc[0]["mu"])
    print("check_selftest: all cases pass")


if __name__ == "__main__":
    main()
