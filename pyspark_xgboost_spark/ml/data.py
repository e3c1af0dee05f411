"""Arrow-batch → feature-matrix assembly (reference data.py rewrite).

Inside ``mapInPandas``/``pandas_udf`` the data model is columnar pandas
batches; this module concatenates them into the dense float32 matrix +
label/weight/margin vectors the kernel consumes, enforcing uniform
feature dimensionality (reference data.py:120-130) and splitting
train/validation rows by the boolean indicator inside pandas so the
split stays partition-local (reference data.py:158-160).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd


class MatrixBundle:
    __slots__ = ("X", "y", "w", "base_margin")

    def __init__(self, X, y, w, base_margin):
        self.X = X
        self.y = y
        self.w = w
        self.base_margin = base_margin


def _stack_features(series: pd.Series) -> np.ndarray:
    if len(series) == 0:
        return np.empty((0, 0), dtype=np.float32)
    arrs = series.to_numpy()
    dims = {len(a) for a in arrs}
    if len(dims) != 1:
        raise ValueError(
            f"feature vectors have inconsistent dimensions: {sorted(dims)} "
            "(all rows must share one dimensionality)"
        )
    return np.stack([np.asarray(a, dtype=np.float32) for a in arrs])


def batches_to_matrices(
    batches: Iterator[pd.DataFrame],
    has_weight: bool = False,
    has_base_margin: bool = False,
    has_validation: bool = False,
) -> tuple[MatrixBundle, MatrixBundle | None]:
    """Concatenate an Arrow-batch iterator into (train, validation)
    matrix bundles. Validation is None unless has_validation."""
    parts: list[pd.DataFrame] = [pdf for pdf in batches if len(pdf)]
    if not parts:
        empty = MatrixBundle(np.empty((0, 0), np.float32), np.empty(0), None, None)
        return empty, (empty if has_validation else None)
    pdf = pd.concat(parts, ignore_index=True)

    def bundle(sub: pd.DataFrame) -> MatrixBundle:
        X = _stack_features(sub["values"])
        y = sub["label"].to_numpy(dtype=np.float64) if "label" in sub else np.empty(0)
        w = sub["weight"].to_numpy(dtype=np.float64) if has_weight else None
        bm = sub["baseMargin"].to_numpy(dtype=np.float64) if has_base_margin else None
        return MatrixBundle(X, y, w, bm)

    if not has_validation:
        return bundle(pdf), None
    mask = pdf["validationIndicator"].astype(bool)
    return bundle(pdf.loc[~mask]), bundle(pdf.loc[mask])
