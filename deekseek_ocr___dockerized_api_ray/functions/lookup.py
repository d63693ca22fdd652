"""Vectorized broadcast-join kernel: int-key -> int-value lookup as two
sorted numpy arrays + searchsorted, instead of a Python dict whose
``Series.map`` costs a hash probe per ROW. The pair of arrays is what
gets ``ray.put`` -- zero-copy out of the object store on every worker,
and lookup of a 131k-row batch is two vectorized ops.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class VecLookup:
    """Sorted-array int64-key -> value map with miss detection. Values
    keep their numpy dtype (int64 keys are the only requirement)."""

    def __init__(self, keys: "np.ndarray", values: "np.ndarray"):
        keys = np.asarray(keys, dtype=np.int64)
        values = np.asarray(values)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.values = values[order]

    def lookup(self, probe: "np.ndarray") -> Tuple["np.ndarray", "np.ndarray"]:
        """(values, found): values undefined where found is False."""
        probe = np.asarray(probe, dtype=np.int64)
        if len(self.keys) == 0:  # empty dimension: all misses, no crash
            return (np.empty(len(probe), dtype=self.values.dtype),
                    np.zeros(len(probe), dtype=bool))
        idx = np.searchsorted(self.keys, probe)
        idx_c = np.minimum(idx, len(self.keys) - 1)
        found = self.keys[idx_c] == probe
        return self.values[idx_c], found
