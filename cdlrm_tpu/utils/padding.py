"""Static-shape padding helpers (DESIGN.md D6).

Variable-size host buffers (insert/evict plans) are bucketed to powers of two
before entering jit so the number of distinct compiled shapes stays
logarithmic in the maximum size.
"""

from __future__ import annotations

import numpy as np


def pow2_bucket(n: int, min_size: int = 8) -> int:
    if n <= min_size:
        return min_size
    return 1 << int(n - 1).bit_length()


def pad_to_bucket(a: np.ndarray, fill, min_size: int = 8) -> np.ndarray:
    """Pad axis 0 up to the next power-of-two bucket with ``fill``."""
    n = pow2_bucket(a.shape[0], min_size)
    pad = n - a.shape[0]
    if pad == 0:
        return a
    if a.ndim == 1:
        return np.concatenate([a, np.full(pad, fill, a.dtype)])
    pad_block = np.full((pad,) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad_block])
