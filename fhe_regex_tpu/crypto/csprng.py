"""Client-side randomness.

The reference's crypto stack uses concrete-csprng (AES-128-CTR) for secret
keys, mask sampling and Gaussian noise (SURVEY.md N11).  Bit-exactness is
defined on decrypted results, not on random streams, so any cryptographically
seeded generator with matching *distributions* is a faithful equivalent.

Round-1 implementation: NumPy PCG64 seeded from ``os.urandom`` (or an explicit
seed for reproducible tests/fixtures).  A native AES-CTR C++ backend can be
slotted in behind the same interface (see native/).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class Csprng:
    def __init__(self, seed: Optional[int] = None):
        if seed is None:
            seed = int.from_bytes(os.urandom(16), "little")
        self._rng = np.random.Generator(np.random.PCG64(seed))
        self.seed = seed

    def uniform_torus(self, shape, torus_bits: int = 32) -> np.ndarray:
        """Uniform torus elements as uint32 (or uint64)."""
        if torus_bits == 32:
            return self._rng.integers(0, 1 << 32, size=shape, dtype=np.uint32)
        elif torus_bits == 64:
            return self._rng.integers(0, 1 << 64, size=shape, dtype=np.uint64)
        raise ValueError(torus_bits)

    def binary(self, shape) -> np.ndarray:
        return self._rng.integers(0, 2, size=shape, dtype=np.uint32)

    def gaussian_torus(self, shape, std: float, torus_bits: int = 32) -> np.ndarray:
        """Rounded-Gaussian torus noise with absolute std (torus units)."""
        dtype = np.uint32 if torus_bits == 32 else np.uint64
        if std == 0.0:
            return np.zeros(shape, dtype=dtype)
        noise = np.rint(self._rng.normal(0.0, std, size=shape))
        return noise.astype(np.int64).astype(dtype)
