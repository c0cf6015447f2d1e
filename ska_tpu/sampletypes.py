"""Jax-free dataclasses shared by the sample-build pipeline and the
host-side orchestration (api, merge). Split out of ska_tpu.sample so
the CLI paths that never build (align / map / distance on an existing
.skf) don't import the accelerator pipeline just for these types."""

from dataclasses import dataclass

import numpy as np

from .constants import QUAL_STRICT


@dataclass
class QualOpts:
    """FASTQ filtering options (reference src/lib.rs:533-540)."""

    min_count: int = 0
    min_qual: int = 0
    qual_filter: int = QUAL_STRICT


@dataclass
class SampleDict:
    """One sample's sorted key array + middle-base sets."""

    name: str
    k: int
    rc: bool
    keys: np.ndarray  # (n, W) uint64, sorted ascending
    sets: np.ndarray  # (n,) uint8 4-bit base sets

    @property
    def ksize(self) -> int:
        return len(self.sets)
