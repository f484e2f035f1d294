"""Engine configuration.

Mirrors the reference's conf surface (melody-conf.properties:36-91 /
utils/ConfUtils.java:17-23) as a typed object instead of string keys.
Defaults match BASELINE.md.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass(frozen=True)
class EngineConfig:
    dimension: int = 3            # data.dimension (melody-conf.properties:45-46)
    num_bins: int = 30            # data.bin.number (:48-49)
    num_vectors: int = 3          # melody.project.vector.number (:63-64)
    grid_granularity: int = 4     # melody.grid.cell.granularity (:69-70)
    error_intervals: int = 5      # melody.normal.error.interval (:66-67)
    sample_ratio: float = 0.001   # melody.sample.ratio (:72-73)
    threshold: float = 0.05       # melody.join.distance.threshold (:78-79)
    topk: int = 20                # melody.join.k (:81-82)
    num_duals: int = 10           # NEProcessReducer.java:50-51
    num_reductions: int = 10      # NEProcessReducer.java:52-53
    reduced_dimension: int = 8    # NEProcessReducer.java:53
    ground: str = "l2"            # DistanceType (utils/DistanceType.java:1-8)
    seed: int = 42                # seeded randomness everywhere (SURVEY.md §5.3)

    def rng(self) -> np.random.Generator:
        return np.random.default_rng(self.seed)


DEFAULT_CONFIG = EngineConfig()
