"""Evaluation statistics helpers.

Rebuild of the reference eval utilities (rlkit/core/eval_util.py):
`create_stats_ordered_dict` (:91-130) summary stats and the path-level
return/success aggregation (:15-80) used by `BaseAlgorithm.evaluate`.
Here paths arrive as masked [T, B] arrays from the lockstep evaluator
instead of lists of dicts.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def create_stats_ordered_dict(name: str, data) -> Dict[str, float]:
    """Mean/Std/Max/Min summary (eval_util.py:91-130)."""
    arr = np.asarray(data, np.float64)
    if arr.size == 0:
        return {}
    return {
        f"{name} Mean": float(arr.mean()),
        f"{name} Std": float(arr.std()),
        f"{name} Max": float(arr.max()),
        f"{name} Min": float(arr.min()),
    }


def get_path_information(returns, lengths, successes=None,
                         prefix: str = "") -> Dict[str, float]:
    """Headline eval keys (eval_util.py:15-80): AverageReturn is the
    model-selection metric (base_algorithm.py:636-637); SuccessRate for
    goal/robotics tasks (:33-59)."""
    stats: Dict[str, float] = {}
    stats[prefix + "AverageReturn"] = float(np.mean(returns))
    stats.update(create_stats_ordered_dict(prefix + "Returns", returns))
    stats.update(create_stats_ordered_dict(prefix + "PathLengths", lengths))
    if successes is not None:
        stats[prefix + "SuccessRate"] = float(np.mean(successes))
    return stats
