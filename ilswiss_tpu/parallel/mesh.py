"""Device-mesh construction and axis conventions.

The rebuild's distributed-communication layer (SURVEY.md §5.8): where the
reference moves data over `multiprocessing.Pipe` + POSIX shared memory
(rlkit/envs/worker/subproc.py) and has no learner parallelism at all
(single pinned GPU, pytorch_util.py:55-66), here a named
`jax.sharding.Mesh` carries both:

  - ``env``  axis — environment data parallelism: env states, replay
    shards, and acting are sharded; the reference's SubprocVectorEnv /
    envpool equivalent.
  - ``data`` axis — learner data parallelism: gradients `pmean`-reduced
    across shards (ICI in-slice, DCN across slices — same collective).

For RL's MLP-scale models one axis usually plays both roles (each shard
acts on its own envs and computes grads on its own replay batch), so the
default mesh is 1-D over all devices with the ``env`` name; `pmean` over
that axis is the learner all-reduce.  A ``model`` axis slot is reserved
for TP on large critics/world-models (SURVEY.md §2.5) but v1 keeps
params replicated.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

ENV_AXIS = "env"
DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, axis_name: str = ENV_AXIS,
              devices=None) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))
