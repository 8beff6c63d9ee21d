"""Augmented batch sampling for RAD / CURL.

Rebuild of the reference `AugmentCPCImageEnvReplayBuffer`
(rlkit/data_management/aug_replay_buffer.py): sample a uniform batch,
apply the configured augmentation pipeline to obs/next_obs (RAD), and
optionally emit two independently-augmented views of obs as
observations_anchor / observations_pos for the CURL contrastive loss
(aug_replay_buffer.py:61-67).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ilswiss_tpu.data.augmentations import AUG_REGISTRY
from ilswiss_tpu.data.replay import ReplayState, replay_sample


def augmented_sample(state: ReplayState, key: jax.Array, batch_size: int,
                     augs: Sequence[str] = ("crop",),
                     out_size: int | None = None,
                     cpc: bool = False) -> Dict[str, jnp.ndarray]:
    k_sample, k_obs, k_next, k_anchor, k_pos = jax.random.split(key, 5)
    batch = replay_sample(state, k_sample, batch_size)

    def apply_augs(key, imgs):
        for i, name in enumerate(augs):
            key, k = jax.random.split(key)
            fn = AUG_REGISTRY[name]
            if name in ("crop", "translate"):
                imgs = fn(k, imgs, out_size)
            else:
                imgs = fn(k, imgs)
        return imgs

    raw_obs = batch["obs"]
    batch["obs"] = apply_augs(k_obs, raw_obs)
    batch["next_obs"] = apply_augs(k_next, batch["next_obs"])
    if cpc:
        batch["observations_anchor"] = apply_augs(k_anchor, raw_obs)
        batch["observations_pos"] = apply_augs(k_pos, raw_obs)
    return batch
