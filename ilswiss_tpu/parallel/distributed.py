"""Multi-chip off-policy runner: shard_map over the ``env`` mesh axis.

Scale-out story (SURVEY.md §2.5, §5.8): every shard owns a slice of the
vectorized envs and a private replay shard in its own HBM; params are
replicated and kept in sync by `pmean`-reduced gradients inside the
trainer (the learner's only collective).  The host never touches
transitions — the reference's pipe/shm transport has no equivalent here
because there is nothing to transport.

Representation: the global `RunnerState` stacks per-shard states along a
leading mesh dimension —
  rng:            [n_shards]            (per-shard key chains)
  env_state:      [n_shards * B, ...]   (sharded env batch)
  replay:         data [n_shards * cap, ...], ptr/size [n_shards]
  algo_state:     replicated
so inside `shard_map` each shard sees exactly the single-device
`RunnerState` the sequential loop already handles — the distributed
runner reuses the sequential loop body verbatim.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ilswiss_tpu.data.replay import ReplayState, replay_init
from ilswiss_tpu.runtime.loop import OffPolicyLoop, RunnerState


class DistributedOffPolicyRunner:
    """Wraps an `OffPolicyLoop` (whose vec_env is the PER-SHARD slice)
    into a mesh-wide runner.  `loop.algo.axis_name` must equal the mesh
    axis so gradients all-reduce."""

    def __init__(self, loop: OffPolicyLoop, mesh: Mesh,
                 axis_name: str = "env"):
        assert getattr(loop.algo, "axis_name", None) == axis_name, (
            "algo must pmean grads over the mesh axis: pass "
            f"axis_name='{axis_name}' when constructing the trainer"
        )
        self.loop = loop
        self.mesh = mesh
        self.axis = axis_name
        self.n_shards = mesh.devices.size

        self._specs = RunnerState(
            rng=P(axis_name),
            env_state=P(axis_name),
            replay=P(axis_name),
            algo_state=P(),
            total_env_steps=P(axis_name),
        )

    # --- stacked <-> per-shard views -----------------------------------
    @staticmethod
    def _to_local(r: RunnerState) -> RunnerState:
        return RunnerState(
            rng=r.rng[0],
            env_state=r.env_state,
            replay=r.replay.replace(ptr=r.replay.ptr[0], size=r.replay.size[0]),
            algo_state=r.algo_state,
            total_env_steps=r.total_env_steps[0],
        )

    @staticmethod
    def _to_stacked(r: RunnerState) -> RunnerState:
        return RunnerState(
            rng=r.rng[None],
            env_state=r.env_state,
            replay=r.replay.replace(
                ptr=r.replay.ptr[None], size=r.replay.size[None]
            ),
            algo_state=r.algo_state,
            total_env_steps=r.total_env_steps[None],
        )

    # -------------------------------------------------------------------
    def init(self, key: jax.Array) -> RunnerState:
        loop, n = self.loop, self.n_shards
        env = loop.vec_env.env
        k_env, k_algo, k_rng = jax.random.split(key, 3)

        # one global reset over all shards' envs
        global_envs = n * loop.vec_env.num_envs
        env_keys = jax.random.split(k_env, global_envs)
        env_state = jax.vmap(env.reset)(env_keys)

        shard_replay = replay_init(
            loop.config.replay_capacity,
            env.observation_size,
            env.action_size,
            write_batch=loop.vec_env.num_envs,
            discrete=env.discrete,
        )
        cap = shard_replay.data["reward"].shape[0]
        replay = ReplayState(
            data={
                k: jnp.zeros((n * cap,) + v.shape[1:], v.dtype)
                for k, v in shard_replay.data.items()
            },
            ep_id=jnp.full((n * cap,), -1, jnp.int32),
            ptr=jnp.zeros((n,), jnp.int32),
            size=jnp.zeros((n,), jnp.int32),
            env_ep=jnp.zeros((n * loop.vec_env.num_envs,), jnp.int32),
        )
        runner = RunnerState(
            rng=jax.random.split(k_rng, n),
            env_state=env_state,
            replay=replay,
            algo_state=loop.algo.init(k_algo),
            total_env_steps=jnp.zeros((n,), jnp.int32),
        )
        # place shards
        shardings = jax.tree.map(
            lambda spec: NamedSharding(self.mesh, spec),
            self._specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        return jax.device_put(runner, shardings)

    # -------------------------------------------------------------------
    def build(self, steps_per_epoch: int):
        """(warmup, train_epoch) jitted over the mesh.

        `steps_per_epoch` is GLOBAL env steps per epoch (all shards)."""
        loop = self.loop
        per_shard_steps = steps_per_epoch // self.n_shards
        warmup_fn, epoch_fn = loop.epoch_fns(per_shard_steps)

        def shard_warmup(runner):
            return self._to_stacked(warmup_fn(self._to_local(runner)))

        def shard_epoch(runner):
            local, metrics = epoch_fn(self._to_local(runner))
            metrics = jax.lax.pmean(metrics, self.axis)
            return self._to_stacked(local), metrics

        smap = partial(
            shard_map, mesh=self.mesh, check_vma=False,
        )
        warmup = jax.jit(
            smap(shard_warmup, in_specs=(self._specs,),
                 out_specs=self._specs),
            donate_argnums=0,
        )
        epoch = jax.jit(
            smap(shard_epoch, in_specs=(self._specs,),
                 out_specs=(self._specs, P())),
            donate_argnums=0,
        )
        return warmup, epoch
