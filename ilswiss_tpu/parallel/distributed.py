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


def restore_across_topology(path: str,
                            factory: DistributedOffPolicyRunner
                            ) -> RunnerState:
    """Resume a distributed checkpoint on a DIFFERENT mesh shape.

    The preemption-recovery case (SURVEY.md §5.3): a job saved on an
    8-device mesh restarts on whatever slice is available.  Replicated
    state (params, optimizers) and the global env batch reshard
    trivially; the genuinely topology-shaped state is migrated:

      * replay shards: each old shard's valid rows are unrolled in ring
        (oldest-first) order, concatenated into one logical stream, and
        re-packed contiguously into the new shard regions (ptr/size
        recomputed) — no transition is lost or duplicated;
      * rng: fresh per-shard chains folded from the old shard-0 key
        (key chains are not mergeable across topologies by design);
      * total_env_steps: the global sum redistributed (remainder to
        shard 0) so the logged total is unchanged.

    Requires the same GLOBAL env count and replay capacity; raises
    otherwise.  Same-topology restores should use
    runtime.checkpoint.restore_checkpoint (exact resume)."""
    import numpy as np

    from ilswiss_tpu.runtime.checkpoint import raw_restore

    raw = raw_restore(path)
    n_old = int(np.asarray(raw["total_env_steps"]).shape[0])
    n_new = factory.n_shards
    cap_new = factory.loop.config.replay_capacity
    g_rows = int(np.asarray(raw["replay"]["ep_id"]).shape[0])
    if g_rows != n_new * cap_new:
        raise ValueError(
            f"global replay capacity mismatch: checkpoint has {g_rows} "
            f"rows, target mesh wants {n_new} x {cap_new}")
    cap_old = g_rows // n_old

    ptr_old = np.asarray(raw["replay"]["ptr"], np.int64)
    size_old = np.asarray(raw["replay"]["size"], np.int64)

    # ring-order (oldest-first) row indices of each old shard
    order = []
    for i in range(n_old):
        base = i * cap_old
        s, p = int(size_old[i]), int(ptr_old[i])
        if s < cap_old:
            idx = np.arange(s)
        else:
            idx = np.concatenate([np.arange(p, cap_old), np.arange(p)])
        order.append(base + idx)
    order = (np.concatenate(order) if order
             else np.zeros((0,), np.int64))
    total_valid = order.shape[0]

    # contiguous re-pack into new shard regions
    sizes_new = np.zeros((n_new,), np.int64)
    remaining = total_valid
    for j in range(n_new):
        sizes_new[j] = min(cap_new, remaining)
        remaining -= sizes_new[j]
    dst_rows = np.concatenate([
        j * cap_new + np.arange(sizes_new[j]) for j in range(n_new)
    ]) if total_valid else np.zeros((0,), np.int64)

    def repack(arr):
        arr = np.asarray(arr)
        out = np.zeros((n_new * cap_new,) + arr.shape[1:], arr.dtype)
        out[dst_rows] = arr[order]
        return out

    data = {k: repack(v) for k, v in raw["replay"]["data"].items()}
    # ep_id = env_idx * _EP_STRIDE + env_ep is only unique WITHIN a
    # shard; merging rows from different old shards into one new shard
    # could alias unrelated episodes (old shard 0 env 0 ep 3 == old
    # shard 1 env 0 ep 3), letting the same-ep window check join them.
    # Remap to globally-unique ids by offsetting each old shard's env
    # block: global_env = old_shard * n_envs_old + env_idx.
    from ilswiss_tpu.data.replay import _EP_STRIDE
    env_ep_old = np.asarray(raw["replay"]["env_ep"])
    n_envs_old = env_ep_old.reshape(-1).shape[0] // n_old
    raw_ep = np.asarray(raw["replay"]["ep_id"]).astype(np.int64)
    shard_of_row = np.arange(g_rows, dtype=np.int64) // cap_old
    remapped = raw_ep + shard_of_row * (n_envs_old * _EP_STRIDE)
    remapped[raw_ep < 0] = -1
    ep_dtype = np.asarray(raw["replay"]["ep_id"]).dtype
    # the remap is computed in int64; refuse to silently wrap when
    # casting back (n_old * n_envs_old * 2^20 exceeds int32 above
    # ~2048 global envs — wrapped ids would alias episodes, the exact
    # bug this remap exists to prevent)
    if remapped.max(initial=0) > np.iinfo(ep_dtype).max:
        raise ValueError(
            f"migrated ep_ids exceed {ep_dtype} "
            f"(max {remapped.max()}): too many global envs "
            f"({n_old} shards x {n_envs_old} envs) for the "
            f"{_EP_STRIDE:#x} stride — widen replay ep_id dtype")
    ep_id = repack(remapped).astype(ep_dtype)
    # rows never written keep the "invalid" marker
    for j in range(n_new):
        ep_id[j * cap_new + sizes_new[j]:(j + 1) * cap_new] = -1
    # NOTE: the contiguous re-pack breaks the env-interleaved stride
    # layout replay_sample_window / the n-step path assume, so windows
    # over migrated rows degrade to length 1 (the same-ep check fails
    # loudly-false rather than silently-true thanks to the unique ids)
    # — conservative, never cross-episode.  New writes resume the
    # strided layout; their env_ep counters start past the old global
    # max so fresh ids cannot collide with migrated ones.

    base_key = jnp.asarray(np.asarray(raw["rng"])[0], jnp.uint32)
    new_rng = jax.random.split(
        jax.random.wrap_key_data(base_key, impl="threefry2x32"), n_new)
    new_rng = jax.random.key_data(new_rng)

    total_steps = int(np.asarray(raw["total_env_steps"]).sum())
    steps = np.full((n_new,), total_steps // n_new, np.int32)
    steps[0] += total_steps - int(steps.sum())

    template = jax.tree.map(lambda x: x, factory.init(
        jax.random.PRNGKey(0)))  # shardings + structure donor

    def like(leaf_template, value):
        return jax.device_put(
            jnp.asarray(np.asarray(value), leaf_template.dtype),
            leaf_template.sharding)

    def rebuild(sub_template, sub_raw):
        """Typed pytree from an Orbax raw dict, walking the template's
        key paths (raw dict key order is not flatten order)."""
        from ilswiss_tpu.runtime.checkpoint import _index_raw
        paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(
            sub_template)
        leaves = [like(leaf, _index_raw(sub_raw, key_path))
                  for key_path, leaf in paths_leaves]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    env_state = rebuild(template.env_state, raw["env_state"])
    algo_state = rebuild(template.algo_state, raw["algo_state"])

    replay = template.replay.replace(
        data={k: like(template.replay.data[k], v)
              for k, v in data.items()},
        ep_id=like(template.replay.ep_id, ep_id),
        ptr=like(template.replay.ptr, sizes_new % cap_new),
        size=like(template.replay.size, sizes_new),
        env_ep=like(template.replay.env_ep,
                    np.full(template.replay.env_ep.shape,
                            int(env_ep_old.max()) + 1,
                            np.int32)),
    )
    return RunnerState(
        rng=like(template.rng, new_rng),
        env_state=env_state,
        replay=replay,
        algo_state=algo_state,
        total_env_steps=like(template.total_env_steps, steps),
    )


class DistributedOnPolicyRunner:
    """Multi-chip ON-policy runner (PPO): shard_map over the ``env``
    mesh axis, completing the off-policy coverage above (SURVEY.md
    §2.5 row "Learner data parallelism").

    Every shard rolls out its own slice of the vectorized envs and
    computes PPO minibatch gradients over its local rollout; grads are
    `pmean`-reduced inside the trainer (algo.axis_name), so params stay
    replicated.  Observation-normalizer moments are psum-merged across
    shards (utils/running_stats.py), matching the reference's single
    global RunningMeanStd (vecenvs.py:102-107)."""

    def __init__(self, loop, mesh: Mesh, axis_name: str = "env"):
        from ilswiss_tpu.runtime.onpolicy import OnPolicyRunnerState

        assert getattr(loop.algo, "axis_name", None) == axis_name, (
            "algo must pmean grads over the mesh axis: pass "
            f"axis_name='{axis_name}' when constructing the trainer"
        )
        self.loop = loop
        self.mesh = mesh
        self.axis = axis_name
        self.n_shards = mesh.devices.size
        self._specs = OnPolicyRunnerState(
            rng=P(axis_name),
            env_state=P(axis_name),
            algo_state=P(),
            total_env_steps=P(axis_name),
            obs_rms=(P() if loop.config.normalize_obs else None),
        )

    @staticmethod
    def _to_local(r):
        return r.replace(rng=r.rng[0],
                         total_env_steps=r.total_env_steps[0])

    @staticmethod
    def _to_stacked(r):
        return r.replace(rng=r.rng[None],
                         total_env_steps=r.total_env_steps[None])

    def init(self, key: jax.Array):
        from ilswiss_tpu.runtime.onpolicy import OnPolicyRunnerState
        from ilswiss_tpu.utils.running_stats import running_mean_std_init

        loop, n = self.loop, self.n_shards
        env = loop.vec_env.env
        k_env, k_algo, k_rng = jax.random.split(key, 3)
        global_envs = n * loop.vec_env.num_envs
        env_state = jax.vmap(env.reset)(
            jax.random.split(k_env, global_envs))
        runner = OnPolicyRunnerState(
            rng=jax.random.split(k_rng, n),
            env_state=env_state,
            algo_state=loop.algo.init(k_algo),
            total_env_steps=jnp.zeros((n,), jnp.int32),
            obs_rms=(running_mean_std_init((env.observation_size,))
                     if loop.config.normalize_obs else None),
        )
        shardings = jax.tree.map(
            lambda spec: NamedSharding(self.mesh, spec),
            self._specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        return jax.device_put(runner, shardings)

    def build(self, steps_per_epoch: int):
        """(warmup, train_epoch) jitted over the mesh; steps_per_epoch
        is GLOBAL env steps."""
        per_shard = steps_per_epoch // self.n_shards
        warmup_fn, epoch_fn = self.loop.epoch_fns(per_shard)

        def shard_warmup(runner):
            return self._to_stacked(warmup_fn(self._to_local(runner)))

        def shard_epoch(runner):
            local, metrics = epoch_fn(self._to_local(runner))
            metrics = jax.lax.pmean(metrics, self.axis)
            return self._to_stacked(local), metrics

        smap = partial(shard_map, mesh=self.mesh, check_vma=False)
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
