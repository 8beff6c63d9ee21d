"""Multi-device (8 virtual CPU) sharded off-policy runner tests:
params stay replicated under pmean'd grads; env/replay shard cleanly."""

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.algorithms.sac import SAC, SACConfig
from ilswiss_tpu.envs import make_vec
from ilswiss_tpu.parallel.distributed import DistributedOffPolicyRunner
from ilswiss_tpu.parallel.mesh import make_mesh
from ilswiss_tpu.runtime.loop import OffPolicyConfig, OffPolicyLoop


def _build(n_devices=8, envs_per_shard=2):
    mesh = make_mesh(n_devices)
    vec = make_vec("pendulum", num_envs=envs_per_shard)
    sac = SAC(
        obs_size=3, action_size=1,
        config=SACConfig(reward_scale=2.0),
        net_size=32, num_hidden_layers=1,
        axis_name="env",
    )
    loop = OffPolicyLoop(
        vec, sac,
        OffPolicyConfig(
            batch_size=32, replay_capacity=512,
            min_steps_before_training=16, grad_steps_per_iter=2,
        ),
    )
    return mesh, loop, DistributedOffPolicyRunner(loop, mesh)


def test_distributed_epoch_runs():
    mesh, loop, runner_factory = _build()
    runner = runner_factory.init(jax.random.PRNGKey(0))
    warmup, epoch = runner_factory.build(steps_per_epoch=8 * 16)
    runner = warmup(runner)
    runner, metrics = epoch(runner)
    assert np.isfinite(float(metrics["qf1_loss"]))
    # every shard advanced its own env steps
    assert runner.total_env_steps.shape == (8,)
    steps = np.asarray(jax.device_get(runner.total_env_steps))
    assert np.all(steps == steps[0]) and steps[0] > 0


def test_params_stay_replicated():
    mesh, loop, runner_factory = _build()
    runner = runner_factory.init(jax.random.PRNGKey(0))
    warmup, epoch = runner_factory.build(steps_per_epoch=8 * 16)
    runner = warmup(runner)
    runner, _ = epoch(runner)
    # pull the replicated policy params from each device and compare:
    # pmean'd grads + identical init must keep them bitwise-close
    leaves = jax.tree.leaves(runner.algo_state.policy_params)
    for leaf in leaves:
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_allclose(s, shards[0], rtol=1e-6, atol=1e-6)


def test_shards_see_distinct_envs():
    mesh, loop, runner_factory = _build()
    runner = runner_factory.init(jax.random.PRNGKey(0))
    obs = np.asarray(jax.device_get(runner.env_state.obs))
    assert obs.shape == (16, 3)
    assert len(np.unique(obs[:, 2])) == 16  # all envs distinct across shards


def test_distributed_matches_single_device_grad_semantics():
    # With pmean over shards, training is equivalent to a larger-batch
    # single-device run in expectation; here we just check the sharded
    # replay filled independently per shard.
    mesh, loop, runner_factory = _build()
    runner = runner_factory.init(jax.random.PRNGKey(0))
    warmup, epoch = runner_factory.build(steps_per_epoch=8 * 16)
    runner = warmup(runner)
    sizes = np.asarray(jax.device_get(runner.replay.size))
    assert sizes.shape == (8,)
    assert np.all(sizes == sizes[0]) and sizes[0] >= 16
