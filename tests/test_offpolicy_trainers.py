"""Every off-policy trainer runs in the generic loop and learns finitely.

Mirrors the reference's per-trainer coverage of
rlkit/torch/algorithms/{sac,td3,ddpg,discrete_sac,dqn}.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilswiss_tpu.algorithms import (
    DDPG, DDPGConfig, DQN, DQNConfig, DiscreteSAC, DiscreteSACConfig,
    SAC, SACConfig, SACV, SACVConfig, TD3, TD3Config,
)
from ilswiss_tpu.envs import make_vec
from ilswiss_tpu.runtime.evaluator import make_evaluator
from ilswiss_tpu.runtime.loop import OffPolicyConfig, OffPolicyLoop


def _run_one_epoch(env_name, algo, num_envs=4, steps=64):
    vec = make_vec(env_name, num_envs=num_envs)
    loop = OffPolicyLoop(
        vec, algo,
        OffPolicyConfig(batch_size=32, replay_capacity=2048,
                        min_steps_before_training=64,
                        grad_steps_per_iter=2),
    )
    warmup, epoch = loop.build(steps_per_epoch=steps)
    runner = loop.init(jax.random.PRNGKey(0))
    runner = warmup(runner)
    runner, metrics = epoch(runner)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    ev = make_evaluator(
        vec, lambda s, o, k: algo.act(s, o, k, deterministic=True),
        max_path_length=50,
    )
    stats = ev(runner.algo_state, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["AverageReturn"]))
    return runner, metrics


CONTINUOUS = [
    ("sac", lambda: SAC(3, 1, SACConfig(), net_size=32,
                        num_hidden_layers=1)),
    ("sac_v", lambda: SACV(3, 1, SACVConfig(alpha=0.2), net_size=32,
                           num_hidden_layers=1)),
    ("td3", lambda: TD3(3, 1, TD3Config(), net_size=32,
                        num_hidden_layers=1)),
    ("ddpg", lambda: DDPG(3, 1, DDPGConfig(), net_size=32,
                          num_hidden_layers=1)),
]

DISCRETE = [
    ("discrete_sac", lambda: DiscreteSAC(4, 2, DiscreteSACConfig(alpha=0.2),
                                         net_size=32, num_hidden_layers=1)),
    ("dqn", lambda: DQN(4, 2, DQNConfig(), net_size=32,
                        num_hidden_layers=1)),
]


@pytest.mark.parametrize("name,ctor", CONTINUOUS, ids=[c[0] for c in CONTINUOUS])
def test_continuous_trainer_in_loop(name, ctor):
    _run_one_epoch("pendulum", ctor())


@pytest.mark.parametrize("name,ctor", DISCRETE, ids=[d[0] for d in DISCRETE])
def test_discrete_trainer_in_loop(name, ctor):
    _run_one_epoch("cartpole", ctor())


def test_td3_delayed_update():
    td3 = TD3(3, 1, TD3Config(policy_and_target_update_period=2),
              net_size=16, num_hidden_layers=1)
    state = td3.init(jax.random.PRNGKey(0))
    batch = {
        "obs": jnp.zeros((8, 3)),
        "action": jnp.zeros((8, 1)),
        "reward": jnp.ones((8,)),
        "terminal": jnp.zeros((8,)),
        "next_obs": jnp.zeros((8, 3)),
    }
    p0 = jax.tree.leaves(state.policy_params)[0]
    # step 0: counter==0 -> policy updates
    state1, _ = td3.train_step(state, batch, jax.random.PRNGKey(1))
    p1 = jax.tree.leaves(state1.policy_params)[0]
    assert not np.allclose(p0, p1)
    # step 1: counter==1 -> policy frozen
    state2, _ = td3.train_step(state1, batch, jax.random.PRNGKey(2))
    p2 = jax.tree.leaves(state2.policy_params)[0]
    np.testing.assert_allclose(p1, p2)


def test_dqn_epsilon_decay():
    dqn = DQN(4, 2, DQNConfig(epsilon_start=1.0, epsilon_end=0.1,
                              epsilon_decay_steps=100), net_size=16,
              num_hidden_layers=1)
    state = dqn.init(jax.random.PRNGKey(0))
    assert float(dqn.epsilon(state)) == 1.0
    state = state.replace(n_act_steps=jnp.asarray(100, jnp.int32))
    np.testing.assert_allclose(float(dqn.epsilon(state)), 0.1, rtol=1e-5)
