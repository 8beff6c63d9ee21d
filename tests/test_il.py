"""Imitation-learning stack tests: demo buffers, BC, AdvIRL (GAIL).

The learning gates use a scripted pendulum expert (return ~ -165) as
the demo source, mirroring the reference's expert-pickle pipeline
(adv_irl_exp_script.py) without shipped binaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilswiss_tpu.algorithms.adv_irl import AdvIRL, AdvIRLConfig
from ilswiss_tpu.algorithms.bc import BC, BCConfig
from ilswiss_tpu.algorithms.sac import SAC, SACConfig
from ilswiss_tpu.data.demo import (
    load_demos_npz, save_demos_npz, subsample_trajs,
)
from ilswiss_tpu.envs import make_vec
from ilswiss_tpu.envs.experts import pendulum_expert
from ilswiss_tpu.runtime.collector import collect_transitions
from ilswiss_tpu.runtime.evaluator import make_evaluator
from ilswiss_tpu.runtime.loop import OffPolicyConfig, OffPolicyLoop
from ilswiss_tpu.runtime.offline import OfflineLoop


@pytest.fixture(scope="module")
def demos():
    vec = make_vec("pendulum", num_envs=8)
    return collect_transitions(
        vec, lambda obs, k: pendulum_expert(obs), 400, jax.random.PRNGKey(7)
    )


def test_collector_builds_valid_buffer(demos):
    assert int(demos.size) == 8 * 400
    assert demos.data["obs"].shape == (3200, 3)
    # episode ids distinguish resets: 8 envs x 2 episodes of 200 steps
    assert len(np.unique(np.asarray(demos.ep_id))) == 16
    # expert transitions have decent reward structure
    assert float(jnp.mean(demos.data["reward"])) > -5.0


def test_demo_npz_roundtrip(tmp_path, demos):
    p = str(tmp_path / "demos.npz")
    save_demos_npz(p, demos)
    loaded = load_demos_npz(p)
    np.testing.assert_allclose(loaded.data["obs"], demos.data["obs"])
    assert int(loaded.size) == int(demos.size)


def test_subsample_trajs(demos):
    sub = subsample_trajs(demos, 1)
    assert int(sub.size) < int(demos.size)
    assert len(np.unique(np.asarray(sub.ep_id))) == 1


@pytest.mark.slow
def test_bc_learns_from_expert(demos):
    # MSE mode: robust to the expert's clipped (+-1) actions, where
    # MLE's atanh saturates (a weakness shared with the reference's
    # tanh-Normal get_log_prob, distributions.py:85-88)
    bc = BC(3, 1, BCConfig(mode="MSE"), net_size=64, num_hidden_layers=2)
    loop = OfflineLoop(bc, demos, batch_size=128)
    _, epoch = loop.build(steps_per_epoch=2000)
    runner = loop.init(jax.random.PRNGKey(0))
    for _ in range(4):
        runner, metrics = epoch(runner)
    vec = make_vec("pendulum", num_envs=16)
    ev = make_evaluator(
        vec, lambda s, o, k: bc.act(s, o, k, deterministic=True), 200
    )
    ret = float(ev(runner.algo_state, jax.random.PRNGKey(1))["AverageReturn"])
    assert ret > -600, ret  # random ~ -1200, expert ~ -165


def test_bc_mle_mode(demos):
    bc = BC(3, 1, BCConfig(mode="MLE"), net_size=32, num_hidden_layers=1)
    loop = OfflineLoop(bc, demos, batch_size=64)
    _, epoch = loop.build(steps_per_epoch=50)
    runner = loop.init(jax.random.PRNGKey(0))
    runner, metrics = epoch(runner)
    assert np.isfinite(float(metrics["bc_loss"]))


def test_gail_mechanics(demos):
    sac = SAC(3, 1, SACConfig(reward_scale=2.0), net_size=32,
              num_hidden_layers=1)
    gail = AdvIRL(
        3, 1, sac, demos,
        AdvIRLConfig(
            mode="gail", disc_optim_batch_size=64,
            policy_optim_batch_size=64,
            num_disc_updates_per_loop_iter=2,
            num_policy_updates_per_loop_iter=2,
            disc_hid_dim=32, disc_use_bn=True,
        ),
    )
    vec = make_vec("pendulum", num_envs=4)
    loop = OffPolicyLoop(
        vec, gail,
        OffPolicyConfig(batch_size=64, replay_capacity=2048,
                        min_steps_before_training=64),
    )
    warmup, epoch = loop.build(steps_per_epoch=64)
    runner = loop.init(jax.random.PRNGKey(0))
    runner = warmup(runner)
    runner, metrics = epoch(runner)
    for k in ("disc_ce_loss", "disc_acc", "disc_grad_pen",
              "disc_rew_mean", "policy_qf1_loss"):
        assert np.isfinite(float(metrics[k])), k
    # gail rewards are softplus(logits) >= 0
    assert float(metrics["disc_rew_mean"]) >= 0.0


def test_reward_modes(demos):
    sac = SAC(3, 1, SACConfig(), net_size=16, num_hidden_layers=1)
    batch = {
        "obs": jnp.zeros((8, 3)), "action": jnp.zeros((8, 1)),
        "next_obs": jnp.zeros((8, 3)),
    }
    for mode, check in [
        ("gail", lambda r: np.all(r >= 0)),          # softplus >= 0
        ("gail2", lambda r: np.all(r <= 0)),         # log D <= 0
        ("airl", lambda r: np.all(np.abs(r) <= 10)), # clamped logits
        ("fairl", lambda r: np.isfinite(r).all()),
    ]:
        il = AdvIRL(3, 1, sac, demos,
                    AdvIRLConfig(mode=mode, disc_hid_dim=16,
                                 disc_use_bn=False))
        state = il.init(jax.random.PRNGKey(0))
        r = np.asarray(il.synthesize_rewards(state, batch))
        assert check(r), (mode, r)


@pytest.mark.slow
def test_gail_recovers_expert_behavior(demos):
    """GAIL end-to-end gate: from demos alone (disc rewards, no env
    reward), SAC recovers near-expert pendulum behavior within ~16k
    env steps (expert ~ -165, random ~ -1200)."""
    sac = SAC(3, 1, SACConfig(reward_scale=2.0, qf_lr=1e-3),
              net_size=64, num_hidden_layers=2)
    gail = AdvIRL(3, 1, sac, demos, AdvIRLConfig(
        mode="gail", disc_optim_batch_size=256,
        policy_optim_batch_size=256,
        num_disc_updates_per_loop_iter=1,
        num_policy_updates_per_loop_iter=8,
        disc_lr=3e-4, disc_momentum=0.9, disc_hid_dim=128,
        disc_hid_act="tanh", disc_use_bn=False))
    vec = make_vec("pendulum", num_envs=8)
    loop = OffPolicyLoop(
        vec, gail,
        OffPolicyConfig(batch_size=256, replay_capacity=50_000,
                        min_steps_before_training=500))
    warmup, epoch = loop.build(steps_per_epoch=4000)
    runner = warmup(loop.init(jax.random.PRNGKey(0)))
    for _ in range(4):
        runner, metrics = epoch(runner)
    ev = make_evaluator(
        vec, lambda s, o, k: gail.act(s, o, k, deterministic=True), 200)
    ret = float(ev(runner.algo_state, jax.random.PRNGKey(9))["AverageReturn"])
    assert ret > -400, ret


def test_disc_separates_separable_data(demos):
    # disc trained on trivially separable expert-vs-policy data reaches
    # high accuracy — sanity for BCE sign and target order
    sac = SAC(3, 1, SACConfig(), net_size=16, num_hidden_layers=1)
    il = AdvIRL(3, 1, sac, demos,
                AdvIRLConfig(mode="gail", disc_hid_dim=32,
                             disc_use_bn=False, use_grad_pen=False,
                             disc_optim_batch_size=128, disc_lr=1e-3))
    state = il.init(jax.random.PRNGKey(0))
    # fake "policy" replay whose obs are shifted far from expert's
    from ilswiss_tpu.data.demo import demos_to_replay_state
    n = 1000
    fake = demos_to_replay_state(
        np.random.randn(n, 3) + 10.0, np.random.randn(n, 1),
        np.zeros(n), np.random.randn(n, 3) + 10.0, np.zeros(n),
    )
    step = jax.jit(lambda s, k: il._disc_update(s, fake, k))
    key = jax.random.PRNGKey(1)
    for i in range(200):
        key, k = jax.random.split(key)
        state, m = step(state, k)
    assert float(m["disc_acc"]) > 0.95, float(m["disc_acc"])


def test_gail_rnn_disc_epoch(demos):
    """Trajectory-disc GAIL (reference rnn_disc_models.py path): disc
    trains on [Bw, T] windows with per-step logits, policy trains on
    flattened windows with in-context per-step rewards."""
    from ilswiss_tpu.data.replay import replay_sample_window

    win = replay_sample_window(demos, jax.random.PRNGKey(0), 6, 12)
    assert win["obs"].shape == (6, 12, 3)
    assert win["valid"].shape == (6, 12)
    assert bool(win["valid"][:, 0].all())

    sac = SAC(3, 1, SACConfig(), net_size=32, num_hidden_layers=1)
    gail = AdvIRL(3, 1, sac, demos, AdvIRLConfig(
        mode="gail", disc_type="rnn", disc_traj_len=8,
        disc_hid_dim=32, disc_rnn_layers=1,
        disc_optim_batch_size=64, policy_optim_batch_size=64,
    ))
    vec = make_vec("pendulum", num_envs=4)
    loop = OffPolicyLoop(
        vec, gail,
        OffPolicyConfig(batch_size=64, replay_capacity=2048,
                        min_steps_before_training=64),
    )
    warmup, epoch = loop.build(steps_per_epoch=64)
    runner = warmup(loop.init(jax.random.PRNGKey(0)))
    runner, metrics = epoch(runner)
    for k in ("disc_ce_loss", "disc_acc", "disc_grad_pen",
              "disc_rew_mean", "policy_qf1_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["disc_rew_mean"]) >= 0.0  # gail softplus


def test_visual_gail_cnn_disc_epoch():
    """Visual GAIL end-to-end on pendulum_pixels: CNN disc on (image,
    action), demo buffer of image transitions, fused loop epoch."""
    vec = make_vec("pendulum_pixels", num_envs=2)
    demos = collect_transitions(
        vec, lambda obs, k: jax.random.uniform(k, (2, 1), minval=-1.0,
                                               maxval=1.0),
        60, jax.random.PRNGKey(3),
    )
    obs_shape = vec.env.observation_size
    sac = SAC(int(np.prod(obs_shape)), 1, SACConfig(), net_size=32,
              num_hidden_layers=1)

    # flatten-image SAC adapter: the inner trainer sees flat obs
    class FlatSAC:
        def __init__(self, sac):
            self.sac = sac
        def init(self, key):
            return self.sac.init(key)
        def act(self, state, obs, key, deterministic=False):
            return self.sac.act(
                state, obs.reshape(obs.shape[0], -1).astype(jnp.float32)
                / 255.0, key, deterministic=deterministic)
        def train_step(self, state, batch, key):
            b = dict(batch)
            for k in ("obs", "next_obs"):
                b[k] = (batch[k].reshape(batch[k].shape[0], -1)
                        .astype(jnp.float32) / 255.0)
            return self.sac.train_step(state, b, key)

    gail = AdvIRL(int(np.prod(obs_shape)), 1, FlatSAC(sac), demos,
                  AdvIRLConfig(
                      mode="gail", disc_type="cnn", disc_hid_dim=32,
                      disc_num_blocks=2, disc_num_filters=8,
                      disc_optim_batch_size=16,
                      policy_optim_batch_size=16,
                      grad_pen_weight=1.0,
                  ))
    loop = OffPolicyLoop(
        vec, gail,
        OffPolicyConfig(batch_size=16, replay_capacity=512,
                        min_steps_before_training=16),
    )
    warmup, epoch = loop.build(steps_per_epoch=8)
    runner = warmup(loop.init(jax.random.PRNGKey(0)))
    runner, metrics = epoch(runner)
    for k in ("disc_ce_loss", "disc_acc", "disc_rew_mean"):
        assert np.isfinite(float(metrics[k])), k
