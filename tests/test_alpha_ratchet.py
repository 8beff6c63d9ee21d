"""Root-cause test for the adversarial-IL alpha ratchet (VERDICT r3 #7).

Mechanism: SAC's alpha loss is -mean(log_alpha * (log_pi + H_target)).
With Adam, the log_alpha step size is ~alpha_lr per update REGARDLESS of
the deficit magnitude — so whenever the entropy deficit (log_pi above
-H_target) persists without ever flipping sign, log_alpha marches up
linearly and alpha grows EXPONENTIALLY (round-3 GAIL-hopper: 3e-4/step
x ~6e4 steps = e^18, matching the observed 0.37 -> 2.5e8).

The deficit persists when the reward scale swamps the alpha*log_pi term
in the policy objective: the policy saturates at the tanh bounds (large
positive log_pi) and the entropy bonus is too small to pull it back
until alpha is astronomically large — by which point alpha has entered
the Q targets and diverged them.

These tests reproduce both halves on CPU in miniature and pin the fix
(AdvIRLConfig.reward_norm: running-std division of synthesized rewards,
algorithms/adv_irl.py:_normalize_rewards): at unit reward scale the
alpha controller reaches equilibrium and the sac.py [1e-6, 10] clamp is
inert safety, not the thing holding the run together.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ilswiss_tpu.algorithms.sac import SAC, SACConfig


def _ratchet_run(reward_scale_factor: float, steps: int = 1500,
                 alpha_lr: float = 3e-3):
    """Drive SAC train_steps on a fixed saturation-inducing batch
    distribution: reward = scale * sum(actions), optimum = all actions
    pinned at +1 (maximum tanh saturation -> persistently low entropy).
    Returns the alpha trajectory."""
    obs_size, act_size = 4, 2
    sac = SAC(obs_size, act_size,
              SACConfig(alpha_lr=alpha_lr, max_alpha=1e12),
              net_size=32, num_hidden_layers=1)
    state = sac.init(jax.random.PRNGKey(0))

    def batch_of(key):
        ko, ka = jax.random.split(key)
        obs = jax.random.normal(ko, (64, obs_size))
        act = jnp.clip(jax.random.normal(ka, (64, act_size)) * 0.5
                       + 0.8, -1.0, 1.0)
        rew = reward_scale_factor * jnp.sum(act, axis=-1)
        return {
            "obs": obs, "action": act, "reward": rew,
            "next_obs": obs + 0.01, "terminal": jnp.zeros((64,)),
        }

    @jax.jit
    def step(state, key):
        k_b, k_t = jax.random.split(key)
        state, m = sac.train_step(state, batch_of(k_b), k_t)
        return state, m["alpha"]

    alphas = []
    keys = jax.random.split(jax.random.PRNGKey(1), steps)
    for i in range(steps):
        state, a = step(state, keys[i])
        if i % 100 == 0 or i == steps - 1:
            alphas.append(float(a))
    return np.asarray(alphas)


def test_large_reward_scale_ratchets_alpha():
    """With rewards 100x the entropy scale, the deficit never flips:
    after the initial transient, log_alpha marches up at ~alpha_lr per
    step — Adam's sign-following rate, the exponential-alpha ratchet."""
    alpha_lr = 3e-3
    alphas = _ratchet_run(reward_scale_factor=100.0, steps=3000,
                          alpha_lr=alpha_lr)
    # sampled every 100 steps; the deficit stays positive for thousands
    # of steps, so log_alpha climbs monotonically...
    tail = np.log(alphas[8:])
    rates = np.diff(tail) / 100.0            # per-step log_alpha rate
    assert np.all(rates > 0), (rates, alphas)
    # ...initially at 50-110% of alpha_lr (Adam's sign-following rate —
    # in the real GAIL run this persisted for 6e4 steps = e^18 alpha)
    assert np.all(rates[:8] > 0.5 * alpha_lr), (rates, alphas)
    assert np.all(rates < 1.1 * alpha_lr), (rates, alphas)
    # spanning well over an order of magnitude from the trough
    assert alphas[-1] > 20.0 * alphas.min(), alphas


def test_unit_reward_scale_equilibrates_alpha():
    """Same dynamics at unit reward scale (what reward_norm produces):
    the entropy term competes, the deficit flips, alpha stays bounded
    well inside the sac.py clamp (which is then inert safety)."""
    alphas = _ratchet_run(reward_scale_factor=1.0)
    assert alphas[-1] < 10.0 * alphas[0] + 1.0, alphas
    assert alphas[-1] < 5.0, alphas  # far from the max_alpha=10 clamp


def test_reward_norm_rescales_to_unit_std():
    """AdvIRL's running-std normalizer maps an arbitrary disc-reward
    scale to ~unit std without changing signs."""
    from ilswiss_tpu.algorithms.adv_irl import AdvIRL, AdvIRLConfig
    from ilswiss_tpu.data.replay import replay_init

    class _StubTrainer:
        def init(self, key):
            return ()

        def act(self, s, o, k, deterministic=False):
            return jnp.zeros((o.shape[0], 1))

        def train_step(self, s, batch, k):
            return s, {"stub": jnp.zeros(())}

    expert = replay_init(64, 3, 1, write_batch=1)
    adv = AdvIRL(3, 1, _StubTrainer(), expert,
                 AdvIRLConfig(reward_norm=True, disc_use_bn=False))
    state = adv.init(jax.random.PRNGKey(0))
    rew = 250.0 * jax.random.normal(jax.random.PRNGKey(1), (4096,)) + 30.0
    state, out1 = adv._normalize_rewards(state, rew)
    state, out2 = adv._normalize_rewards(state, rew)
    # running std converges to the true scale; signs preserved
    assert 0.8 < float(jnp.std(out2)) < 1.25
    np.testing.assert_array_equal(np.sign(np.asarray(out2)),
                                  np.sign(np.asarray(rew)))


def test_reward_norm_ignores_masked_padding():
    """ADVICE r4 (low): with rnn-disc windows the flattened batch holds
    rewards zeroed by the validity mask; those padding rows must not
    deflate the running std.  A batch that is half padding must produce
    the same normalization as the valid half alone."""
    from ilswiss_tpu.algorithms.adv_irl import AdvIRL, AdvIRLConfig
    from ilswiss_tpu.data.replay import replay_init

    class _StubTrainer:
        def init(self, key):
            return ()

        def act(self, s, o, k, deterministic=False):
            return jnp.zeros((o.shape[0], 1))

        def train_step(self, s, batch, k):
            return s, {"stub": jnp.zeros(())}

    expert = replay_init(64, 3, 1, write_batch=1)
    adv = AdvIRL(3, 1, _StubTrainer(), expert,
                 AdvIRLConfig(reward_norm=True, disc_use_bn=False))
    valid_rew = 100.0 * jax.random.normal(jax.random.PRNGKey(2), (2048,))
    padded = jnp.concatenate([valid_rew, jnp.zeros((2048,))])
    weight = jnp.concatenate([jnp.ones((2048,)), jnp.zeros((2048,))])

    s_masked = adv.init(jax.random.PRNGKey(0))
    s_masked, out_masked = adv._normalize_rewards(s_masked, padded, weight)
    s_plain = adv.init(jax.random.PRNGKey(0))
    s_plain, out_plain = adv._normalize_rewards(s_plain, valid_rew)
    np.testing.assert_allclose(np.asarray(out_masked[:2048]),
                               np.asarray(out_plain), rtol=1e-6)
    # the unmasked (buggy) stats would halve the variance -> ~sqrt(2)
    # over-scaling; pin that the masked std estimate is the valid one
    n, mean, m2 = s_masked.rew_stats
    assert abs(float(n) - 2048.0) < 1e-3
