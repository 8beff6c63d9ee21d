"""ilswiss_tpu — a TPU-native imitation-learning + RL framework.

A from-scratch JAX/XLA/pjit/Pallas rebuild of the capabilities of the
ILSwiss research framework (reference: Ericonaldo/ILSwiss).  Instead of the
reference's host-Python loop (subprocess vec-envs -> per-transition Python
bookkeeping -> torch train calls), everything here is pure functions over a
single train-state pytree, fused into one jitted `lax.scan`:

    state, metrics = train_epoch(state)

Layer map (mirrors SURVEY.md §7):
  - ilswiss_tpu.envs       vmapped pure-JAX env engine (envpool/SubprocVectorEnv
                           equivalent; reference rlkit/envs/vecenvs.py)
  - ilswiss_tpu.data       device-resident replay / rollout buffers
                           (reference rlkit/data_management/)
  - ilswiss_tpu.models     networks, distributions, policies
                           (reference rlkit/torch/common/)
  - ilswiss_tpu.algorithms trainers as pure grad-step fns
                           (reference rlkit/torch/algorithms/)
  - ilswiss_tpu.runtime    fused actor-learner loops + evaluator
                           (reference rlkit/core/base_algorithm.py)
  - ilswiss_tpu.parallel   mesh/sharding helpers (DP + env-axis sharding)
  - ilswiss_tpu.logging    csv/tabular/tensorboard metric sinks
                           (reference rlkit/core/logger.py)
  - ilswiss_tpu.launchers  YAML experiment specs + variant grids
                           (reference run_experiment.py, rlkit/launchers/)
"""

__version__ = "0.1.0"
