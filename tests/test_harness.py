"""Harness layer: variant grids, logger sinks, checkpoints, end-to-end
spec run (the reference's launcher/logger subsystem, SURVEY.md §2.1/§5.4-5.6)."""

import csv
import os

import jax
import numpy as np
import pytest
import yaml

from ilswiss_tpu.launchers.variant import (
    build_variants, check_exp_spec_format, flatten_dict, unflatten_dict,
)
from ilswiss_tpu.logging.logger import Logger


def test_flatten_unflatten_roundtrip():
    d = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = flatten_dict(d)
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
    assert unflatten_dict(flat) == d


def test_build_variants_grid():
    spec = {
        "meta_data": {"algorithm": "sac"},
        "variables": {"seed": [0, 1, 2], "sac_params": {"qf_lr": [1e-3, 3e-4]}},
        "constants": {"net_size": 64, "sac_params": {"discount": 0.99}},
    }
    variants = build_variants(spec)
    assert len(variants) == 6
    assert {v["exp_id"] for v in variants} == set(range(6))
    # constants merged, variables overlaid without clobbering siblings
    for v in variants:
        assert v["net_size"] == 64
        assert v["sac_params"]["discount"] == 0.99
        assert v["sac_params"]["qf_lr"] in (1e-3, 3e-4)
    assert len({(v["seed"], v["sac_params"]["qf_lr"])
                for v in variants}) == 6


def test_no_variables_gives_single_variant():
    spec = {"meta_data": {}, "constants": {"x": 1}}
    variants = build_variants(spec)
    assert len(variants) == 1 and variants[0]["x"] == 1


def test_spec_format_validation():
    with pytest.raises(ValueError):
        check_exp_spec_format({"constants": {}})
    with pytest.raises(ValueError):
        check_exp_spec_format(
            {"meta_data": {}, "variables": {"seed": 3}}
        )
    with pytest.raises(ValueError):
        check_exp_spec_format({"meta_data": {}, "bogus": {}})


def test_logger_csv_and_late_keys(tmp_path):
    lg = Logger(str(tmp_path), print_to_console=False)
    lg.record_tabular("a", 1.0)
    lg.dump_tabular(0)
    lg.record_tabular("a", 2.0)
    lg.record_tabular("b", 3.0)  # late-appearing key
    lg.dump_tabular(1)
    with open(os.path.join(str(tmp_path), "progress.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert rows[1]["b"] == "3.0"
    assert rows[0]["b"] == ""  # back-filled header


def test_checkpoint_roundtrip(tmp_path):
    from ilswiss_tpu.algorithms.sac import SAC, SACConfig
    from ilswiss_tpu.runtime.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )
    sac = SAC(3, 1, SACConfig(), net_size=16, num_hidden_layers=1)
    state = sac.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    template = sac.init(jax.random.PRNGKey(1))  # different values
    restored = restore_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(state.policy_params),
                    jax.tree.leaves(restored.policy_params)):
        np.testing.assert_allclose(a, b)


def test_snapshot_resume_roundtrip(tmp_path):
    """SnapshotManager 'last' + meta -> restore_run returns the state
    and the next epoch (reference load_from_file semantics)."""
    from ilswiss_tpu.algorithms.sac import SAC, SACConfig
    from ilswiss_tpu.runtime.checkpoint import SnapshotManager, restore_run
    sac = SAC(3, 1, SACConfig(), net_size=16, num_hidden_layers=1)
    state = sac.init(jax.random.PRNGKey(0))
    snap = SnapshotManager(str(tmp_path), mode="gap_and_last", gap=10)
    snap.on_epoch(4, state, {"AverageReturn": 1.0})
    template = sac.init(jax.random.PRNGKey(1))
    # accepts the run log_dir directly
    restored, next_epoch = restore_run(str(tmp_path), template)
    assert next_epoch == 5
    for a, b in zip(jax.tree.leaves(state.policy_params),
                    jax.tree.leaves(restored.policy_params)):
        np.testing.assert_allclose(a, b)


def test_light_snapshot_marks_meta_and_restores_algo_state(tmp_path):
    """last_state_fn (params-only 'last'): meta.json records light=true,
    restore_subtree recovers the algo state — the resume contract for
    runs whose full replay-ring fetch would dominate wall-clock (the
    round-5 finger-spin postmortem: 807 s/save vs 151 s/epoch)."""
    from ilswiss_tpu.algorithms.sac import SAC, SACConfig
    from ilswiss_tpu.runtime.checkpoint import (
        SnapshotManager, restore_subtree, snapshot_meta,
    )
    sac = SAC(3, 1, SACConfig(), net_size=16, num_hidden_layers=1)
    state = sac.init(jax.random.PRNGKey(0))

    class FakeRunner:
        algo_state = state

    snap = SnapshotManager(
        str(tmp_path), mode="gap_last", gap=4, save_best=False,
        last_state_fn=lambda r: {"algo_state": r.algo_state})
    snap.on_epoch(8, FakeRunner(), {"AverageReturn": 1.0})
    meta = snapshot_meta(str(tmp_path))
    assert meta.get("light") is True and meta["epoch"] == 8
    template = sac.init(jax.random.PRNGKey(1))
    restored = restore_subtree(
        str(tmp_path / "checkpoints" / "last"), template,
        key="algo_state")
    for a, b in zip(jax.tree.leaves(state.policy_params),
                    jax.tree.leaves(restored.policy_params)):
        np.testing.assert_allclose(a, b)


@pytest.mark.slow
def test_run_experiment_end_to_end(tmp_path):
    """Tiny SAC spec through the full scheduler path."""
    spec = {
        "meta_data": {"algorithm": "sac", "exp_name": "t"},
        "variables": {"seed": [0]},
        "constants": {
            "net_size": 32, "num_hidden_layers": 1,
            "log_dir": str(tmp_path / "run"),
            "print_to_console": False,
            "rl_alg_params": {
                "num_epochs": 2, "num_steps_per_epoch": 64,
                "num_steps_between_train_calls": 8,
                "num_train_steps_per_train_call": 8,
                "max_path_length": 100,
                "min_steps_before_training": 32,
                "batch_size": 32, "replay_buffer_size": 1024,
                "freq_saving": 1,
            },
            "sac_params": {"reward_scale": 2.0},
            "env_specs": {"env_name": "pendulum", "env_num": 4},
        },
    }
    from ilswiss_tpu.launchers.experiments import run_sac
    from ilswiss_tpu.launchers.variant import build_variants
    variants = build_variants(spec)
    run_sac(variants[0])
    csv_path = tmp_path / "run" / "progress.csv"
    assert csv_path.exists()
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert "AverageReturn" in rows[0]
    assert (tmp_path / "run" / "checkpoints").exists()
    assert (tmp_path / "run" / "variant.json").exists()


def test_run_dagger_end_to_end(tmp_path):
    """DAgger runner: scripted expert + seeded demos through the
    variant path (reference run_scripts/dagger_exp_script.py)."""
    import jax.random as jr

    from ilswiss_tpu.data.demo import save_demos_npz
    from ilswiss_tpu.envs import make_vec
    from ilswiss_tpu.envs.experts import pendulum_expert
    from ilswiss_tpu.launchers.experiments import run_dagger
    from ilswiss_tpu.runtime.collector import collect_transitions

    vec = make_vec("pendulum", num_envs=4)
    demos = collect_transitions(
        vec, lambda o, k: pendulum_expert(o), 50, jr.PRNGKey(0))
    demo_path = str(tmp_path / "demos.npz")
    save_demos_npz(demo_path, demos)

    variant = {
        "seed": 0,
        "demo_path": demo_path,
        "scripted_expert": "ilswiss_tpu.envs.experts:pendulum_expert",
        "policy_net_size": 32,
        "policy_num_hidden_layers": 1,
        "log_dir": str(tmp_path / "run"),
        "print_to_console": False,
        "dagger_params": {
            "mode": "MSE",
            "num_epochs": 2,
            "num_steps_per_epoch": 32,
            "num_initial_train_steps": 4,
            "batch_size": 32,
            "replay_buffer_size": 2048,
            "max_path_length": 50,
        },
        "env_specs": {"env_name": "pendulum", "env_num": 4},
    }
    run_dagger(variant)
    csv_path = tmp_path / "run" / "progress.csv"
    assert csv_path.exists()
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2 and "AverageReturn" in rows[0]


def test_run_eval_policy_end_to_end(tmp_path):
    """eval_policy runner: checkpoint -> stats + saved samples
    (reference run_scripts/evaluate_policy.py)."""
    from ilswiss_tpu.algorithms.sac import SAC, SACConfig
    from ilswiss_tpu.data.demo import load_demos_npz
    from ilswiss_tpu.launchers.experiments import run_eval_policy
    from ilswiss_tpu.runtime.checkpoint import save_checkpoint

    sac = SAC(3, 1, SACConfig(), net_size=16, num_hidden_layers=1)
    state = sac.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"algo_state": state})

    variant = {
        "seed": 0,
        "policy_checkpoint": ckpt,
        "policy_net_size": 16,
        "policy_num_hidden_layers": 1,
        "max_path_length": 50,
        "num_eval_steps": 64,
        "save_samples": True,
        "log_dir": str(tmp_path / "run"),
        "print_to_console": False,
        "env_specs": {"env_name": "pendulum", "env_num": 4},
    }
    stats = run_eval_policy(variant)
    assert np.isfinite(stats["AverageReturn"])
    saved = load_demos_npz(str(tmp_path / "run" / "eval_samples.npz"))
    assert int(saved.size) == 64


def test_nan_guard_and_preemption_flag():
    import os
    import signal

    import numpy as np
    import pytest

    from ilswiss_tpu.utils.guards import (
        NonFiniteMetricError, PreemptionGuard, check_finite_metrics,
    )

    msgs = []
    assert check_finite_metrics({"a": 1.0}, 0, msgs.append)
    assert not check_finite_metrics({"a": float("nan")}, 1, msgs.append)
    assert "NON-FINITE" in msgs[0]
    with pytest.raises(NonFiniteMetricError):
        check_finite_metrics({"q": np.inf}, 2, msgs.append, abort=True)

    guard = PreemptionGuard(signals=(signal.SIGUSR1,))
    assert not guard.should_stop
    os.kill(os.getpid(), signal.SIGUSR1)
    assert guard.should_stop
    guard.restore()
