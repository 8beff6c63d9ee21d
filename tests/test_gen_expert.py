"""gen_expert launcher: scripted demo generation + per-episode
subsampling (reference run_scripts/gen_expert_demos.py semantics)."""

import os

import numpy as np
import yaml

from ilswiss_tpu.launchers.experiments import (
    _subsample_transitions, run_gen_expert,
)
from ilswiss_tpu.data.demo import demos_to_replay_state


def test_subsample_keeps_every_kth_per_episode():
    n = 40
    obs = np.arange(n, dtype=np.float32)[:, None]
    ep = np.repeat(np.arange(4, dtype=np.int32), 10)
    st = demos_to_replay_state(
        obs, obs.copy(), np.zeros(n, np.float32), obs.copy(),
        np.zeros(n, np.float32), ep)
    sub = _subsample_transitions(st, 5, seed=0)
    # each 10-step episode keeps exactly 2 transitions at stride 5
    assert int(sub.size) == 8
    kept_ep = np.asarray(sub.ep_id)
    assert all((kept_ep == e).sum() == 2 for e in range(4))
    # stride within each episode is exactly the factor
    kept = np.asarray(sub.data["obs"]).ravel().astype(int)
    for e in range(4):
        rows = kept[kept_ep == e]
        assert rows[1] - rows[0] == 5


def test_run_gen_expert_scripted(tmp_path):
    spec = yaml.safe_load(open("exp_specs/gen_expert/pendulum.yaml"))
    v = dict(spec["constants"])
    v.update(
        log_dir=str(tmp_path / "log"),
        save_path=str(tmp_path / "pend.npz"),
        demos_listing=str(tmp_path / "listing.yaml"),
        num_rollouts=2, max_path_length=50, subsample_factor=2,
        print_to_console=False,
    )
    v["env_specs"] = dict(v["env_specs"], env_num=2)
    out = run_gen_expert(v)
    assert os.path.exists(out)
    d = np.load(out)
    # 2 rollouts x 50 steps, subsampled by 2
    assert d["obs"].shape == (50, 3)
    listing = yaml.safe_load(open(v["demos_listing"]))
    assert listing["pendulum_expert"]["file_path"] == out
    assert listing["pendulum_expert"]["num_transitions"] == 50
