"""RNN/CNN discriminators, vistools, gen_demos CLI."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np


def test_rnn_disc_shapes():
    from ilswiss_tpu.models.rnn_discriminators import RNNDisc
    for cell in ("gru", "lstm"):
        disc = RNNDisc(hid_dim=16, cell_type=cell)
        traj = jnp.zeros((4, 20, 7))  # [B, T, obs+act]
        params = disc.init(jax.random.PRNGKey(0), traj)
        logits = disc.apply(params, traj)
        # per-step logits, reference shape (rnn_disc_models.py forward)
        assert logits.shape == (4, 20, 1)
        assert float(jnp.max(jnp.abs(logits))) <= 10.0


def test_cnn_disc_shapes():
    from ilswiss_tpu.models.rnn_discriminators import CNNDisc
    disc = CNNDisc(num_filters=8, num_layers=2, hid_dim=16)
    imgs = jnp.zeros((4, 64, 64, 3))
    params = disc.init(jax.random.PRNGKey(0), imgs)
    logits = disc.apply(params, imgs)
    assert logits.shape == (4, 1)


def test_vistools_plot_and_video(tmp_path):
    from ilswiss_tpu.logging.vistools import (
        plot_histogram, plot_learning_curves, save_video,
    )
    csv_path = tmp_path / "progress.csv"
    csv_path.write_text(
        "Epoch,AverageReturn\n0,1.0\n1,2.0\n2,3.0\n")
    out = plot_learning_curves(
        [str(csv_path)], "AverageReturn",
        save_path=str(tmp_path / "curve.png"))
    assert os.path.getsize(out) > 1000
    out = plot_histogram([1, 2, 2, 3], str(tmp_path / "hist.png"))
    assert os.path.exists(out)
    frames = np.random.rand(5, 32, 32, 3).astype(np.float32)
    # mp4 if an ffmpeg backend exists, else the gif fallback
    out = save_video(frames, str(tmp_path / "v.mp4"), fps=5)
    assert os.path.getsize(out) > 500


def test_gen_demos_cli(tmp_path):
    out = tmp_path / "demos.npz"
    listing = tmp_path / "listing.yaml"
    r = subprocess.run(
        [sys.executable, "scripts/gen_demos.py",
         "--env", "pendulum", "--expert", "scripted",
         "--num-envs", "2", "--steps-per-env", "10",
         "--out", str(out), "--listing", str(listing),
         "--platform", "cpu"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert out.exists() and listing.exists()
    from ilswiss_tpu.data.demo import load_demos_npz
    demos = load_demos_npz(str(out))
    assert int(demos.size) == 20


def test_phase_timer_accumulates_and_stamps():
    """gtimer-equivalent phase accounting (utils/profiling.py)."""
    import time as _time

    from ilswiss_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("sample"):
        _time.sleep(0.01)
    with t.phase("train"):
        _time.sleep(0.01)
    with t.phase("train"):
        pass
    out = t.stamp()
    assert out["Time/sample"] >= 0.01
    assert out["Time/train"] >= 0.01
    assert out["Time/total"] >= out["Time/sample"]
    # stamp resets the accumulators
    assert "Time/sample" not in t.stamp()
