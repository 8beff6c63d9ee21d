"""Render learning-curve PNGs from run progress.csv files.

The reference validates algorithms by curve plots (exp_specs/*/README.md
-> files/*.png); this renders the equivalent artifacts for this repo's
runs, with the reference's published mean +/- std band where one exists
(BASELINE.md).

    python scripts/make_curves.py [run_dir ...]

With no args, renders every logs/*/seed_*/progress.csv.
"""

from __future__ import annotations

import csv
import glob
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# exp_name prefix -> (reference mean, std, label) from BASELINE.md
REFERENCE_BANDS = {
    "sac_hopper": (3402.9494, 446.4877, "reference SAC Hopper-v2"),
    "sac_walker": (5639.3267, 29.9715, "reference SAC Walker2d-v2"),
    "sac_ant": (5404.5532, 1520.4961, "reference SAC Ant-v2"),
    "sac_humanoid": (6043.9907, 726.1788, "reference SAC Humanoid-v2"),
    "sac_halfcheetah": (13711.6445, 111.4709, "reference SAC HalfCheetah-v2"),
    "gail_hopper": (3402.9494, 446.4877, "hopper SAC expert band"),
}


def render(csv_path: str) -> str | None:
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    if not rows or "AverageReturn" not in rows[0]:
        return None
    steps = [float(r.get("TotalEnvSteps", i)) for i, r in enumerate(rows)]
    ret = [float(r["AverageReturn"]) for r in rows]

    run_dir = os.path.dirname(csv_path)
    name = os.path.basename(os.path.dirname(run_dir))

    fig, ax = plt.subplots(figsize=(7, 4.2), dpi=120)
    ax.plot(steps, ret, lw=0.8, alpha=0.45, color="tab:blue")
    # rolling mean (the reference's published curves are TB-smoothed)
    k = max(1, min(9, len(ret) // 10))
    if k > 1:
        sm = [sum(ret[max(0, i - k + 1):i + 1])
              / len(ret[max(0, i - k + 1):i + 1]) for i in range(len(ret))]
    else:
        sm = ret
    ax.plot(steps, sm, lw=1.6, color="tab:blue",
            label=f"{name} (this repo, TPU; smoothed)")
    for prefix, (mean, std, label) in REFERENCE_BANDS.items():
        if name.startswith(prefix):
            ax.axhline(mean, color="tab:green", ls="--", lw=1, label=label)
            ax.axhspan(mean - std, mean + std, color="tab:green", alpha=0.12)
            break
    if "SuccessRate" in rows[0]:
        ax2 = ax.twinx()
        ax2.plot(steps, [float(r["SuccessRate"]) for r in rows],
                 color="tab:orange", lw=1.0, alpha=0.8)
        ax2.set_ylabel("SuccessRate", color="tab:orange")
        ax2.set_ylim(-0.05, 1.05)
    ax.set_xlabel("env steps")
    ax.set_ylabel("AverageReturn")
    ax.set_title(name)
    ax.legend(loc="lower right", fontsize=8)
    fig.tight_layout()
    out = os.path.join(run_dir, "curve.png")
    fig.savefig(out)
    plt.close(fig)
    return out


def main() -> None:
    paths = sys.argv[1:] or sorted(
        glob.glob("logs/*/seed_*/progress.csv"))
    for p in paths:
        if os.path.isdir(p):
            p = os.path.join(p, "progress.csv")
        out = render(p)
        if out:
            print("wrote", out)


if __name__ == "__main__":
    main()
