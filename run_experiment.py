#!/usr/bin/env python
"""Experiment scheduler: YAML spec -> variant grid -> runs.

Rebuild of the reference's top-level scheduler (run_experiment.py:11-78):
same CLI (`-e spec.yaml`), same spec schema.  The reference forks one OS
process per variant (Popen pool, :57-78); here variants default to
running sequentially in-process — on a single-chip TPU host, process
parallelism just thrashes the one device, so the pool only helps for
CPU-backend sweeps (`--workers N` restores it).

The algorithm is chosen by `meta_data.algorithm` (or inferred from the
reference's `script_path` naming).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

import yaml

from ilswiss_tpu.launchers.experiments import EXPERIMENTS
from ilswiss_tpu.launchers.variant import build_variants


def infer_algorithm(meta: dict) -> str:
    if "algorithm" in meta:
        return meta["algorithm"]
    script = meta.get("script_path", "")
    for name in ("sac_alpha", "discrete_sac", "sac", "td3", "ddpg", "dqn",
                 "ppo", "bc", "adv_irl", "gail"):
        if name in script:
            return {"sac_alpha": "sac", "gail": "adv_irl"}.get(name, name)
    raise ValueError(
        f"cannot infer algorithm from meta_data: {meta}; "
        "set meta_data.algorithm"
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-e", "--experiment", required=True,
                        help="experiment spec yaml")
    parser.add_argument("-g", "--gpu", default="0",
                        help="accepted for reference-CLI parity; ignored "
                             "(device selection is XLA's)")
    parser.add_argument("--workers", type=int, default=0,
                        help="run variants in N subprocesses (0 = inline)")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu); needed "
                             "because the host boot hook pins the TPU "
                             "platform before env vars are read")
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    with open(args.experiment) as f:
        spec = yaml.safe_load(f)
    meta = spec.get("meta_data", {})
    algorithm = infer_algorithm(meta)
    if algorithm not in EXPERIMENTS:
        raise ValueError(
            f"unknown algorithm '{algorithm}'; known: {sorted(EXPERIMENTS)}"
        )
    variants = build_variants(spec)
    exp_name = meta.get("exp_name", algorithm)
    for v in variants:
        v.setdefault("exp_name", exp_name)

    print(f"[run_experiment] {len(variants)} variant(s) of '{algorithm}'")

    if args.workers <= 0:
        for i, variant in enumerate(variants):
            print(f"[run_experiment] variant {i}: "
                  f"seed={variant.get('seed')} id={variant['exp_id']}")
            EXPERIMENTS[algorithm](variant)
        return

    # subprocess pool (reference run_experiment.py:57-78)
    tmpdir = tempfile.mkdtemp(prefix="variants-")
    procs: list[subprocess.Popen] = []
    queue = []
    for i, variant in enumerate(variants):
        path = os.path.join(tmpdir, f"{i}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(variant, f)
        queue.append(path)

    def launch(path):
        return subprocess.Popen([
            sys.executable, "-m", "ilswiss_tpu.launchers.run_variant",
            "--algorithm", algorithm, "--variant", path,
        ])

    while queue or procs:
        procs = [p for p in procs if p.poll() is None]
        while queue and len(procs) < args.workers:
            procs.append(launch(queue.pop(0)))
        time.sleep(1)


if __name__ == "__main__":
    main()
