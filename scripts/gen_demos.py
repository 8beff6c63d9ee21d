#!/usr/bin/env python
"""Generate expert demonstrations from a trained checkpoint or scripted
expert.

Rebuild of the reference demo-generation scripts (run_scripts/gen_*.py
producing trajectory pickles indexed by demos_listing.yaml).  Demos are
saved as .npz transition arrays (data/demo.py schema) and registered in
demos_listing.yaml for the IL experiment runners.

Usage:
  python scripts/gen_demos.py --env pendulum --expert scripted \
      --steps-per-env 500 --num-envs 8 --out demos/pendulum_expert.npz
  python scripts/gen_demos.py --env pendulum --expert checkpoint \
      --checkpoint logs/sac_pendulum/.../checkpoints/best \
      --out demos/pendulum_sac.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import yaml


SCRIPTED_EXPERTS = {
    "pendulum": "ilswiss_tpu.envs.experts:pendulum_expert",
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--env", required=True)
    p.add_argument("--expert", choices=["scripted", "checkpoint"],
                   default="scripted")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--steps-per-env", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--listing", default="demos_listing.yaml")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ilswiss_tpu.data.demo import save_demos_npz
    from ilswiss_tpu.envs import make_vec
    from ilswiss_tpu.runtime.collector import collect_transitions

    vec = make_vec(args.env, num_envs=args.num_envs)

    if args.expert == "scripted":
        if args.env not in SCRIPTED_EXPERTS:
            raise SystemExit(
                f"no scripted expert for '{args.env}'; "
                f"available: {sorted(SCRIPTED_EXPERTS)}")
        mod_name, fn_name = SCRIPTED_EXPERTS[args.env].split(":")
        import importlib
        expert = getattr(importlib.import_module(mod_name), fn_name)
        act_fn = lambda obs, key: expert(obs)
    else:
        from ilswiss_tpu.algorithms.sac import SAC, SACConfig
        from ilswiss_tpu.runtime.checkpoint import restore_checkpoint
        sac = SAC(vec.env.observation_size, vec.env.action_size,
                  SACConfig())
        template = {"algo_state": sac.init(jax.random.PRNGKey(0))}
        restored = restore_checkpoint(
            args.checkpoint, {"algo_state": template["algo_state"]})
        algo_state = restored["algo_state"]
        act_fn = lambda obs, key: sac.act(
            algo_state, obs, key, deterministic=True)

    demos = collect_transitions(
        vec, act_fn, args.steps_per_env, jax.random.PRNGKey(args.seed))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_demos_npz(args.out, demos)
    mean_rew = float(demos.data["reward"].mean())
    print(f"saved {int(demos.size)} transitions to {args.out} "
          f"(mean step reward {mean_rew:.3f})")

    # register in the demo listing (reference demos_listing.yaml UX)
    listing = {}
    if os.path.exists(args.listing):
        with open(args.listing) as f:
            listing = yaml.safe_load(f) or {}
    key = os.path.splitext(os.path.basename(args.out))[0]
    listing[key] = {
        "file_path": args.out,
        "env": args.env,
        "num_transitions": int(demos.size),
    }
    with open(args.listing, "w") as f:
        yaml.safe_dump(listing, f)
    print(f"registered '{key}' in {args.listing}")


if __name__ == "__main__":
    main()
