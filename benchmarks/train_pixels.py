"""Recipe wrapper: config-4 pixel training through the product CLI.

Since round 3 the pixel pipeline is a first-class Trainer/CLI citizen
(`python -m carla_ppo_tpu.cli.train --obs pixels ...` - eval cadence,
best/autosave checkpoint streams, TB metrics, resume/-restart, and
--num_devices data parallelism all included); this wrapper only bakes the
known-good solve recipe from RESULTS_round2/3 - warm-started perception,
low exploration std, and the two-phase lr/entropy schedule encoded as
--lr_schedule/--entropy_schedule so no mid-run intervention is needed.

Any extra flags are appended and override the recipe (argparse last-wins),
e.g.:  python benchmarks/train_pixels.py --num_envs 1024 --num_episodes 2000
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carla_ppo_tpu.cli.train import main  # noqa: E402

RECIPE = [
    "--obs", "pixels",
    "--model_name", "pixel_agent",
    "--num_envs", "256",
    "--num_minibatches", "8",
    "--initial_std", "0.5",
    "--lr_schedule", "0:3e-4,800:1e-4",
    "--entropy_schedule", "0:0.003,800:0.002",
    "--warm_start_vae",
    "vae/models/from_seg_seg_bce_cnn_zdim64_beta1_kl_tolerance0.0_data",
    "--eval_interval", "250",
    "--num_episodes", "1500",
]

if __name__ == "__main__":
    main(RECIPE + sys.argv[1:])
