"""carla_ppo_tpu — a TPU-native rebuild of the Carla-ppo learning-to-drive stack.

This package re-implements, TPU-first (JAX/XLA/Pallas/pjit), the full capability
surface of the reference project bitsauce/Carla-ppo (a TF1 PPO agent driving in
the CARLA simulator through a frozen beta-VAE): the driving environments (lap and
random-route), the reward/termination plugin layer, the ConvVAE/MlpVAE world-model
encoders, PPO with GAE, evaluation/video tooling, data collection, and inspectors.

Unlike the reference, the simulator itself is on-device: a vmapped bicycle-model
vehicle, device-resident track/waypoint data, and a Pallas tile rasterizer that
emits 160x80 semantic-segmentation camera frames in HBM, so that
rollout -> encode -> PPO update fuses into a single XLA program.

Reference layout parity (see SURVEY.md):
  envs/      <- CarlaEnv/ (carla_lap_env.py, carla_route_env.py, wrappers.py, planner.py)
  models/    <- ppo.py PolicyGraph, vae/models.py
  ops/       <- utils.py compute_gae, on-device rendering (replaces the CARLA server)
  parallel/  <- (new) mesh / multi-chip scaling, absent in the reference
  training/  <- train.py, vae/train_vae.py
  utils/     <- utils.py VideoRecorder/metrics, checkpointing
  cli/       <- train.py, run_eval.py, collect_data.py, inspect_*.py entry points
"""

__version__ = "0.1.0"

# The remote-compile TPU path pays minutes-per-process for big programs;
# the persistent cache replays them in <1 s (see utils/compile_cache.py).
# Opt out with CARLA_PPO_CACHE_DIR=0.
from carla_ppo_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

from carla_ppo_tpu.envs.types import (  # noqa: F401
    EnvParams,
    EnvState,
    RoadOption,
    TrackData,
    VehicleParams,
    VehicleState,
)
