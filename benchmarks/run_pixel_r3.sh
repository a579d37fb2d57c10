#!/bin/bash
# Round-3 pixel runs (config 4). Usage: run_pixel_r3.sh <model_name> [extra flags...]
NAME=$1; shift
cd /root/repo
PYTHONPATH=/root/repo:/root/.axon_site exec python -m carla_ppo_tpu.cli.train \
  --model_name "$NAME" --obs pixels \
  --num_envs 256 --num_minibatches 8 --initial_std 0.5 \
  --lr_schedule 0:3e-4,800:1e-4 --entropy_schedule 0:0.003,800:0.002 \
  --warm_start_vae vae/models/from_seg_seg_bce_cnn_zdim64_beta1_kl_tolerance0.0_data \
  --eval_interval 50 --num_episodes 2000 "$@"
