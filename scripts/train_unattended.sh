#!/bin/bash
# Relaunch wrapper for unattended training on the axon remote platform.
#
# Usage: scripts/train_unattended.sh [cli.train flags...]
#
# Runs cli.train with a stall watchdog (see carla_ppo_tpu/utils/watchdog.py);
# when the process exits with the stall code (17: a wedged remote RPC), the
# same command is relaunched - training auto-resumes from the newest
# autosave/best checkpoint. Any other exit code ends the loop.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="${PYTHONPATH:-/root/repo:/root/.axon_site}"

STALL_TIMEOUT="${STALL_TIMEOUT:-1800}"
MAX_RELAUNCHES="${MAX_RELAUNCHES:-50}"

n=0
while true; do
  python -m carla_ppo_tpu.cli.train --stall_timeout "$STALL_TIMEOUT" "$@"
  code=$?
  if [ "$code" -ne 17 ]; then
    echo "train_unattended: exited with code $code; done." >&2
    exit "$code"
  fi
  n=$((n + 1))
  if [ "$n" -ge "$MAX_RELAUNCHES" ]; then
    echo "train_unattended: $n stall relaunches; giving up." >&2
    exit 1
  fi
  echo "train_unattended: stall detected; relaunch #$n ..." >&2
done
