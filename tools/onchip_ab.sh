#!/bin/bash
# On-chip A/B sweep for the round-1 late optimizations — run when the TPU
# tunnel is healthy. Serializes every probe (one chip) and logs to $1
# (default /tmp/onchip_ab.log). Decisions these feed:
#   * Config.adj_dtype  "auto" default (bitwise claim: probe_mxu_rounding)
#   * Config.block_impl "auto" default (DD anatomy: profile_block_step)
set -u
LOG=${1:-/tmp/onchip_ab.log}
cd "$(dirname "$0")/.."
{
  echo "=== $(date) tiny-matmul probe ==="
  timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print('TPU_OK', float((x@x).sum()))" || exit 1
  echo "=== probe_mxu_rounding ==="
  timeout 400 python tools/probe_mxu_rounding.py
  echo "=== profile_block_step DD xla fp32 ==="
  timeout 1200 python tools/profile_block_step.py --data_type DD --steps 60 --reps 3
  echo "=== profile_block_step DD pallas fp32 ==="
  timeout 1200 python tools/profile_block_step.py --data_type DD --steps 60 --reps 3 --block_impl pallas
  echo "=== profile_block_step DD xla adj-bf16 ==="
  timeout 1200 python tools/profile_block_step.py --data_type DD --steps 60 --reps 3 --adj_dtype bfloat16
  echo "=== profile_block_step DD pallas adj-bf16 ==="
  timeout 1200 python tools/profile_block_step.py --data_type DD --steps 60 --reps 3 --block_impl pallas --adj_dtype bfloat16
  echo "=== done $(date) ==="
} >"$LOG" 2>&1
