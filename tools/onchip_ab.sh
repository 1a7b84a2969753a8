#!/bin/bash
# On-chip A/B sweep for the round-1 late optimizations — run when the TPU
# tunnel is healthy. Serializes every probe (one chip) and logs to $1
# (default /tmp/onchip_ab.log). Decisions these feed:
#   * Config.adj_dtype  "auto" default (bitwise claim: probe_mxu_rounding)
#   * Config.block_impl "auto" default (DD anatomy: profile_block_step)
# Exits nonzero if ANY step failed; each step's rc is logged so a
# half-complete sweep can never read as a finished A/B.
set -u
LOG=${1:-/tmp/onchip_ab.log}
cd "$(dirname "$0")/.."
FAILED=0
step() {
  echo "=== $(date +%T) $1 ===" >>"$LOG"
  shift
  "$@" >>"$LOG" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then echo "STEP FAILED rc=$rc" >>"$LOG"; FAILED=1; fi
}
: >"$LOG"
step "tiny-matmul probe" timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); print('TPU_OK', float((x@x).sum()))"
if [ $FAILED -ne 0 ]; then echo "TPU unreachable — aborting" >>"$LOG"; exit 1; fi
step "probe_mxu_rounding" timeout 400 python tools/probe_mxu_rounding.py
step "profile_block_step DD xla fp32" timeout 1200 python tools/profile_block_step.py --data_type DD --steps 60 --reps 3
step "profile_block_step DD pallas fp32" timeout 1200 python tools/profile_block_step.py --data_type DD --steps 60 --reps 3 --block_impl pallas
step "profile_block_step DD xla adj-bf16" timeout 1200 python tools/profile_block_step.py --data_type DD --steps 60 --reps 3 --adj_dtype bfloat16
step "profile_block_step DD pallas adj-bf16" timeout 1200 python tools/profile_block_step.py --data_type DD --steps 60 --reps 3 --block_impl pallas --adj_dtype bfloat16
echo "=== done $(date +%T) FAILED=$FAILED ===" >>"$LOG"
exit $FAILED
