#!/bin/sh
# Round-5 on-chip batch #2: the noise-read anatomy probe (same-process
# A/B arms), the FIXED tpu_check stage list (the three round-5 stages
# were defined but unregistered in batch #1), and the lyapunov bench
# family retry (now compilable at K=1024 via the remat'd year fn).
# Run in background; never timeout-kill.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== probe_noise_read (noisy-path cost anatomy) ==="
EBM_BENCH_CYCLES=3 python scripts/probe_noise_read.py
echo "probe rc=$?"

echo "=== tpu_check (full 23-stage list) ==="
python scripts/tpu_check.py
echo "tpu_check rc=$?"

echo "=== bench_layers lyapunov family (remat fix) ==="
EBM_BENCH_CYCLES=3 EBM_BENCH_LAYERS=lyapunov python scripts/bench_layers.py
echo "bench_layers lyapunov rc=$?"
