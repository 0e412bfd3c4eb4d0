#!/bin/sh
# Round-5 on-chip batch: correctness gate, then the A/B perf families,
# then the driver-bench rows — all sequential in ONE launch so process
# turnover (and its multi-minute terminal-claim penalty, CLAUDE.md) is
# paid once per stage, not per probe. Run in background; never
# timeout-kill (the axon tunnel wedges).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== tpu_check (correctness gate) ==="
python scripts/tpu_check.py
echo "tpu_check rc=$?"

echo "=== bench_layers (interleaved A/B families) ==="
EBM_BENCH_CYCLES=3 python scripts/bench_layers.py
echo "bench_layers rc=$?"

echo "=== bench.py transitions mode (driver noisy row) ==="
EBM_BENCH_MODE=transitions python bench.py
echo "bench transitions rc=$?"

echo "=== bench.py headline spot check ==="
python bench.py
echo "bench headline rc=$?"
