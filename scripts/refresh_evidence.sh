#!/bin/bash
# Regenerate every TPU evidence artifact after a deploy-path change.
# Usage: bash scripts/refresh_evidence.sh [outdir]   (default: repo root)
# Runs sequentially (one chip): deploy goldens -> parity goldens ->
# streams/temperature bench -> 4K bench -> corpora -> MM -> ingest ->
# config23 -> multihost.  Measured wall (r05): ~87 min when a config
# schema change invalidates the persistent compile cache (FTPConfig is a
# static jit arg, so adding a field recompiles everything); ~25-40 min
# with a warm cache.  The corpora account for ~17 min of compute that
# cannot be cached away.
set -e
cd "$(dirname "$0")/.."
OUT="${1:-.}"
R="${VISTAF_ROUND:-r04}"

echo "=== goldens (deploy) ==="
python scripts/run_goldens_suite.py "$OUT/GOLDENS_${R}_deploy.json" deploy
echo "=== goldens (parity) ==="
python scripts/run_goldens_suite.py "$OUT/GOLDENS_${R}.json" parity
echo "=== streams + temperature bench ==="
python scripts/bench_streams.py "$OUT/BENCH_STREAMS_${R}.json"
echo "=== 4K bench ==="
python scripts/bench_4k.py "$OUT/BENCH_4K_${R}.json"
echo "=== main bench ==="
python bench.py
echo "=== 75-sphere corpus (deploy) ==="
python scripts/run_sphere_corpus.py deploy "$OUT/CORPUS_${R}_deploy.json"
echo "=== 75-sphere corpus (parity) ==="
python scripts/run_sphere_corpus.py parity "$OUT/CORPUS_${R}_parity.json"
echo "=== multimodal 4K step bench ==="
python scripts/bench_mm.py "$OUT/BENCH_MM_${R}.json"
echo "=== ingest-inclusive bench ==="
python scripts/bench_ingest.py "$OUT/BENCH_INGEST_${R}.json"
echo "=== BASELINE configs 2/3 bench ==="
python scripts/bench_config23.py "$OUT/BENCH_CONFIG23_${R}.json"
echo "=== multihost full-pipeline (2-process jax.distributed, CPU) ==="
# the genuine FTP graph crosses a real process boundary once per evidence
# cycle (multi-minute XLA:CPU compile per rank -> not in the fast suite)
VISTAF_RUN_SLOW=1 python -m pytest tests/test_parallel.py -q \
    -k "multihost_whole_limb_step_full" 2>&1 | tee "$OUT/MULTIHOST_FULL_${R}.log"
echo "done — gate with: python -m pytest tests/test_corpus_regression.py tests/test_bench_artifacts.py -q"
