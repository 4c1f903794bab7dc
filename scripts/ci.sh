#!/usr/bin/env bash
# CI recipe (SURVEY.md C24 / VERDICT r2 next-step #10).
#
# Stage 1 always runs: the fast suite on the virtual 8-device CPU mesh
# (conftest.py forces CPU + xla_force_host_platform_device_count=8).
# Stage 2 runs when a TPU is attached: the backend-gated production-path
# smoke (lanes + Pallas kernel at the flagship contact set), so a
# kernel-breaking change fails CI, not just the end-of-round bench.
#
# Usage: scripts/ci.sh [--full]   (--full includes the slow CPU tests)
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

MARK='not slow'
if [[ "${1:-}" == "--full" ]]; then
  MARK=''
fi

echo "== stage 1: CPU virtual-mesh suite =="
python -m pytest tests/ -x -q -m "$MARK"

echo "== stage 2: TPU production-path smoke (skipped when no TPU) =="
if python - <<'EOF'
import sys
import jax
sys.exit(0 if jax.default_backend() == "tpu" else 1)
EOF
then
  CAT_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q -o addopts=""
else
  echo "no TPU backend attached; stage 2 skipped"
fi

echo "CI OK"
