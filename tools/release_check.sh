#!/usr/bin/env bash
# Release gate for mmde_tpu: run before shipping kernel or training-path
# changes. Covers the failure class that CPU tests cannot see (compiled
# Mosaic semantics differ from interpret mode — docs/PERF.md).
#
# Usage: bash tools/release_check.sh [--skip-tpu]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/5 unit + parity test suite (CPU, interpret-mode kernels) =="
python -m pytest tests/ -q

echo "== 2/5 hardware gradient audit: CPU fp32 ground truth =="
python tools/check_attention_grads_tpu.py cpu

if [[ "${1:-}" != "--skip-tpu" ]]; then
  echo "== 3/5 hardware gradient audit: compiled kernels vs ground truth =="
  python tools/check_attention_grads_tpu.py tpu

  echo "== 4/5 flagship throughput benchmark =="
  python bench.py

  echo "== 5/5 convergence gate (system LEARNS end-to-end; ~15 min) =="
  python tools/convergence_gate.py
else
  echo "== 3-5/5 skipped (--skip-tpu) =="
fi

echo "release check passed"
