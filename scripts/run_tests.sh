#!/bin/bash
# Chunked test runner: one pytest process per test file.
#
# Why: the full suite in ONE process intermittently segfaults inside
# XLA's CPU backend_compile after ~160 accumulated jit compilations
# (observed 2026-08-19: three single-process runs died compiling
# test_pipeline's slam_scan while_loop late in the suite; every file
# passes in isolation, host memory was 125 GB free). Per-file processes
# sidestep the accumulated-state crash and also parallelize naturally.
#
# Usage: scripts/run_tests.sh [pytest-args...]
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  out=$(timeout 1500 python -m pytest "$f" -q "$@" 2>&1 | tail -3)
  rc=$?
  line=$(echo "$out" | grep -E "passed|failed|error|no tests" | head -1)
  echo "$f: rc=$rc ${line:-$out}"
  if [ $rc -ne 0 ] || echo "$line" | grep -qE "failed|error"; then fail=1; fi
done
if [ $fail -eq 0 ]; then echo "ALL GREEN"; else echo "FAILURES ABOVE"; fi
exit $fail
