#!/bin/bash
# Full suite (slow + default) with per-file process isolation: a single
# pytest process accumulates XLA:CPU compiler state that segfaults around
# the 130th compiled test program (measured 2026-08-19, twice, different
# crash sites in jax compiler internals; every test passes in isolation).
cd /root/repo
rc=0
for f in tests/test_*.py; do
  echo "=== $f ==="
  python -m pytest "$f" -q -m "slow or not slow" 2>&1 | tail -2
  [ ${PIPESTATUS[0]} -ne 0 ] && rc=1
done
exit $rc
