#!/usr/bin/env bash
# Pre-commit gate: full test suite + multichip dryrun on 8 virtual CPU devices.
#
# Run this before ANY commit touching brax_tracking_tpu/physics/ or
# brax_tracking_tpu/ops/ (round-1 retro: a final-hours perf commit shipped
# with a red suite and a broken multichip path; this script is the guard).
#
# Usage: scripts/check.sh [pytest args...]
set -euo pipefail
cd "$(dirname "$0")/.."

# Two fresh pytest processes (memory headroom on the 1-core host), each
# with one self-healing retry: a crashed/killed process can leave a
# truncated jax compile-cache entry, and both reading and rewriting such
# (historical: some jaxlibs segfaulted reading truncated cache entries;
# the current one warns + recompiles — tests/test_cache_guard.py. The
# wipe-and-retry below is kept as a last-resort recovery for genuine
# crashes only, rc>=128.)
run_pytest() {
  local label="$1"; shift
  echo "== pytest ($label) =="
  local rc=0
  python -m pytest "$@" || rc=$?
  if [ "$rc" -ge 128 ]; then
    # crashed (SIGSEGV=139/SIGABRT=134): whatever poisoned the run may
    # live in cached state — wipe the cache and retry once (cold compiles)
    echo "== pytest ($label) crashed (rc=$rc): wiping jax compile cache, retrying once =="
    rm -rf /tmp/btt_jax_cache
    python -m pytest "$@"
  elif [ "$rc" -ne 0 ]; then
    exit "$rc"
  fi
}

run_pytest "part 1: a-o" tests/test_[a-o]*.py -q "$@"
run_pytest "part 2: p-z" tests/test_[p-z]*.py -q "$@"

echo "== multichip dryrun (8 virtual devices) =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun_multichip(8): ok')
"

echo "== check.sh: ALL GREEN =="
