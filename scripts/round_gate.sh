#!/usr/bin/env bash
# Round-end snapshot gate (VERDICT r3 item 1: round 3 shipped a one-line
# NameError that broke every join because the final commit ran nothing).
# Run BEFORE the end-of-round commit; refuses to pass with a red suite or a
# broken multichip entry. Mirrors the reference gating every merge on the
# full suite across engines (py-polars/Makefile:81).
#
# Usage: bash scripts/round_gate.sh        (from the repo root)
set -u

fail=0

echo "=== 1/3 full test suite (CPU, 8 virtual devices) ==="
if ! timeout 1800 python -m pytest tests/ -q; then
    echo "GATE FAIL: test suite red"
    fail=1
fi

echo "=== 2/3 dryrun_multichip(8) ==="
if ! timeout 900 python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
print('multichip OK')
"; then
    echo "GATE FAIL: dryrun_multichip(8) failed"
    fail=1
fi

echo "=== 3/3 single-chip entry compile check ==="
if ! timeout 900 python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn).lower(*args).compile()
print('entry OK')
"; then
    echo "GATE FAIL: entry() does not compile"
    fail=1
fi

if [ "$fail" -ne 0 ]; then
    echo "ROUND GATE: FAILED — do not snapshot"
    exit 1
fi
echo "ROUND GATE: PASSED"
