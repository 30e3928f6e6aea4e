#!/usr/bin/env bash
# Round-end snapshot gate (VERDICT r3 #1, r4 #2).
#
# Round 3 shipped a one-line NameError because the final commit ran nothing;
# round 4 shipped 2 red tests because the gate existed but was not run on the
# final tree. So the gate now PRODUCES the commit: pass a message and the
# exact tree that passed all three phases is committed — if anything edits
# the tree while the gate runs, it refuses and must be re-run.
#
# Usage:
#   bash scripts/round_gate.sh                      # check only
#   bash scripts/round_gate.sh "snapshot message"   # check, then commit the
#                                                   # gated tree on green
set -u
cd "$(dirname "$0")/.."
MSG="${1:-}"

# check-only mode leaves the git index alone; commit mode snapshots the tree
# hash up front so a mid-gate edit is detected (r5 review: unconditional
# `git add -A` staged scratch files even when just checking)
TREE_BEFORE=""
if [ -n "$MSG" ]; then
    git add -A
    git status --short
    TREE_BEFORE=$(git write-tree)
fi

fail=0

echo "=== 1/3 full test suite (CPU, 8 virtual devices) ==="
if ! timeout 2400 python -m pytest tests/ -q; then
    echo "GATE FAIL: test suite red"
    fail=1
fi

echo "=== 2/3 dryrun_multichip(8) ==="
# force the 8-device virtual CPU mesh: without this the axon plugin loads,
# make_mesh silently truncates to 1 real device, and the phase validates
# nothing (r5; JAX_PLATFORMS env alone is overridden by the axon site, so
# the jax.config.update call is required)
if ! XLA_FLAGS="--xla_force_host_platform_device_count=8" timeout 1500 python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
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

if [ -n "$MSG" ]; then
    git add -A
    TREE_AFTER=$(git write-tree)
    if [ "$TREE_BEFORE" != "$TREE_AFTER" ]; then
        echo "ROUND GATE: FAILED — the tree changed while the gate ran;"
        echo "the gated result does not describe the current tree. Re-run."
        exit 1
    fi
fi

echo "ROUND GATE: PASSED"
if [ -n "$MSG" ]; then
    git commit -m "$MSG"
    echo "ROUND GATE: committed the gated tree"
fi
