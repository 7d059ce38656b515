#!/usr/bin/env bash
# Snapshot gate: run before EVERY commit. A commit that fails this gate
# must not be made — round 2 lost its entire correctness/bench run to a
# single uncompiled line committed without this check.
set -euo pipefail
cd "$(dirname "$0")/.."
echo "[gate] sbt Test/compile + test ..."
sbt -batch Test/compile test
echo "[gate] GREEN"
