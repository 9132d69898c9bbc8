#!/bin/sh
# Commit the current round's measurement artifacts so they are tracked
# AT judging time, not one round in arrears. Run as the round's final
# action (and safe to run any time — no-op when nothing changed).
set -e
cd "$(dirname "$0")/.."
git add -- BENCH_r*.json CORRECTNESS_r*.json BENCH_SUMMARY.json \
  LEAKCHECK.json BENCH_SCALING.json SF1_REPLAY_*.json 2>/dev/null || true
if git diff --cached --quiet; then
  echo "commit_artifacts: nothing to commit"
else
  git commit -m "Track round measurement artifacts"
  echo "commit_artifacts: committed"
fi
