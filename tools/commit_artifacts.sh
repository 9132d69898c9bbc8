#!/bin/sh
# Commit the current round's measurement artifacts so they are tracked
# AT judging time, not one round in arrears. Run as the round's final
# action (and safe to run any time — no-op when nothing changed).
set -e
cd "$(dirname "$0")/.."
# add each artifact individually: a single multi-pathspec `git add`
# aborts staging EVERYTHING (exit 128) if any one glob matches no file,
# and `|| true` would hide that — a round missing one artifact family
# must still commit the rest
for f in BENCH_r*.json CORRECTNESS_r*.json BENCH_SUMMARY.json \
  LEAKCHECK.json BENCH_SCALING.json SF1_REPLAY_*.json; do
  # plain `[ -e ] && git add` would trip set -e on the last miss
  if [ -e "$f" ]; then git add -- "$f"; fi
done
if git diff --cached --quiet; then
  echo "commit_artifacts: nothing to commit"
else
  git commit -m "Track round measurement artifacts"
  echo "commit_artifacts: committed"
fi
