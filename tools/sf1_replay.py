#!/usr/bin/env python3
"""Full-suite value replay at a big SF (VERDICT r11 ask #2): run
graft.Verify + tools/check.py over EVERY oracle-gated query in id-range
chunks (fresh outdir per chunk — stale-output hazard), collecting one
pass/fail row per query into SF1_REPLAY_r<N>.json.

Usage: python3 tools/sf1_replay.py <sfDir> <round> [chunkSize] [startChunk]

Chunked because a single Verify run of 230 queries at sf1 holds one
Spark session for an hour+ (accumulated listener/broadcast state inflates
the tail — the same reason Bench restarts its session every 50 queries),
and a crash mid-run would lose everything; per-chunk outdirs mean a
failed chunk re-runs alone.
"""
import json
import os
import re
import subprocess
import sys


def query_names(repo):
    src = open(os.path.join(
        repo, "src/main/scala/graft/SparkEntry.scala")).read()
    names = re.findall(r'"(q\d+[a-z0-9_]*)" ->', src)
    seen = []
    for n in names:
        if n not in seen:
            seen.append(n)
    return seen


def oracle_names(repo):
    src = open(os.path.join(
        repo, "src/main/scala/graft/OracleSql.scala")).read()
    return set(re.findall(r'"(q\d+[a-z0-9_]*)" ->', src))


def main():
    sf_dir = sys.argv[1]
    rnd = sys.argv[2]
    chunk_size = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    start = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = query_names(repo)
    oracles = oracle_names(repo)
    chunks = [names[i:i + chunk_size]
              for i in range(0, len(names), chunk_size)]
    out_path = os.path.join(repo, f"SF1_REPLAY_r{rnd}.json")
    results = {}
    if start > 0 and os.path.exists(out_path):
        results = json.load(open(out_path)).get("queries", {})
    for ci, chunk in enumerate(chunks):
        if ci < start:
            continue
        out = f"/tmp/sf1replay_r{rnd}_c{ci}"
        subprocess.run(["rm", "-rf", out], check=True)
        sel = ",".join(chunk)
        print(f"=== chunk {ci + 1}/{len(chunks)}: {chunk[0]}..{chunk[-1]}",
              flush=True)
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out} {sel}"],
            cwd=repo, capture_output=True, text=True)
        if r.returncode != 0:
            tail = (r.stdout + r.stderr)[-3000:]
            print(f"VERIFY FAILED chunk {ci}: {tail}", flush=True)
            for q in chunk:
                results[q] = "verify_error"
        else:
            # check.py's `only` treats names without an oracle as typo
            # failures; pass the oracle subset (rows-only queries still
            # print ROWSONLY via the outdir listing)
            with_oracle = [q for q in chunk if q in oracles]
            c = subprocess.run(
                ["python3", "tools/check.py", sf_dir, out,
                 ",".join(with_oracle) if with_oracle else "__none__"],
                cwd=repo, capture_output=True, text=True)
            for line in c.stdout.splitlines():
                m = re.match(
                    r"(OK|MISMATCH|SCHEMA|TYPEDIFF|ERROR|MISSING|ROWSONLY)"
                    r"\s+(\S+)", line)
                if m:
                    status, q = m.group(1), m.group(2).rstrip(":")
                    results[q] = ("pass" if status in ("OK", "ROWSONLY")
                                  else f"fail:{status}")
            print(c.stdout[-2000:], flush=True)
        subprocess.run(["rm", "-rf", out], check=True)
        n_pass = sum(1 for v in results.values() if v == "pass")
        doc = {
            "round": int(rnd),
            "sf_dir": sf_dir,
            "harness": "tools/sf1_replay.py: chunked Verify + check.py "
                       "(value-exact DuckDB compare), fresh outdir/chunk",
            "chunks_done": ci + 1,
            "chunks_total": len(chunks),
            "n_pass": n_pass,
            "n_fail": len(results) - n_pass,
            "queries": results,
        }
        json.dump(doc, open(out_path, "w"), indent=1)
    print(f"done: {sum(1 for v in results.values() if v == 'pass')} pass, "
          f"{sum(1 for v in results.values() if v != 'pass')} fail",
          flush=True)


if __name__ == "__main__":
    main()
