#!/usr/bin/env bash
# Perf sweep on the real chip (VERDICT r2 #2): batch x fused-decode grid over
# the bench headline config, plus the per-stage profile. Writes one JSON line
# per config to PERF_SWEEP.jsonl and leaves the winner's settings in
# PERF_BEST.json for bench.py defaults to be updated by hand (deliberate —
# the default change should be a reviewed commit, not a side effect).
#
#   scripts/perf_sweep.sh            # full grid (~15-25 min on one v5e)
#   SWEEP_BATCHES="32 128" scripts/perf_sweep.sh
set -uo pipefail
cd "$(dirname "$0")/.."

BATCHES=${SWEEP_BATCHES:-"32 64 128 256"}
OUT=PERF_SWEEP.jsonl
: > "$OUT"

for b in $BATCHES; do
  for fused in 0 1; do
    echo "--- batch=$b fused=$fused" >&2
    line=$(BENCH_BATCH=$b BENCH_FUSED=$fused BENCH_SKIP_EXTRAS=1 \
           BENCH_ITERS=6 timeout 900 python bench.py | tail -1)
    if [ -n "$line" ]; then
      echo "$line" | python - "$b" "$fused" >> "$OUT" <<'PY'
import json, sys
row = json.loads(sys.stdin.read())
row["batch"] = int(sys.argv[1]); row["fused"] = int(sys.argv[2])
print(json.dumps(row))
PY
    else
      echo "{\"batch\": $b, \"fused\": $fused, \"error\": \"bench failed\"}" >> "$OUT"
    fi
  done
done

python - <<'PY'
import json
rows = [json.loads(l) for l in open("PERF_SWEEP.jsonl")]
ok = [r for r in rows if "value" in r]
best = max(ok, key=lambda r: r["value"]) if ok else None
print(json.dumps({"n_configs": len(rows), "best": best}, indent=1))
if best:
    json.dump(best, open("PERF_BEST.json", "w"))
PY
