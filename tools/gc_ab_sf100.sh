#!/bin/bash
# In-JVM degradation A/B (r13 verdict item 6): identical passes in ONE
# 96g JVM degrade (text_c4_clean 91.4 -> 204.4 s, CPU +114%, GC-time
# only +14.5 s — the cost is concurrent-GC/allocation overhead on a
# churned old gen, invisible to the GC-time counter). JDK 17 arms:
#   g1       — the default (control)
#   g1r32    — G1 with 32 MB regions (fewer, larger regions: less
#              region-liveness accounting on humongous-allocation churn)
#   zgc      — single-generation ZGC (JDK 17 has no generational ZGC;
#              concurrent everything, pays a throughput tax)
#   parallel — ParallelGC (stop-the-world, zero concurrent tax: if the
#              degradation is concurrent-GC interference, this arm
#              keeps pass 2 flat and shows it)
# Two passes per query per arm, fresh JVM each arm. Usage:
#   tools/gc_ab_sf100.sh <sf_dir> <out_dir> [query ...]
set -u
SF=${1:-/tmp/graft_sf100}
OUT=${2:-/tmp/gc_ab}
shift 2 2>/dev/null || true
QUERIES=${@:-text_c4_clean dedup_semantic}
mkdir -p "$OUT"
declare -A ARMS=(
  [g1]=""
  [g1r32]="-XX:G1HeapRegionSize=32m"
  [zgc]="-XX:+UseZGC"
  [parallel]="-XX:+UseParallelGC"
)
for q in $QUERIES; do
  for arm in g1 g1r32 zgc parallel; do
    echo "=== $q / $arm"
    SPARK_DRIVER_MEM=96g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_JVM="${ARMS[$arm]}" \
    SPARK_GRAFT_BENCH_QUERIES=$q SPARK_GRAFT_BENCH_ROUNDS=2 \
    SPARK_GRAFT_BENCH_WARMUP=0 SPARK_GRAFT_SF_DIR=$SF \
    SPARK_GRAFT_BENCH_OUT="$OUT/${q}_${arm}.json" \
    sbt -batch "runMain graft.Bench" > "$OUT/${q}_${arm}.log" 2>&1
    grep -h '"metric"' "$OUT/${q}_${arm}.log" | tail -1
  done
done
python3 - "$OUT" <<'EOF'
import json, glob, sys
for f in sorted(glob.glob(f"{sys.argv[1]}/*.json")):
    d = json.load(open(f))
    q = d["order"][0]
    print(f.split('/')[-1], "runs", d["runs"][q], "cpu", d["cpu_runs"][q],
          "gc", d["gc_runs"][q])
EOF
