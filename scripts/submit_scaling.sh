#!/usr/bin/env bash
# North-rule two-cluster-size scaling evidence, via spark-submit.
#
# Builds the jar, synthesizes the deterministic two-dataset overlap
# corpus (graft.tools.MakeCorpus), then submits the FULL linkage job
# (graft.tools.SubmitScaling -> graft.RunPipeline: encode -> block/salt
# -> Dice kernel -> candidates -> greedy solver -> clusters) at
# local[2] and local[8] — the N and 4N dedicated-core stand-in (see
# BASELINE.md: this host provides near-proportional CPU only up to ~8
# active threads, so 2->8 models "every executor keeps dedicated cores
# at both cluster sizes"; 8->32 measures host provisioning, not the
# engine). Order alternates between rounds to cancel thermal/turbo
# decay bias. Reports per-round pairs-scored/sec at both sizes, the
# per-round efficiency thr(4N) / (4 * thr(N)), the median across
# rounds, and pairwise F1 vs the corpus truth table.
#
# Usage: scripts/submit_scaling.sh  [env: SAMPLES=100000 ROUNDS=2 WORK=/tmp/graft_submit]
#
# GATE=0.8 (optional) makes the script WAIT, before each round, until a
# ~3 s no-Spark kernel probe shows the host retaining >= GATE per-thread
# throughput at 8 threads (this shared host's multithread capacity
# swings 50-100% across the day — a degraded window measures the host's
# CPU provisioning, not the engine; see BASELINE.md). Waiting is bounded
# by GATE_WAIT_MIN (default 20) per round, after which the round runs
# anyway — nothing is dropped or re-rolled, and every trial still
# records its own in-artifact canary, so a window that shifts mid-round
# stays visible.
set -euo pipefail
cd "$(dirname "$0")/.."

SAMPLES="${SAMPLES:-150000}"
ROUNDS="${ROUNDS:-2}"
TRIALS="${TRIALS:-2}"
GATE="${GATE:-0}"
GATE_WAIT_MIN="${GATE_WAIT_MIN:-20}"
WORK="${WORK:-/tmp/graft_submit}"
JAR=target/scala-2.13/anonlinkspark_2.13-0.1.0.jar
SUBMIT=/opt/spark/bin/spark-submit
OUT_JSON="${OUT_JSON:-submit_scaling.json}"

# per-thread retention at 8 threads vs 1, from the raw kernel probe
probe_ratio() {
  java -cp "$JAR:/opt/spark/jars/*" graft.tools.ThreadScaling 8000 1,8 2>/dev/null |
    sed -E 's/.*threads= *([0-9]+).*per-thread= *([0-9.]+) M.*/\1 \2/' |
    awk '{v[$1]=$2} END{if (v[1] > 0) printf "%.3f", v[8]/v[1]; else print "0"}'
}

wait_for_window() { # $1=round
  [[ "$GATE" == 0 ]] && return 0
  local deadline=$((SECONDS + GATE_WAIT_MIN * 60)) r
  while :; do
    r=$(probe_ratio)
    echo "window probe before round $1: 8t retention $r (gate $GATE)" >&2
    awk -v r="$r" -v g="$GATE" 'BEGIN{exit !(r >= g)}' && return 0
    ((SECONDS >= deadline)) && {
      echo "gate timed out after ${GATE_WAIT_MIN}m; running round $1 in a degraded window" >&2
      return 0
    }
    sleep 90
  done
}

sbt -batch package >&2

# KEEP_WORK=1 reuses an existing $WORK corpus (re-running more rounds
# on the same deterministic input; MakeCorpus output is seed-fixed so
# a reuse is bit-identical to a resynth)
if [[ "${KEEP_WORK:-0}" != 1 || ! -d "$WORK/corpus" ]]; then
  rm -rf "$WORK"; mkdir -p "$WORK"
  echo "== synthesizing corpora (samples=$SAMPLES + 8k warmup) ==" >&2
  "$SUBMIT" --master 'local[8]' --driver-memory 8g --class graft.tools.MakeCorpus \
    "$JAR" --out "$WORK/corpus" --samples "$SAMPLES" --proportion 0.75 --seed 211 >&2
  "$SUBMIT" --master 'local[8]' --driver-memory 8g --class graft.tools.MakeCorpus \
    "$JAR" --out "$WORK/warm" --samples 8000 --proportion 0.75 --seed 313 >&2
fi

submit_one() { # $1=cores $2=tag -> prints the JSON report line
  # maxPartitionBytes sized so even this small corpus scans on >= all
  # cores (the knob any cluster run tunes to its executor count; the
  # default 128m packs a few-hundred-MB corpus into 1-2 partitions,
  # serializing the scan+encode front of the pipeline)
  "$SUBMIT" --master "local[$1]" --driver-memory 16g \
    --conf spark.sql.files.maxPartitionBytes=8m \
    --conf spark.sql.files.openCostInBytes=1m \
    --class graft.tools.SubmitScaling "$JAR" \
    --corpus "$WORK/corpus" --warm-corpus "$WORK/warm" \
    --work "$WORK/run_$2" --threshold 0.8 --k 5 --solver greedy \
    --trials "$TRIALS" 2>"$WORK/run_$2.log" | tail -1
}

declare -a LO_THR HI_THR LO_CPU HI_CPU LO_HOST HI_HOST EFF CPU_EFF
for ((r = 0; r < ROUNDS; r++)); do
  wait_for_window "$r"
  if ((r % 2 == 0)); then order="2 8"; else order="8 2"; fi
  for n in $order; do
    echo "== round $r: local[$n] ==" >&2
    line=$(submit_one "$n" "r${r}_c${n}")
    echo "local[$n]: $line" >&2
    thr=$(sed -n 's/.*"best_cmp_per_sec":\([0-9.]*\).*/\1/p' <<<"$line")
    cpu=$(sed -n 's/.*"best_cpu_sec":\([0-9.]*\).*/\1/p' <<<"$line")
    host=$(sed -n 's/.*"host_ratio_median":\([0-9.]*\).*/\1/p' <<<"$line")
    f1=$(sed -n 's/.*"f1":\([0-9.]*\).*/\1/p' <<<"$line")
    if [[ -z "$thr" || -z "$f1" || -z "$cpu" || -z "$host" ]]; then
      echo "FAILED to parse report line: $line" >&2; exit 1
    fi
    echo "$line" >"$WORK/report_r${r}_c${n}.json"
    if ((n == 2)); then LO_THR[r]=$thr; LO_CPU[r]=$cpu; LO_HOST[r]=$host
    else HI_THR[r]=$thr; HI_CPU[r]=$cpu; HI_HOST[r]=$host; fi
    F1=$f1
  done
  EFF[r]=$(awk -v h="${HI_THR[r]}" -v l="${LO_THR[r]}" 'BEGIN{printf "%.4f", h/(4*l)}')
  # CPU-seconds per comparison, low/high (same comparisons both sides):
  # 1.0 = the 4N side burns no extra CPU per unit of work (no plan or
  # contention overhead added by the wider cluster). Guard hc=0 (CPU
  # accounting unavailable): report 0 rather than die after all the
  # expensive submits have already run
  CPU_EFF[r]=$(awk -v hc="${HI_CPU[r]}" -v lc="${LO_CPU[r]}" \
    'BEGIN{printf "%.4f", (hc > 0) ? lc/hc : 0}')
  echo "round $r: thr2=${LO_THR[r]} thr8=${HI_THR[r]} eff=${EFF[r]} cpu_eff=${CPU_EFF[r]} host2=${LO_HOST[r]} host8=${HI_HOST[r]}" >&2
done

med() { printf '%s\n' "$@" | sort -n | awk '{a[NR]=$1} END{
  if (NR % 2) print a[(NR+1)/2]; else printf "%.4f", (a[NR/2]+a[NR/2+1])/2}'; }
median=$(med "${EFF[@]}")
cpu_median=$(med "${CPU_EFF[@]}")

{
  printf '{"protocol":"spark-submit graft.RunPipeline (greedy solver) at local[2] and local[8], alternating order, JIT-warmup run per submit",'
  printf '"samples":%s,"rounds":%s,"gate":%s,' "$SAMPLES" "$ROUNDS" "$GATE"
  printf '"thr_2core":[%s],' "$(IFS=,; echo "${LO_THR[*]}")"
  printf '"thr_8core":[%s],' "$(IFS=,; echo "${HI_THR[*]}")"
  printf '"cpu_sec_2core":[%s],' "$(IFS=,; echo "${LO_CPU[*]}")"
  printf '"cpu_sec_8core":[%s],' "$(IFS=,; echo "${HI_CPU[*]}")"
  printf '"host_ratio_2core":[%s],' "$(IFS=,; echo "${LO_HOST[*]}")"
  printf '"host_ratio_8core":[%s],' "$(IFS=,; echo "${HI_HOST[*]}")"
  printf '"efficiency_rounds":[%s],' "$(IFS=,; echo "${EFF[*]}")"
  printf '"cpu_work_efficiency_rounds":[%s],' "$(IFS=,; echo "${CPU_EFF[*]}")"
  printf '"efficiency_median":%s,"cpu_work_efficiency_median":%s,"f1":%s}\n' \
    "$median" "$cpu_median" "$F1"
} | tee "$OUT_JSON"
