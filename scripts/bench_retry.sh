#!/usr/bin/env bash
# Run graft.Bench with environment gating, retrying (bounded) while the
# emitted artifact carries a comparability flag:
#   - "contended":true  — the warmed calibration probes spread > 1.3x
#     (machine speed changed mid-run);
#   - "env_suspect":true — the front/back sentinel-subset re-run
#     disagreed > 1.1x, or a sibling JVM was alive (a constant
#     environment offset the probe spread cannot see — the r16
#     committed artifact read ~20% over two clean same-code runs with
#     every mid-run channel flat).
# The r17 committed artifact stayed flagged because this script retried
# only ONCE on a bouncing box while the round's clean runs predated the
# last commits — so it now loops up to MAX_ATTEMPTS with quiet-machine
# waits between, keeping the FIRST clean run (or the last flagged one,
# flags in-artifact, when the machine never settles).
# Before each attempt: if a sibling java/sbt JVM is running or the
# 1-min loadavg exceeds ~2 on what should be an idle box, wait — a
# bench sharing the machine with another build measures the build.
# Usage:
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/bench_retry.sh [out.json]
set -u -o pipefail
OUT="${1:-/dev/stdout}"
MAX_ATTEMPTS="${BENCH_RETRY_MAX:-5}"

# every pid on this script's ancestor chain ($$ -> init), so a launch
# from a java-based chain deeper than one level (CI runner, sbt shell
# wrapper) never counts an ANCESTOR JVM as a sibling and burns the
# full backoff for nothing (mirrors MachineProbe.parentChain)
ancestor_chain() {
  local pid=$$ guard=0 stat rest
  while [ "$pid" != "0" ] && [ "$pid" != "1" ] && [ "$guard" -lt 64 ]; do
    echo "$pid"
    stat="$(cat "/proc/$pid/stat" 2>/dev/null || true)"
    [ -z "$stat" ] && break
    # comm (field 2) may contain spaces/parens: fields resume after
    # the LAST ')' — state is next, ppid the one after
    rest="${stat##*)}"
    pid="$(printf '%s' "$rest" | awk '{print $2}')"
    [ -z "$pid" ] && break
    guard=$((guard + 1))
  done
  [ "$pid" = "1" ] && echo 1
}

sibling_jvms() {
  # java/sbt processes that are not on this script's ancestor chain;
  # /proc scan (no pgrep dependency)
  local n=0 pid comm chain
  chain=" $(ancestor_chain | tr '\n' ' ') "
  for f in /proc/[0-9]*/comm; do
    pid="${f#/proc/}"; pid="${pid%/comm}"
    case "$chain" in *" $pid "*) continue ;; esac
    comm="$(cat "$f" 2>/dev/null || true)"
    case "$comm" in
      java|sbt*) n=$((n + 1)) ;;
    esac
  done
  echo "$n"
}

load1() { awk '{print $1}' /proc/loadavg 2>/dev/null || echo -1; }

wait_for_quiet() {
  local tries=0
  while :; do
    local sj load busy
    sj="$(sibling_jvms)"
    load="$(load1)"
    busy=0
    [ "$sj" -gt 0 ] && busy=1
    awk -v l="$load" 'BEGIN { exit !(l > 2.0) }' && busy=1
    if [ "$busy" -eq 0 ]; then return 0; fi
    tries=$((tries + 1))
    if [ "$tries" -gt 10 ]; then
      echo "[bench_retry] machine never went quiet (siblings=$sj load=$load); running anyway — artifact will carry env flags" >&2
      return 0
    fi
    echo "[bench_retry] waiting for quiet machine (siblings=$sj load=$load, try $tries/10)" >&2
    sleep 30
  done
}

run_once() {
  # keep sbt's exit status: a failed build/run must fail the script,
  # not silently write an empty artifact line
  local log line rc
  log="$(mktemp)"
  sbt -batch "runMain graft.Bench" >"$log" 2>&1
  rc=$?
  line="$(grep '"metric"' "$log" | tail -1 || true)"
  if [ "$rc" -ne 0 ] || [ -z "$line" ]; then
    local state="MISSING"
    [ -n "$line" ] && state="present"
    echo "[bench_retry] bench run failed (rc=$rc, metric-line $state); last output:" >&2
    tail -20 "$log" >&2
    rm -f "$log"
    return 1
  fi
  rm -f "$log"
  printf '%s\n' "$line"
}

flagged() { printf '%s' "$1" | grep -Eq '"(contended|env_suspect)":true'; }

# a zero/garbage MAX_ATTEMPTS would skip the loop entirely and write
# an EMPTY artifact with exit 0 — fail loudly instead
case "$MAX_ATTEMPTS" in
  ''|*[!0-9]*) echo "[bench_retry] BENCH_RETRY_MAX must be a positive integer (got '$MAX_ATTEMPTS')" >&2; exit 1 ;;
esac
[ "$MAX_ATTEMPTS" -ge 1 ] || { echo "[bench_retry] BENCH_RETRY_MAX must be >= 1 (got $MAX_ATTEMPTS)" >&2; exit 1; }

attempt=0
line=""
while [ "$attempt" -lt "$MAX_ATTEMPTS" ]; do
  attempt=$((attempt + 1))
  wait_for_quiet
  line="$(run_once)" || exit 1
  if ! flagged "$line"; then
    echo "[bench_retry] clean run on attempt $attempt/$MAX_ATTEMPTS" >&2
    break
  fi
  echo "[bench_retry] flagged run (contended/env_suspect) on attempt $attempt/$MAX_ATTEMPTS" >&2
done
if flagged "$line"; then
  echo "[bench_retry] all $MAX_ATTEMPTS attempts flagged; keeping the last (flags stay in-artifact)" >&2
fi
printf '%s\n' "$line" > "$OUT"
