#!/usr/bin/env bash
# Run graft.Bench with environment gating, and retry once when the
# emitted artifact carries a comparability flag:
#   - "contended":true  — the warmed calibration probes spread > 1.3x
#     (machine speed changed mid-run);
#   - "env_suspect":true — the front/back sentinel-subset re-run
#     disagreed > 1.1x, or a sibling JVM was alive (a constant
#     environment offset the probe spread cannot see — the r16
#     committed artifact read ~20% over two clean same-code runs with
#     every mid-run channel flat).
# Before launching at all: if a sibling java/sbt JVM is running or the
# 1-min loadavg exceeds ~2 on what should be an idle box, wait — a
# bench sharing the machine with another build measures the build.
# Usage:
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/bench_retry.sh [out.json]
set -u -o pipefail
OUT="${1:-/dev/stdout}"

sibling_jvms() {
  # java/sbt processes that are neither this script's chain nor its
  # children; /proc scan (no pgrep dependency)
  local n=0 pid comm
  for f in /proc/[0-9]*/comm; do
    pid="${f#/proc/}"; pid="${pid%/comm}"
    comm="$(cat "$f" 2>/dev/null || true)"
    case "$comm" in
      java|sbt*) [ "$pid" != "$$" ] && [ "$pid" != "$PPID" ] && n=$((n + 1)) ;;
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

wait_for_quiet
line="$(run_once)" || exit 1
if printf '%s' "$line" | grep -Eq '"(contended|env_suspect)":true'; then
  echo "[bench_retry] flagged run detected (contended/env_suspect); retrying once" >&2
  wait_for_quiet
  retry="$(run_once)" || exit 1
  line="$retry"
  if printf '%s' "$line" | grep -Eq '"(contended|env_suspect)":true'; then
    echo "[bench_retry] retry also flagged; keeping it (flags stay in-artifact)" >&2
  fi
fi
printf '%s\n' "$line" > "$OUT"
