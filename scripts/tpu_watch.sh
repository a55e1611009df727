#!/bin/bash
# TPU tunnel watchdog (CLAUDE.md wedge playbook, automated): probe the axon
# tunnel with a tiny bounded matmul until it answers, then run the capture
# queue — the full supervised bench (refreshes bench_last_good.json with a
# driver-format emit) followed by any focused experiment commands passed as
# arguments. Everything is timeout-bounded; logs to $GIE_WATCH_LOG
# (default /tmp/tpu_watch.log).
set -u
LOG="${GIE_WATCH_LOG:-/tmp/tpu_watch.log}"
INTERVAL="${GIE_WATCH_INTERVAL:-240}"
MAX_PROBES="${GIE_WATCH_MAX_PROBES:-200}"
echo $$ > "${GIE_WATCH_PIDFILE:-/tmp/tpu_watch.pid}"
cd "$(dirname "$0")/.."

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print('TPU OK', float(jnp.sum((x @ x).astype(jnp.float32))))
" >>"$LOG" 2>&1
}

echo "watchdog start $(date)" >>"$LOG"
n=0
until probe; do
  n=$((n + 1))
  echo "probe $n failed $(date)" >>"$LOG"
  if [ "$n" -ge "$MAX_PROBES" ]; then
    echo "giving up after $n probes $(date)" >>"$LOG"
    exit 1
  fi
  sleep "$INTERVAL"
done
echo "tunnel healthy after $n failed probes $(date)" >>"$LOG"

timeout 7200 python bench.py >/tmp/bench_supervised.json 2>>"$LOG"
echo "supervised bench rc=$? $(date)" >>"$LOG"
cat /tmp/bench_supervised.json >>"$LOG"

# focused experiment commands, one per argument (each run via bash -c).
# Re-probe before each: a wedged tunnel would otherwise burn the full
# per-command timeout hanging on the command's first TPU op.
for cmd in "$@"; do
  n=0
  until probe; do
    n=$((n + 1))
    echo "pre-experiment probe $n failed $(date)" >>"$LOG"
    if [ "$n" -ge "$MAX_PROBES" ]; then
      echo "giving up on remaining experiments $(date)" >>"$LOG"
      exit 1
    fi
    sleep "$INTERVAL"
  done
  echo "experiment: $cmd $(date)" >>"$LOG"
  timeout "${GIE_WATCH_EXP_TIMEOUT:-3600}" bash -c "$cmd" >>"$LOG" 2>&1
  echo "experiment rc=$? $(date)" >>"$LOG"
done
echo "experiment queue drained $(date)" >>"$LOG"
