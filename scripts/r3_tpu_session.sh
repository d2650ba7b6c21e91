#!/bin/sh
# Round-3 TPU measurement session, phase 2 (post-reset: all XLA caches
# cold, scene npz for s11 survives).  Ordered information-first: the
# xprof attribution of the r2b9q residual (~90 ns/lane-phase) gates the
# next optimization, then the graded bench checkpoints the landed wins
# (finemap two-stage refresh, S=32 in-lane batching, incremental TF bake).
# Budget: ~1 h per stage cold (scene synth ~15 min + finemap ~8 min +
# compiles minutes each through the relay).
set -x
cd /root/repo
LOG=/tmp/r3_tpu.log

# 0. confirm the worker is actually alive
timeout 120 python -c "import jax; print(jax.devices())" >> $LOG 2>&1 || exit 1

# 1. attribution run at the bench headline config (S=32): batch timing,
#    primary hit rate, loop stats, and the xplane trace of one real call
timeout 5400 python scripts/prof_fastq.py --subdiv 11 --spp 32 \
    --probes batch,hitrate,bstats,xprof --finemap 2 >> $LOG 2>&1

# 2. full graded bench (headline + all rows + TF edit/stroke); watchdog
#    budget covers cold finemap builds + q-row compiles
timeout 7200 env BENCH_WATCHDOG_S=7000 python bench.py >> $LOG 2>&1

tail -60 $LOG
