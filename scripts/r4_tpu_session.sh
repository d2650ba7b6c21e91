#!/bin/sh
# Round-4 TPU measurement session (VERDICT next #2 + #1c).
#
# Stage 0  wait for worker recovery (tiny materialized exec — devices()
#          lies when the worker is wedged, CLAUDE.md gotcha)
# Stage 1  HEAD r2b9q probe, ladder loop, finemap x4 over the x0.5
#          locator — reconciles the session-6 -21% regression and
#          npz-caches fmap_s11_l16_x0.5_f4.npz for the graded bench
# Stage 2  knob sweep: ladder vs flat vs 16k lanes, plus xprof by-kind
# Stage 3  graded-style bench, headline rows first (warms every compile
#          cache entry the graded run will need)
#
# Logs: /tmp/r4_s<stage>.log
set -x
cd /root/repo

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; np.asarray(jnp.ones((8,128))*2); print('LIVE')" 2>/dev/null | grep -q LIVE
}

n=0
until probe; do
  n=$((n+1))
  echo "$(date +%H:%M:%S) wedged ($n)" >> /tmp/r4_s0.log
  sleep 75
done
echo "$(date +%H:%M:%S) RECOVERED" >> /tmp/r4_s0.log

timeout 3600 python scripts/prof_fastq.py --subdiv 11 --finemap 4 \
  --probes batch,bstats --spp 32 --service-cap 0 \
  > /tmp/r4_s1.log 2>&1

timeout 3600 python scripts/prof_fastq.py --subdiv 11 --finemap 4 \
  --probes sweep,xprof --spp 32 --service-cap 0 \
  --sweep 8:1:32:0,8:1:32:-1,8:1:32:0:16384 \
  > /tmp/r4_s2.log 2>&1

BENCH_ROWS=r2b9q_closeup,r2b9q_viewall,r2b4_closeup,r2b8q_closeup \
  timeout 5400 python bench.py > /tmp/r4_s3.log 2>&1

echo DONE >> /tmp/r4_s0.log
