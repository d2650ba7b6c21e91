#!/bin/sh
# Round-3 TPU measurement session — run top-to-bottom when the worker
# returns (see docs/ROUND3.md "TPU outage note").  Ordered so each stage's
# result gates the next; every stage appends to /tmp/r3_tpu.log and is
# individually time-bounded.  Compiles at R2B9 shapes cost minutes each
# through the relay: budget ~1 h for a full pass, cache warm after that.
set -x
cd /root/repo
LOG=/tmp/r3_tpu.log

# 0. confirm the worker is actually alive
timeout 120 python -c "import jax; print(jax.devices())" >> $LOG 2>&1 || exit 1

# 1. (done 2026-08-18, killed) Pallas row-DMA probe: dma 35.1 vs xla
#    9.5 ns/row at n=8.4M/m=8192 — measurement in docs/ROUND3.md.
# 2a. (done 2026-08-18) finemap-off baseline on the real batched r2b9q
#     call: 427.0 ms/call (1.23 Msamples/s) — matches docs/ROUND3.md 420.
#     First --finemap 2 attempt OOMed the build (512 MB gather budget next
#     to the 10.7 GB scene + 2.7 GB map); budget now 96 MB.

# 2b. finemap effect on the real batched r2b9q call (the round-3 lever)
timeout 3600 python scripts/prof_fastq.py --subdiv 11 --probes batch,hitrate,bstats \
    --finemap 2 >> $LOG 2>&1

# 3. knob sweep at the winning finemap setting (bstats prints pend/refresh)
timeout 3600 python scripts/prof_fastq.py --subdiv 11 --probes batch,bstats \
    --finemap 2 --compact 1024 >> $LOG 2>&1

# 4. full graded bench (headline + all rows + TF edit/stroke); the
#    watchdog budget covers two cold finemap builds + q-row compiles
timeout 5400 env BENCH_WATCHDOG_S=5200 python bench.py >> $LOG 2>&1

tail -40 $LOG
