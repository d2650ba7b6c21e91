#!/bin/sh
# Round-3 TPU measurement session, phase 3: the flat-service campaign.
#
# Prerequisite: the half-grid locator npz for subdiv 11 must exist
# (scripts/build_locator_npz.py --subdiv 11 --scale 0.5 — ~1-2 h of host
# binning, run it BEFORE this session).
#
# Stages:
#   1. r2b9q A/B — legacy cond-ladder loop (service_cap 0) vs the flat
#      packed-carry loop (auto cap), same scene (12-wide test12, half-grid
#      locator, finemap x4 == the old x2 fine resolution).
#   2. flat-loop knob sweep (spr, spp, capacity via env).
#   3. graded bench (per-row subprocesses, flat default).
#   4. real-data ingest end-to-end ON TPU (round-3 run was CPU-only).
set -x
cd /root/repo
LOG=/tmp/r3_tpu3.log

test -f /root/.cache/icon_rt_tpu_scenes/qloc2_s11_l16_x0.5.npz || {
    echo "half-grid locator npz missing — run build_locator_npz.py first" \
        | tee -a $LOG; exit 1; }

# 0. worker alive?  Retry up to ~40 min: another probe process may hold
# the exclusive axon device, or the worker may be mid-recovery.
i=0
until timeout 120 python -c "import jax; print(jax.devices())" >> $LOG 2>&1
do
    i=$((i+1)); [ $i -ge 20 ] && exit 1; sleep 120
done

# 1a. legacy loop baseline on the new memory layout
timeout 4800 python scripts/prof_fastq.py --subdiv 11 --spp 32 \
    --probes batch,bstats --service-cap 0 --finemap 4 >> $LOG 2>&1

# 1b. flat loop: batch + stats + sweep + xprof (one process, one scene)
timeout 6000 python scripts/prof_fastq.py --subdiv 11 --spp 32 \
    --probes batch,bstats,sweep,xprof \
    --sweep 4:1:32,8:1:32,16:1:32,8:1:64 --finemap 4 >> $LOG 2>&1

# 2. graded bench (flat default); per-row subprocesses
timeout 7200 env BENCH_WATCHDOG_S=7000 python bench.py >> $LOG 2>&1

# 3. real-data ingest -> render on the TPU backend
timeout 3600 python scripts/e2e_netcdf.py --samples 16 \
    --png docs/images/e2e_netcdf_r2b7_tpu.png >> $LOG 2>&1

tail -100 $LOG
