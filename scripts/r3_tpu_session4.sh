#!/bin/sh
# Round-3 TPU measurement session, phase 4: full-grid restore + A/B.
#
# The u8 finemap (f21bd6d) freed ~2 GB of HBM, which lets the FULL
# locator grid (k_cap=18, measured 136 ms/call in session 3) back in —
# the half-grid memory diet cost 37% (186-192 ms/call, session 6 log).
# Resident set at full grid: test12 4.30 + value_q 1.34 + alpha_q 1.34
# + dense locator 3.02 + finemap u8 0.67 = 10.7 GB (vs the 13.75 edge).
#
# Prerequisite: scripts/build_locator_npz.py --subdiv 11 --scale 1.0
#
# Stages:
#   1. one prof process at full grid, finemap x2 (npz-cached after the
#      first build): ladder batch+bstats+xprof+hlo, then a sweep that
#      A/Bs flat-vs-ladder and lane counts 8k/16k/32k.
#   2. graded bench at full grid (per-row subprocesses).
#   3. real-data ingest end-to-end ON TPU.
set -x
cd /root/repo
LOG=/tmp/r3_tpu4.log

test -f /root/.cache/icon_rt_tpu_scenes/qloc2_s11_l16.npz || {
    echo "full-grid locator npz missing — run build_locator_npz.py" \
        | tee -a $LOG; exit 1; }

i=0
until timeout 120 python -c "import jax; print(jax.devices())" >> $LOG 2>&1
do
    i=$((i+1)); [ $i -ge 20 ] && exit 1; sleep 120
done

# 1. full-grid probes: ladder baseline + flat/lanes A/B (one process)
timeout 9000 python scripts/prof_fastq.py --subdiv 11 --spp 32 \
    --loc-scale 1.0 --finemap 2 --service-cap 0 \
    --probes batch,bstats,sweep,hlo,xprof \
    --sweep 8:1:32:-1,8:1:32:0:16384,8:1:32:-1:16384,8:1:32:0:32768 \
    >> $LOG 2>&1

# 2. graded bench at full grid; ladder loop everywhere (the best-known
# r2b9q config — session 3's 136 ms/call was the ladder; flat's auto
# gate at >= 16M cells is under re-measurement in stage 1's sweep)
timeout 10800 env BENCH_WATCHDOG_S=10000 BENCH_LOC_SCALE=1 \
    BENCH_SERVICE_CAP=0 python bench.py >> $LOG 2>&1

# 3. real-data ingest -> render on the TPU backend
timeout 3600 python scripts/e2e_netcdf.py --samples 16 \
    --png docs/images/e2e_netcdf_r2b7_tpu.png >> $LOG 2>&1

tail -120 $LOG
