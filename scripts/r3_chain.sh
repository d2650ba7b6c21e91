#!/bin/sh
# Chain driver: wait for the half-grid locator npz build to finish, then
# run the graded-surface dryrun check (CPU mesh) and the full TPU session.
set -x
cd /root/repo
NPZ=/root/.cache/icon_rt_tpu_scenes/qloc2_s11_l16_x0.5.npz

# 1. wait for the binning job (poll; it writes the npz atomically last)
while [ ! -f "$NPZ" ]; do sleep 60; done
sleep 30   # let the writer close + exit

# 2. graded-surface check: the multichip dryrun must still compile+run
#    after the flat-loop/12-wide changes (8 virtual CPU devices)
timeout 3000 env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
print('DRYRUN OK')" > /tmp/dryrun_check.log 2>&1

# 3. the TPU measurement session
sh scripts/r3_tpu_session3.sh > /tmp/r3_s3_driver.log 2>&1
