#!/usr/bin/env python
"""Pre-build (and npz-cache) the dense locator bins for a synthetic scene
on the HOST, so a later TPU session skips the ~25 min binning pass.

Reads only lat/lon from the qscene npz cache (loading the full QuantScene
would materialize ~10 GB of tables this pass never touches).

Usage: JAX_PLATFORMS=cpu python scripts/build_locator_npz.py \
           --subdiv 11 --layers 16 --scale 0.5
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# force CPU for real: JAX_PLATFORMS=cpu alone does NOT stop the axon
# relay backend from initializing (README gotcha) — and this build must
# never touch (or wait on) the TPU worker
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=11)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--scale", type=float, default=0.5)
    args = ap.parse_args()

    from icon_rt_tpu.data.bigscene import (_CACHE_DIR,
                                           build_locator_csr_from_scene,
                                           locator_cache_path,
                                           synth_quantized_cached)

    key = f"s{args.subdiv}_l{args.layers}"
    out = locator_cache_path(key, args.scale)
    if os.path.exists(out):
        z = np.load(out)
        print(f"already cached: {out} k_cap={int(z['k_cap'])} "
              f"dims={z['dims'].tolist()}")
        return

    t0 = time.time()
    qpath = os.path.join(_CACHE_DIR, f"qscene_{key}.npz")
    if os.path.exists(qpath):
        z = np.load(qpath)

        class _SC:  # lat/lon/num_cells carrier (all the binning reads)
            lat = z["lat"]
            lon = z["lon"]
            num_cells = z["lat"].shape[0]
        sc = _SC()
        print(f"lat/lon loaded from cache in {time.time() - t0:.0f}s "
              f"({sc.num_cells} cells)", flush=True)
    else:
        sc = synth_quantized_cached(args.subdiv, args.layers)
        print(f"scene synthesized in {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    loc, k_cap = build_locator_csr_from_scene(sc, cache_key=key,
                                              dims_scale=args.scale)
    dims = np.asarray(loc.dims).tolist()
    print(f"locator built+cached in {time.time() - t0:.0f}s: "
          f"dims={dims} k_cap={k_cap} "
          f"dense={np.asarray(loc.bins).nbytes / 1e9:.2f} GB -> {out}",
          flush=True)


if __name__ == "__main__":
    main()
