"""Level-of-detail mip tiers for icosphere scenes.

The reference renders the full-resolution field regardless of framing
(ref: icon_rt/deviceCode.cu:281-341 — one fixed cell set).  At R2B9 on a
1080p frame the cells are SUBPIXEL (~3.4 km edge vs ~5 km pixel footprint
at the closeup framing), so the full-resolution walk pays locator traffic
for detail the image cannot resolve — and aliases it as extra Monte-Carlo
variance.  A value-space mip chain fixes both: render the level whose
cell size matches the pixel footprint.

Index rule.  Cell i of a subdivision-s icosphere decomposes as
`base = i % 20`, child path = base-4 digits of i // 20 with the LSB the
FIRST subdivision (data/device_scene.py).  The digit added by the LAST
subdivision is therefore the most significant, with place value
20 * 4^(s-1) = n/4, so

    parent(i)   = i mod (n / 4)
    children(p) = { p + d * (n / 4) : d in 0..3 }
    descendants of p after l more levels = { p + m * n_coarse : m < 4^l }

Geometry of mip level l IS the subdivision-(s-l) icosphere (triangle
midpoint subdivision partitions each parent triangle exactly), so only
the FIELD is derived: per-layer 4:1 mean pooling per level, in VALUE
space — classification stays at sample time, preserving the reference's
sampling order (ref: icon_rt/deviceCode.cu:127-135).  The estimator on a
mip tier is the standard unbiased delta tracker for THAT tier's field
(VERDICT r3 next #3b).  `device_scene.synth_quantized_device(s-l, ...,
field_lod=l)` builds the tier on-device; its locator and fine map are
plain subdivision-(s-l) artifacts (geometry-only), shared with any other
scene of that subdivision via the npz caches.
"""
from __future__ import annotations

import numpy as np

#: central angle of an icosahedron edge: arccos(1/sqrt(5)) ~ 63.435deg
_ICO_EDGE_RAD = float(np.arccos(1.0 / np.sqrt(5.0)))


def parent_index(i, n: int):
    """Level-(s-1) parent of cell i in a subdivision-s icosphere of n
    cells (array-friendly)."""
    return i % (n // 4)


def children_indices(p, n_coarse: int) -> list:
    """The 4 subdivision-(s+1) children of coarse cell p (n_coarse =
    coarse-level cell count; children live at index p + d * n_coarse of
    the 4 * n_coarse fine cells)."""
    return [p + d * n_coarse for d in range(4)]


def cell_edge_m(subdivisions: int, radius: float) -> float:
    """Arc length of a cell edge at the given subdivision (meters).
    Midpoint subdivision halves edge angles per level (up to the slight
    non-uniformity of the projected midpoints)."""
    return radius * _ICO_EDGE_RAD / (2.0 ** subdivisions)


def select_lod(cam_org, r_out: float, fovy: float, height: int,
               subdivisions: int, max_lod: int = 4) -> int:
    """Nearest-mip level for a whole frame: lambda = log2(pixel footprint
    at the globe's near point / cell edge), rounded — the standard
    nearest-level mip rule (level 0 when cells are at or above pixel
    size).  Per-frame (not per-ray) selection is exact enough for a
    globe: the camera-to-surface distance varies by < 2x across the
    visible disc, well inside one mip level's 2x bucket."""
    d = float(np.linalg.norm(np.asarray(cam_org, np.float64)))
    d_near = max(d - r_out, 1e-6 * r_out)
    pixel_rad = fovy / height
    footprint = pixel_rad * d_near
    lam = np.log2(max(footprint, 1e-30)
                  / cell_edge_m(subdivisions, r_out))
    return int(np.clip(np.round(lam), 0, max_lod))
