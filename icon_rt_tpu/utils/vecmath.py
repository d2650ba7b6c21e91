"""Vector math for the renderer, as functions over trailing-axis-(3,) arrays.

Where the reference carries a 1.9k-line C++ header of vector classes
(ref: common/vecmath.h), the TPU-native design needs only a thin layer of
jnp helpers: rays, boxes and planes are plain arrays (structs-of-arrays),
and everything batches over leading axes so the same code serves one ray
or a million.

Spherical conventions follow the reference (ref: icon_rt/ICONGrid.h:36-54):
spherical = (r, lat, lon) with lat = asin(z/r), lon = atan2(y, x).
All math is float32.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length(v):
    return jnp.sqrt(dot(v, v))


def normalize(v):
    return v / length(v)[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def deg2rad(d):
    return d * (np.pi / 180.0)


def rad2deg(r):
    return r * (180.0 / np.pi)


def to_spherical(p):
    """Cartesian (..., 3) -> spherical (..., 3) = (r, lat, lon)."""
    r = length(p)
    lat = jnp.arcsin(p[..., 2] / r)
    lon = jnp.arctan2(p[..., 1], p[..., 0])
    return jnp.stack([r, lat, lon], axis=-1)


def to_cartesian(s):
    """Spherical (..., 3) = (r, lat, lon) -> Cartesian (..., 3)."""
    r, lat, lon = s[..., 0], s[..., 1], s[..., 2]
    cl = jnp.cos(lat)
    return jnp.stack([r * cl * jnp.cos(lon), r * cl * jnp.sin(lon), r * jnp.sin(lat)], axis=-1)


def sph(r, lat, lon):
    """Build an (..., 3) spherical coordinate from components."""
    return jnp.stack(jnp.broadcast_arrays(jnp.asarray(r, F32),
                                          jnp.asarray(lat, F32),
                                          jnp.asarray(lon, F32)), axis=-1)


# ---------------------------------------------------------------------------
# Planes.  A plane is an (..., 4) array (nx, ny, nz, w) with the convention
# eval(p, pos) = dot(pos, n) - w (ref: icon_rt/ICONGrid.h:168-179).
# ---------------------------------------------------------------------------

def make_plane(a, b, c):
    n = cross(b - a, c - a)
    return jnp.concatenate([n, dot(a, n)[..., None]], axis=-1)


def eval_plane(plane, pos):
    return dot(pos, plane[..., :3]) - plane[..., 3]


# ---------------------------------------------------------------------------
# Ray/box slab test (ref: common/vecmath.h:1926-1937).  No zero-direction
# guard, exactly like the reference — ray directions are clamped away from
# zero at generation time.
# ---------------------------------------------------------------------------

def box_test(org, direction, tmin, tmax, box_lo, box_hi):
    """Returns (hit, t0, t1); all batched over leading axes."""
    t_lo = (box_lo - org) / direction
    t_hi = (box_hi - org) / direction
    t_nr = jnp.minimum(t_lo, t_hi)
    t_fr = jnp.maximum(t_lo, t_hi)
    t0 = jnp.maximum(tmin, jnp.max(t_nr, axis=-1))
    t1 = jnp.minimum(tmax, jnp.min(t_fr, axis=-1))
    return t0 < t1, t0, t1


def lerp(a, b, x):
    """Reference-convention lerp: x*a + (1-x)*b (ref: common/vecmath.h:56-58).

    Note the argument order quirk: x == 1 returns a.
    """
    return x * a + (1.0 - x) * b


# ---------------------------------------------------------------------------
# NumPy twins for host-side (dataset/build-time) code paths.
# ---------------------------------------------------------------------------

def np_to_cartesian(s):
    s = np.asarray(s, np.float32)
    r, lat, lon = s[..., 0], s[..., 1], s[..., 2]
    cl = np.cos(lat, dtype=np.float32)
    out = np.stack([r * cl * np.cos(lon, dtype=np.float32),
                    r * cl * np.sin(lon, dtype=np.float32),
                    r * np.sin(lat, dtype=np.float32)], axis=-1)
    return out.astype(np.float32)


def np_to_spherical(p):
    p = np.asarray(p, np.float32)
    r = np.sqrt(np.sum(p * p, axis=-1, dtype=np.float32)).astype(np.float32)
    lat = np.arcsin(p[..., 2] / r).astype(np.float32)
    lon = np.arctan2(p[..., 1], p[..., 0]).astype(np.float32)
    return np.stack([r, lat, lon], axis=-1)
