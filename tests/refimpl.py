"""Scalar numpy oracle: an independent, straightforward transliteration of
the reference renderer's per-pixel semantics (icon_rt/deviceCode.cu), used
to validate the vectorized JAX engine.  Deliberately slow and simple.

Float32 discipline: every intermediate is float32, matching CUDA single
precision up to libm ULP differences.
"""
from __future__ import annotations

import numpy as np

from icon_rt_tpu.utils.lcg import np_lcg_init, np_lcg_next

F = np.float32


class Rng:
    def __init__(self, v0, v1):
        self.state = np_lcg_init(np.uint32(v0 & 0xFFFFFFFF), np.uint32(v1 & 0xFFFFFFFF))

    def __call__(self):
        self.state, v = np_lcg_next(self.state)
        return F(v)


def to_spherical(p):
    r = np.sqrt(np.sum(p * p, dtype=F))
    return np.array([r, np.arcsin(p[2] / r), np.arctan2(p[1], p[0])], F)


def to_cartesian(s):
    r, lat, lon = s
    cl = np.cos(lat, dtype=F)
    return np.array([r * cl * np.cos(lon, dtype=F),
                     r * cl * np.sin(lon, dtype=F),
                     r * np.sin(lat, dtype=F)], F)


def make_plane(a, b, c):
    n = np.cross(b - a, c - a).astype(F)
    return np.concatenate([n, [np.sum(a * n, dtype=F)]]).astype(F)


def eval_plane(p, pos):
    return F(np.sum(pos * p[:3], dtype=F) - p[3])


def find_height(height, num_layers, hpos):
    for i in range(num_layers):
        if hpos <= height[i + 1]:
            return i
    return num_layers  # unreachable given the radial check


def sample_cell(ds, i, pos):
    """Point-in-prism + value (ref: ICONGrid.h:181-208). Returns (hit, value)."""
    sph = to_spherical(pos)
    h = ds.height[i]
    nl = int(ds.num_layers[i])
    if sph[0] < h[0] or sph[0] > h[nl]:
        return False, F(0)
    bv = [to_cartesian(np.array([h[0], ds.lat[i, k], ds.lon[i, k]], F)) for k in range(3)]
    tv = [to_cartesian(np.array([h[nl], ds.lat[i, k], ds.lon[i, k]], F)) for k in range(3)]
    for (a, b, t) in ((0, 1, 1), (1, 2, 2), (2, 0, 0)):
        if eval_plane(make_plane(bv[a], bv[b], tv[t]), pos) > 0.0:
            return False, F(0)
    layer = find_height(h, nl, sph[0])
    return True, F(ds.value[i, layer])


def sample_volume_brute(ds, pos):
    for i in range(ds.num_cells):
        hit, v = sample_cell(ds, i, pos)
        if hit:
            return True, v
    return False, F(0)


def post_classify(lut, value_range, opacity_scale, v):
    size = lut.shape[0]
    v = F((v - value_range[0]) / (value_range[1] - value_range[0]))
    idx = int(v * size)  # trunc toward zero
    frac = F(v * size - idx)
    v1 = lut[min(max(idx, 0), size - 1)]
    v2 = lut[min(max(idx + 1, 0), size - 1)]
    return (v1 * frac + v2 * (F(1) - frac) * np.array([1, 1, 1, opacity_scale], F)).astype(F)


def box_test(org, direction, tmin, tmax, lo, hi):
    t_lo = (lo - org) / direction
    t_hi = (hi - org) / direction
    t0 = max(tmin, np.minimum(t_lo, t_hi).max())
    t1 = min(tmax, np.maximum(t_lo, t_hi).min())
    return t0 < t1, F(t0), F(t1)


def generate_ray(rng, x, y, cam):
    org, dir00, du, dv = cam
    u = F(x + 0.5 + rng())
    v = F(y + 0.5 + rng())
    d = (dir00 + u * du + v * dv).astype(F)
    d = d / np.sqrt(np.sum(d * d, dtype=F))
    d = np.where(np.abs(d) < 1e-5, F(1e-5), d).astype(F)
    return org.astype(F), d


def woodcock(ds, lut, value_range, opacity_scale, rng, org, direction,
             tmin, tmax, majorant, unit_distance, sample_fn=None):
    """ref: deviceCode.cu:149-186. Returns (t, albedo, extinction)."""
    sample_fn = sample_fn or (lambda pos: sample_volume_brute(ds, pos))
    t = F(tmin)
    albedo = np.zeros(3, F)
    extinction = F(0)
    while True:
        if majorant <= 0.0:
            break
        t = F(t - np.log(F(1) - rng(), dtype=F) / F(majorant / unit_distance))
        if t > tmax:
            break
        pos = (org + direction * t).astype(F)
        hit, value = sample_fn(pos)
        if not hit:
            continue
        rgba = post_classify(lut, value_range, opacity_scale, value)
        u = rng()
        if rgba[3] >= u * majorant:
            albedo = rgba[:3].copy()
            extinction = rgba[3]
            break
    return F(min(t, tmax)), albedo, extinction


def linear_to_srgb(x):
    if x <= 0.0031308:
        return F(12.92 * x)
    return F(1.055 * np.power(x, F(1.0 / 2.4), dtype=F) - 0.055)


def make_8bit(f):
    return min(255, max(0, int(f * 256)))


def make_rgba(c):
    return (make_8bit(c[0]) | (make_8bit(c[1]) << 8)
            | (make_8bit(c[2]) << 16) | (make_8bit(c[3]) << 24))


def render_ae(ds, lut, value_range, opacity_scale, cam, width, height,
              bounds_lo, bounds_hi, unit_distance=1.0, ambient_color=(1, 1, 1),
              ambient_radiance=1.0, num_samples=1, sample_fn=None):
    """Full oracle render of raygen woodcockTrackingAE
    (ref: deviceCode.cu:239-275).  Returns (accum (H*W,4) f32, fb (H*W,) u32)."""
    accum = np.zeros((width * height, 4), F)
    fb = np.zeros(width * height, np.uint32)
    ambient = (np.asarray(ambient_color, F) * F(ambient_radiance)).astype(F)
    for accum_id in range(num_samples):
        for y in range(height):
            for x in range(width):
                pixel = x + y * width
                rng = Rng((accum_id * width * height + x) & 0xFFFFFFFF, y)
                org, d = generate_ray(rng, x, y, cam)
                hit, t0, t1 = box_test(org, d, F(0), F(1e10), bounds_lo, bounds_hi)
                if not hit:
                    continue
                _, albedo, extinction = woodcock(
                    ds, lut, value_range, opacity_scale, rng, org, d,
                    t0, t1, F(1.0), F(unit_distance), sample_fn)
                color = (albedo * ambient).astype(F)
                alpha = F(1.0) if extinction > 0 else F(0.0)
                s = F(1.0 / (accum_id + 1))
                new = np.concatenate([color, [alpha]]).astype(F)
                accum[pixel] = (s * new + (F(1) - s) * accum[pixel]).astype(F)
                out = accum[pixel].copy()
                out[0] = linear_to_srgb(out[0])
                out[1] = linear_to_srgb(out[1])
                out[2] = linear_to_srgb(out[2])
                fb[pixel] = make_rgba(out)
    return accum, fb
