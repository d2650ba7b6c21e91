"""Unstructured-element point containment + interpolation via Newton
iteration on parametric coordinates.

Port of the reference's OpenVKL-derived intersectors
(ref: icon_rt/UElems.h): pyramid (5 verts, :78-172), wedge/prism (6 verts,
:215-311 — the one used for ICON columns), hexahedron (8 verts, :374-471).
One generic masked Newton driver parameterized by shape-function tables;
10-iteration cap, convergence 1e-4, divergence 1e6, outside tolerance 1e-6,
determinant tolerance = |bbox.size()|^2 * 1e-6 — all as in the reference.

Faithful quirk: the reference evaluates the interpolation weights of the
LAST EXECUTED iteration (computed from the pre-update pcoords) while the
inside-cell test uses the post-update pcoords; we reproduce both.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_ITERATION = 10
CONVERGED = 1e-4
DIVERGED = 1e6
OUTSIDE_CELL_TOLERANCE = 1e-6


def _det3(a, b, c):
    """Determinant of the 3x3 matrix with columns a, b, c."""
    return jnp.sum(a * jnp.cross(b, c))


def _wedge_shape(pc):
    r, s, t = pc[0], pc[1], pc[2]
    return jnp.stack([(1 - r - s) * (1 - t), r * (1 - t), s * (1 - t),
                      (1 - r - s) * t, r * t, s * t])


def _wedge_derivs(pc):
    r, s, t = pc[0], pc[1], pc[2]
    dr = jnp.stack([-1 + t, 1 - t, jnp.zeros_like(t), -t, t, jnp.zeros_like(t)])
    ds = jnp.stack([-1 + t, jnp.zeros_like(t), 1 - t, -t, jnp.zeros_like(t), t])
    dt = jnp.stack([-1 + r + s, -r, -s, 1 - r - s, r, s])
    return dr, ds, dt


def _pyr_shape(pc):
    r, s, t = pc[0], pc[1], pc[2]
    rm, sm, tm = 1 - r, 1 - s, 1 - t
    return jnp.stack([rm * sm * tm, r * sm * tm, r * s * tm, rm * s * tm, t])


def _pyr_derivs(pc):
    r, s, t = pc[0], pc[1], pc[2]
    z = jnp.zeros_like(t)
    dr = jnp.stack([-(s - 1) * (t - 1), (s - 1) * (t - 1), s - s * t,
                    s * (t - 1), z])
    ds = jnp.stack([-(r - 1) * (t - 1), r * (t - 1), r - r * t,
                    (r - 1) * (t - 1), z])
    dt = jnp.stack([-(r - 1) * (s - 1), r * (s - 1), -r * s, (r - 1) * s,
                    jnp.ones_like(t)])
    return dr, ds, dt


def _hex_shape(pc):
    r, s, t = pc[0], pc[1], pc[2]
    rm, sm, tm = 1 - r, 1 - s, 1 - t
    return jnp.stack([rm * sm * tm, r * sm * tm, r * s * tm, rm * s * tm,
                      rm * sm * t, r * sm * t, r * s * t, rm * s * t])


def _hex_derivs(pc):
    r, s, t = pc[0], pc[1], pc[2]
    rm, sm, tm = 1 - r, 1 - s, 1 - t
    dr = jnp.stack([-sm * tm, sm * tm, s * tm, -s * tm,
                    -sm * t, sm * t, s * t, -s * t])
    ds = jnp.stack([-rm * tm, -r * tm, r * tm, rm * tm,
                    -rm * t, -r * t, r * t, rm * t])
    dt = jnp.stack([-rm * sm, -r * sm, -r * s, -rm * s,
                    rm * sm, r * sm, r * s, rm * s])
    return dr, ds, dt


def _newton(P, V, S, shape_fn, deriv_fn, extra_inside_fn):
    """Masked Newton inversion; V (nv, 3), S (nv,).
    Returns (inside: bool, value: f32)."""
    bbox = V.max(axis=0) - V.min(axis=0)
    tol = jnp.sum(bbox * bbox) * 1e-6

    pc0 = jnp.full(3, 0.5, jnp.float32)
    w0 = shape_fn(pc0)

    def body(_, carry):
        pc, w_last, converged, failed = carry
        active = ~(converged | failed)
        w = shape_fn(pc)
        dr, ds, dt = deriv_fn(pc)
        fcol = jnp.sum(V * w[:, None], axis=0) - P
        rcol = jnp.sum(V * dr[:, None], axis=0)
        scol = jnp.sum(V * ds[:, None], axis=0)
        tcol = jnp.sum(V * dt[:, None], axis=0)
        d = _det3(rcol, scol, tcol)
        fail_now = active & (jnp.abs(d) < tol)
        ok = active & ~fail_now
        d_safe = jnp.where(jnp.abs(d) < 1e-30, 1.0, d)
        d0 = _det3(fcol, scol, tcol) / d_safe
        d1 = _det3(rcol, fcol, tcol) / d_safe
        d2 = _det3(rcol, scol, fcol) / d_safe
        pc_new = pc - jnp.stack([d0, d1, d2])
        conv_now = ok & (jnp.abs(d0) < CONVERGED) & (jnp.abs(d1) < CONVERGED) \
            & (jnp.abs(d2) < CONVERGED)
        div_now = ok & ~conv_now & jnp.any(jnp.abs(pc_new) > DIVERGED)
        pc = jnp.where(ok, pc_new, pc)
        w_last = jnp.where(ok, w, w_last)
        return (pc, w_last, converged | conv_now, failed | fail_now | div_now)

    pc, w_last, converged, failed = jax.lax.fori_loop(
        0, MAX_ITERATION, body, (pc0, w0, jnp.bool_(False), jnp.bool_(False)))

    lo = jnp.float32(0.0 - OUTSIDE_CELL_TOLERANCE)
    hi = jnp.float32(1.0 + OUTSIDE_CELL_TOLERANCE)
    in_box = jnp.all((pc >= lo) & (pc <= hi))
    inside = converged & ~failed & in_box & extra_inside_fn(pc, hi)
    value = jnp.sum(w_last * S)
    return inside, jnp.where(inside, value, 0.0)


def intersect_wedge(P, V, S):
    """Point-in-wedge + interpolated scalar (ref: UElems.h:215-311).
    P (3,), V (6, 3), S (6,)."""
    return _newton(P, V, S, _wedge_shape, _wedge_derivs,
                   lambda pc, hi: pc[0] + pc[1] <= hi)


def intersect_pyramid(P, V, S):
    """ref: UElems.h:78-172. P (3,), V (5, 3), S (5,)."""
    return _newton(P, V, S, _pyr_shape, _pyr_derivs, lambda pc, hi: True)


def intersect_hex(P, V, S):
    """ref: UElems.h:374-471. P (3,), V (8, 3), S (8,)."""
    return _newton(P, V, S, _hex_shape, _hex_derivs, lambda pc, hi: True)
