import jax.numpy as jnp
import numpy as np

from icon_rt_tpu.utils import color as colorlib
from icon_rt_tpu.utils.vecmath import (box_test, eval_plane, make_plane, lerp,
                                       to_cartesian, to_spherical,
                                       np_to_cartesian, np_to_spherical, sph)


def test_spherical_roundtrip():
    rs = np.random.RandomState(0)
    p = rs.randn(128, 3).astype(np.float32) * 100.0
    s = to_spherical(jnp.asarray(p))
    p2 = to_cartesian(s)
    np.testing.assert_allclose(np.asarray(p2), p, rtol=2e-5, atol=1e-3)
    # numpy twin agrees with jax
    np.testing.assert_allclose(np_to_spherical(p), np.asarray(s), rtol=1e-6, atol=1e-6)


def test_spherical_conventions():
    # (r, lat, lon): lat = asin(z/r), lon = atan2(y, x)
    s = to_spherical(jnp.asarray([0.0, 0.0, 5.0]))
    assert np.allclose(np.asarray(s), [5.0, np.pi / 2, 0.0], atol=1e-6)
    p = to_cartesian(sph(2.0, 0.0, np.pi / 2))
    assert np.allclose(np.asarray(p), [0.0, 2.0, 0.0], atol=1e-6)


def test_plane():
    a = jnp.asarray([0.0, 0.0, 0.0])
    b = jnp.asarray([1.0, 0.0, 0.0])
    c = jnp.asarray([0.0, 1.0, 0.0])
    pl = make_plane(a, b, c)
    # normal (0,0,1); points above have positive eval
    assert float(eval_plane(pl, jnp.asarray([0.2, 0.2, 3.0]))) > 0
    assert float(eval_plane(pl, jnp.asarray([0.2, 0.2, -3.0]))) < 0
    assert abs(float(eval_plane(pl, jnp.asarray([0.5, 0.5, 0.0])))) < 1e-6


def test_box_test():
    org = jnp.asarray([0.0, 0.0, -10.0])
    d = jnp.asarray([0.0, 0.0, 1.0])
    hit, t0, t1 = box_test(org, d, 0.0, 1e10,
                           jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]))
    assert bool(hit) and np.isclose(float(t0), 9.0) and np.isclose(float(t1), 11.0)
    # miss
    org2 = jnp.asarray([5.0, 0.0, -10.0])
    hit2, _, _ = box_test(org2, d, 0.0, 1e10,
                          jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]))
    assert not bool(hit2)
    # batched
    orgs = jnp.stack([org, org2])
    ds = jnp.stack([d, d])
    hits, _, _ = box_test(orgs, ds, 0.0, 1e10,
                          jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]))
    assert hits.tolist() == [True, False]


def test_lerp_reference_convention():
    # lerp(a, b, x) = x*a + (1-x)*b : x == 1 returns a
    assert float(lerp(jnp.float32(3.0), jnp.float32(7.0), jnp.float32(1.0))) == 3.0
    assert float(lerp(jnp.float32(3.0), jnp.float32(7.0), jnp.float32(0.0))) == 7.0


def test_srgb_golden():
    # golden values from the reference linear_to_srgb compiled host-side
    xs = np.array([0.0, 0.001, 0.0031308, 0.004, 0.18, 0.5, 1.0], np.float32)
    expected = np.array([0.0, 0.0129200006, 0.0404499359, 0.0507087186,
                         0.461356103, 0.735356927, 0.99999994], np.float32)
    got = np.asarray(colorlib.linear_to_srgb(jnp.asarray(xs)))
    # XLA pow vs libm powf differ by ~1e-6, far below tone-map LSB (1/256)
    np.testing.assert_allclose(got, expected, rtol=5e-6, atol=2e-6)


def test_make_rgba():
    c = jnp.asarray([[0.0, 0.5, 1.0, 1.0], [-1.0, 2.0, 0.999, 0.0]], jnp.float32)
    packed = colorlib.make_rgba(c)
    px = colorlib.unpack_rgba(np.asarray(packed))
    # int(0.5*256)=128, int(1.0*256)=256 -> clamp 255
    assert px[0].tolist() == [0, 128, 255, 255]
    assert px[1].tolist() == [0, 255, 255, 0]
