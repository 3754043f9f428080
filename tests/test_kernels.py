"""Pallas kernel tests (CPU: interpret mode + SoA/AoS agreement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu.core.types import SignedDistancePrimitive
from gpuraytracer_tpu.geometry import sdf
from gpuraytracer_tpu.geometry.fractal import ExtendedSignedDistancePrimitive
from gpuraytracer_tpu.kernels import megakernel, soa


@pytest.fixture(scope="module")
def sample_points(rng):
    pts = rng.uniform(-1.5, 1.5, size=(256, 3)).astype(np.float32)
    return jnp.asarray(pts)


ALL_CODES = [int(p) for p in SignedDistancePrimitive] + [
    int(ExtendedSignedDistancePrimitive.MANDELBULB),
    int(ExtendedSignedDistancePrimitive.JULIA_QUATERNION),
]


@pytest.mark.parametrize("code", ALL_CODES)
def test_soa_matches_aos(code, sample_points):
    """The SoA (kernel) distance functions must match the AoS (XLA)
    implementations. torus82's x^(1/8) uses 3 sqrts instead of pow in the
    SoA form and the cog/mandelbulb use a polynomial atan2, so tolerance is
    loose-ulp rather than exact."""
    p = sample_points
    aos = np.asarray(sdf.DISTANCE_FUNCTIONS[code](p))
    v = soa.V3(p[:, 0], p[:, 1], p[:, 2])
    s = np.asarray(soa.DISTANCE_FUNCTIONS_SOA[code](v))
    np.testing.assert_allclose(s, aos, rtol=2e-5, atol=2e-5)


def test_atan2_matches_numpy(rng):
    y = rng.uniform(-3, 3, 4096).astype(np.float32)
    x = rng.uniform(-3, 3, 4096).astype(np.float32)
    approx = np.asarray(soa.atan2(jnp.asarray(y), jnp.asarray(x)))
    exact = np.arctan2(y, x)
    np.testing.assert_allclose(approx, exact, atol=3e-6)
    # Axis / origin conventions.
    assert float(soa.atan2(jnp.float32(0.0), jnp.float32(0.0))) == 0.0
    assert float(soa.atan2(jnp.float32(0.0), jnp.float32(-1.0))) == pytest.approx(np.pi, abs=1e-5)


def test_acos_matches_numpy(rng):
    x = rng.uniform(-1, 1, 1024).astype(np.float32)
    approx = np.asarray(soa.acos(jnp.asarray(x)))
    np.testing.assert_allclose(approx, np.arccos(x), atol=1e-5)


def test_pow8_root():
    v = jnp.asarray([0.0, 1.0, 256.0, 1e-6], dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(soa.pow8_root(v)), np.power(np.asarray(v), 0.125), rtol=1e-6
    )


class TestTileKernelInterpret:
    """Kernel semantics vs the XLA wavefront path, via interpret mode."""

    def _rays(self):
        H, W = 16, 128
        ys, xs = jnp.meshgrid(
            jnp.linspace(-1.2, 1.2, H), jnp.linspace(-1.2, 1.2, W), indexing="ij"
        )
        o = jnp.stack([xs, ys, jnp.full_like(xs, -5.0)], axis=-1)
        d = jnp.zeros_like(o).at[..., 2].set(1.0)
        gate = jnp.ones((H, W), dtype=bool)
        tmax = jnp.full((H, W), 1e4, dtype=jnp.float32)
        return o, d, gate, tmax

    def test_matches_xla_path(self):
        o, d, gate, tmax = self._rays()
        code = int(SignedDistancePrimitive.FRACTAL_PYRAMID)
        hit_p, t_p, n_p = map(
            np.asarray,
            megakernel.sphere_trace_tiles(
                o, d, gate, tmax, 0.8, prim_code=code, interpret=True
            ),
        )
        fn = sdf.DISTANCE_FUNCTIONS[code]
        hit_x, t_x, n_x = map(
            np.asarray,
            jax.jit(
                lambda o, d, g, tm: sdf.sphere_trace(
                    o, d, fn, step_scale=0.8, t_max=tm,
                    cull_backface=True, active=g,
                )
            )(o, d, gate, tmax),
        )
        assert (hit_p == hit_x).all()
        m = hit_p
        assert m.any()
        np.testing.assert_allclose(t_p[m], t_x[m], atol=1e-5)
        # Tetrahedral-gradient normals amplify last-ulp differences in the
        # distance eval (fma fusion differs between paths); 1e-3 is the
        # radiance parity budget.
        np.testing.assert_allclose(n_p[m], n_x[m], atol=1e-3)

    def test_gate_masks_out(self):
        o, d, gate, tmax = self._rays()
        gate = gate & False
        hit, t, _ = megakernel.sphere_trace_tiles(
            o, d, gate, tmax, 1.0,
            prim_code=int(SignedDistancePrimitive.SQUARE_TORUS), interpret=True,
        )
        assert not bool(np.asarray(hit).any())

    def test_unaligned_shapes_padded(self):
        H, W = 13, 57  # not tile multiples
        o = jnp.zeros((H, W, 3), dtype=jnp.float32).at[..., 2].set(-5.0)
        d = jnp.zeros((H, W, 3), dtype=jnp.float32).at[..., 2].set(1.0)
        gate = jnp.ones((H, W), dtype=bool)
        tmax = jnp.full((H, W), 1e4, dtype=jnp.float32)
        hit, t, n = megakernel.sphere_trace_tiles(
            o, d, gate, tmax, 1.0,
            prim_code=int(SignedDistancePrimitive.SQUARE_TORUS), interpret=True,
        )
        assert hit.shape == (H, W)
        # Head-on ray through the torus ring (x=z=0 -> qx=-0.75, |(qx,y)|_8
        # - 0.15 > 0 at center... the center column passes through the
        # hole) — just require the kernel to be finite & consistent.
        assert np.isfinite(np.asarray(t)[np.asarray(hit)]).all()


def test_relaxed_kernel_matches_relaxed_xla():
    """The in-kernel over-relaxed march (megakernel relax=...) implements
    the same Keinert-style algorithm as sdf.sphere_trace(relax=...): same
    overshoot test, same backstep, same retire-on-unrelaxed-reach. On the
    mandelbulb (the production user) the two paths must agree like the
    plain marchers do."""
    from gpuraytracer_tpu.geometry.fractal import ExtendedSignedDistancePrimitive

    H, W = 16, 128
    ys, xs = jnp.meshgrid(
        jnp.linspace(-1.2, 1.2, H), jnp.linspace(-1.2, 1.2, W), indexing="ij"
    )
    o = jnp.stack([xs, ys, jnp.full_like(xs, -3.0)], axis=-1)
    d = jnp.zeros_like(o).at[..., 2].set(1.0)
    gate = jnp.ones((H, W), dtype=bool)
    tmax = jnp.full((H, W), 1e4, dtype=jnp.float32)
    code = int(ExtendedSignedDistancePrimitive.MANDELBULB)
    hit_p, t_p, _ = map(
        np.asarray,
        megakernel.sphere_trace_tiles(
            o, d, gate, tmax, 1.0, prim_code=code, cull_backface=False,
            relax=1.6, interpret=True,
        ),
    )
    fn = sdf.DISTANCE_FUNCTIONS[code]
    hit_x, t_x, _ = map(
        np.asarray,
        jax.jit(
            lambda o, d, g, tm: sdf.sphere_trace(
                o, d, fn, step_scale=1.0, t_max=tm, cull_backface=False,
                active=g, escape_bound=False, relax=1.6,
            )
        )(o, d, gate, tmax),
    )
    assert (hit_p == hit_x).mean() > 0.999
    m = hit_p & hit_x
    assert m.any()
    np.testing.assert_allclose(t_p[m], t_x[m], atol=1e-4)
