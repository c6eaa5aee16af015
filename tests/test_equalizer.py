import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops import equalizer


def test_mmse_single_port_formula():
    rng = np.random.default_rng(0)
    n = 64
    h = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    nv = 0.1
    y = h * x
    xh, nvo = equalizer.equalize_mmse_1xn(jnp.asarray(y[None]), jnp.asarray(h[None]),
                                          jnp.full((1, n), nv, np.float32))
    want = np.conj(h) * y / (np.abs(h) ** 2 + nv)
    np.testing.assert_allclose(np.asarray(xh), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nvo), nv / (np.abs(h) ** 2 + nv),
                               rtol=1e-4)


def test_mmse_two_ports_mrc_gain():
    """Two ports with equal channels halve the output noise variance."""
    rng = np.random.default_rng(1)
    n = 32
    h = np.ones((2, n), np.complex64)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    y = np.stack([x, x])
    nv = np.full((2, n), 0.2, np.float32)
    xh, nvo = equalizer.equalize_mmse_1xn(jnp.asarray(y), jnp.asarray(h),
                                          jnp.asarray(nv))
    # denom = (2)^2 + 2*0.2 ; out = 2x*2/denom
    np.testing.assert_allclose(np.asarray(xh), 2 * x * 2 / 4.4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nvo), 0.4 / 4.4, rtol=1e-5)


def test_abnormal_inputs():
    y = jnp.asarray(np.ones((1, 4), np.complex64))
    h = jnp.asarray(np.array([[0, 1, np.nan, 1]], np.complex64))
    nv = jnp.asarray(np.array([[0.1, 0.0, 0.1, -1.0]], np.float32))
    xh, nvo = equalizer.equalize_mmse_1xn(y, h, nv)
    # port invalid in all four cases (zero channel / zero nv / nan / neg nv)
    assert (np.asarray(xh) == 0).all()
    assert np.isinf(np.asarray(nvo)).all()


def test_zf_inverts_channel():
    rng = np.random.default_rng(2)
    n = 16
    h = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    xh, _ = equalizer.equalize_zf_1xn(jnp.asarray((h * x)[None]),
                                      jnp.asarray(h[None]),
                                      jnp.full((1, n), 0.1, np.float32))
    np.testing.assert_allclose(np.asarray(xh), x, rtol=1e-4, atol=1e-5)


def test_inv_small_matches_linalg():
    """_inv_small (closed-form 2x2 / blockwise-Schur 4x4, replacing TPU-slow
    batched linalg.inv) equals jnp.linalg.inv on random Hermitian-PD
    Gram+I matrices."""
    import numpy as np
    from srsran_edgeric_5g_tpu.ops.equalizer import _inv_small

    rng = np.random.default_rng(0)
    for l in (1, 2, 4):
        h = (rng.normal(size=(64, 6, l)) + 1j * rng.normal(size=(64, 6, l))
             ).astype(np.complex64)
        b = np.einsum("bpl,bpm->blm", h.conj(), h) + np.eye(l)
        got = np.asarray(_inv_small(jnp.asarray(b.astype(np.complex64))))
        want = np.linalg.inv(b)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
