import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import modulation as mod

MODS = ["bpsk", "qpsk", "qam16", "qam64", "qam256"]


def full_constellation(name):
    qm = mod.QM[name]
    patterns = np.array(list(itertools.product([0, 1], repeat=qm)), dtype=np.int8)
    syms = np.asarray(mod.modulate(jnp.asarray(patterns.reshape(-1, qm)), name))
    return patterns, syms.reshape(-1)


@pytest.mark.parametrize("name", MODS)
def test_unit_average_energy(name):
    _, syms = full_constellation(name)
    assert np.isclose(np.mean(np.abs(syms) ** 2), 1.0, atol=1e-6)


def test_qpsk_known_points():
    """TS 38.211 §5.1.3: d = ((1-2b0) + j(1-2b1))/sqrt(2)."""
    bits = jnp.asarray([[0, 0, 0, 1, 1, 0, 1, 1]], dtype=jnp.int8)
    syms = np.asarray(mod.modulate(bits, "qpsk"))[0]
    s = 1 / np.sqrt(2)
    np.testing.assert_allclose(
        syms, np.array([s + 1j * s, s - 1j * s, -s + 1j * s, -s - 1j * s]), atol=1e-7)


def test_qam16_known_points():
    """TS 38.211 §5.1.4: b=(0,0,0,0) -> (1+1j)/sqrt(10); (0,0,1,1) -> (3+3j)/sqrt(10)."""
    bits = jnp.asarray([[0, 0, 0, 0, 0, 0, 1, 1, 1, 0, 0, 1]], dtype=jnp.int8)
    syms = np.asarray(mod.modulate(bits, "qam16"))[0]
    r = 1 / np.sqrt(10)
    np.testing.assert_allclose(
        syms, np.array([(1 + 1j) * r, (3 + 3j) * r, (-1 + 3j) * r]), atol=1e-7)


def brute_force_maxlog(y, patterns, syms, noise_var):
    """Independent max-log oracle over the full complex constellation."""
    d2 = np.abs(y - syms) ** 2
    qm = patterns.shape[1]
    llrs = np.zeros(qm)
    for k in range(qm):
        m0 = patterns[:, k] == 0
        llrs[k] = (d2[~m0].min() - d2[m0].min()) / noise_var
    return llrs


@pytest.mark.parametrize("name", MODS)
def test_demapper_matches_bruteforce(name):
    patterns, syms = full_constellation(name)
    rng = np.random.default_rng(mod.QM[name])
    y = (rng.normal(size=32) + 1j * rng.normal(size=32)).astype(np.complex64)
    nv = 0.3
    got = np.asarray(mod.demodulate_soft(jnp.asarray(y), jnp.float32(nv), name,
                                         quantize=False)).reshape(32, -1)
    for i in range(32):
        exp = brute_force_maxlog(y[i], patterns, syms, nv)
        np.testing.assert_allclose(got[i], exp, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", MODS)
def test_mod_demod_hard_roundtrip(name):
    qm = mod.QM[name]
    rng = np.random.default_rng(99)
    bits = jnp.asarray(rng.integers(0, 2, size=(300 * qm,), dtype=np.int8))
    syms = mod.modulate(bits, name)
    llrs = mod.demodulate_soft(syms, jnp.float32(0.01), name)
    hard = mod.hard_decision(llrs)
    np.testing.assert_array_equal(np.asarray(hard), np.asarray(bits))


def test_quantization_points():
    llrs = jnp.asarray([0.0, 20.0, -20.0, 25.0, 10.0], dtype=jnp.float32)
    q = np.asarray(mod.quantize_llrs(llrs))
    np.testing.assert_array_equal(q, [0, 120, -120, 120, 60])


@pytest.mark.parametrize("name", [m for m in MODS if mod.QM[m] >= 2])
def test_axis_maxlog_closed_form_equals_subset(name):
    """The folded closed-form axis demapper matches the subset-min oracle,
    including far outside the constellation (slope-doubling regions)."""
    qm = mod.QM[name]
    rng = np.random.default_rng(qm)
    y = jnp.asarray(np.concatenate([
        rng.normal(scale=0.5, size=4096),
        rng.uniform(-3.0, 3.0, size=1024),   # beyond the outermost level
    ]).astype(np.float32))
    rcp = jnp.asarray(rng.uniform(0.5, 30.0, size=y.shape).astype(np.float32))
    got = np.asarray(mod._axis_maxlog(y, rcp, qm))
    want = np.asarray(mod._axis_maxlog_subset(y, rcp, qm))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
