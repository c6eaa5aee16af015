import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.utils.bits import pack_bits, parity_dot, unpack_bits


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(3, 17), dtype=np.uint8)
    bits = unpack_bits(jnp.asarray(data))
    assert bits.shape == (3, 17 * 8)
    back = pack_bits(bits)
    np.testing.assert_array_equal(np.asarray(back), data)


def test_unpack_msb_first():
    bits = unpack_bits(jnp.asarray([[0b10110001]], dtype=jnp.uint8))
    np.testing.assert_array_equal(np.asarray(bits)[0], [1, 0, 1, 1, 0, 0, 0, 1])


def test_parity_dot_matches_numpy():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(4, 300), dtype=np.int8)
    mat = rng.integers(0, 2, size=(300, 24), dtype=np.int8)
    out = parity_dot(jnp.asarray(bits), jnp.asarray(mat))
    exp = (bits.astype(np.int64) @ mat.astype(np.int64)) % 2
    np.testing.assert_array_equal(np.asarray(out), exp)
