import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import sequences as seq


@pytest.mark.parametrize("c_init", [0, 1, 0x12345678 & 0x7FFFFFFF, 2**31 - 1])
def test_gold_matches_lfsr_oracle(c_init):
    n = 1000
    got = np.asarray(seq.gold_sequence(jnp.asarray([c_init], dtype=jnp.uint32), n))[0]
    exp = seq.np_gold_sequence(c_init, n)
    np.testing.assert_array_equal(got, exp)


def test_gold_batched():
    inits = jnp.asarray([3, 77, 1023], dtype=jnp.uint32)
    got = np.asarray(seq.gold_sequence(inits, 256))
    for i, ci in enumerate([3, 77, 1023]):
        np.testing.assert_array_equal(got[i], seq.np_gold_sequence(ci, 256))


def test_scramble_roundtrip():
    rng = np.random.default_rng(3)
    bits = jnp.asarray(rng.integers(0, 2, size=(2, 512), dtype=np.int8))
    inits = jnp.asarray([11, 999], dtype=jnp.uint32)
    twice = seq.scramble_bits(seq.scramble_bits(bits, inits), inits)
    np.testing.assert_array_equal(np.asarray(twice), np.asarray(bits))


def test_scramble_llrs_sign():
    llrs = jnp.asarray(np.full((1, 64), 10.0, dtype=np.float32))
    init = jnp.asarray([42], dtype=jnp.uint32)
    out = np.asarray(seq.scramble_llrs(llrs, init))[0]
    s = seq.np_gold_sequence(42, 64)
    np.testing.assert_array_equal(out, np.where(s == 1, -10.0, 10.0))
