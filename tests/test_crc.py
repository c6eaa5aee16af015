import jax.numpy as jnp
import numpy as np
import pytest

from srsran_edgeric_5g_tpu.ops import crc as crc_mod


@pytest.mark.parametrize("name", ["crc24a", "crc24b", "crc24c", "crc16", "crc11", "crc6"])
@pytest.mark.parametrize("n", [40, 127, 1000])
def test_crc_matches_bitwise_oracle(name, n):
    rng = np.random.default_rng(hash((name, n)) % 2**32)
    msgs = rng.integers(0, 2, size=(5, n), dtype=np.int8)
    got = np.asarray(crc_mod.crc(jnp.asarray(msgs), name))
    for i in range(msgs.shape[0]):
        exp = crc_mod.np_crc(msgs[i], name)
        np.testing.assert_array_equal(got[i], exp, err_msg=f"row {i}")


@pytest.mark.parametrize("name", ["crc24a", "crc24b", "crc16"])
def test_attach_then_check(name):
    rng = np.random.default_rng(7)
    msgs = jnp.asarray(rng.integers(0, 2, size=(8, 320), dtype=np.int8))
    cw = crc_mod.crc_attach(msgs, name)
    assert bool(crc_mod.crc_check(cw, name).all())
    # Flip one bit -> check must fail for that row.
    corrupted = cw.at[3, 100].set(1 - cw[3, 100])
    ok = np.asarray(crc_mod.crc_check(corrupted, name))
    assert not ok[3] and ok[[0, 1, 2, 4, 5, 6, 7]].all()


def test_crc16_known_value():
    """CRC-16/CCITT of ASCII '123456789' (0x31..0x39) is 0x31C3."""
    data = np.frombuffer(b"123456789", dtype=np.uint8)
    bits = np.unpackbits(data)
    got = crc_mod.np_crc(bits, "crc16")
    val = int("".join(map(str, got)), 2)
    assert val == 0x31C3
    got_dev = np.asarray(crc_mod.crc(jnp.asarray(bits[None].astype(np.int8)), "crc16"))[0]
    np.testing.assert_array_equal(got_dev, got)
