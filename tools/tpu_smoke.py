#!/usr/bin/env python3
"""Drive the public package surface on the real TPU chip.

A DL-style bit chain (payload -> CRC24A -> scramble -> 64QAM) and the UL
inverse (soft demap -> descramble -> hard decision -> CRC check), plus the
LDPC encode->decode loop, under jax.jit on the axon TPU.  Used for manual
end-to-end verification; keep runs exclusive (single-client relay).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops import crc, modulation, sequences
from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    B, N = 8, 1200
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, (B, N), dtype=np.int8))
    cinit = jnp.asarray(rng.integers(0, 2**31, (B,), dtype=np.uint32))

    @jax.jit
    def tx(bits, ci):
        cw = crc.crc_attach(bits, "crc24a")
        scr = sequences.scramble_bits(cw, ci)
        return modulation.modulate(scr, "qam64")

    @jax.jit
    def rx(syms, ci, noise_var):
        llr = modulation.demodulate_soft(syms, noise_var, "qam64")
        llr = sequences.scramble_llrs(llr.astype(jnp.float32), ci)
        hard = modulation.hard_decision(llr)
        return hard, crc.crc_check(hard, "crc24a")

    t0 = time.time()
    syms = tx(payload, cinit)
    syms.block_until_ready()
    print(f"tx compile+run {time.time()-t0:.1f}s; {syms.shape}, "
          f"energy {float(jnp.mean(jnp.abs(syms)**2)):.4f}", flush=True)

    # Note: complex64 device->host transfer and eager complex ops are
    # UNIMPLEMENTED on the axon backend; build noise host-side as real pairs
    # and combine under jit.
    nr = jnp.asarray(rng.normal(size=syms.shape).astype(np.float32))
    ni = jnp.asarray(rng.normal(size=syms.shape).astype(np.float32))
    y = jax.jit(lambda s, a, b: s + jax.lax.complex(a, b)
                * np.float32(np.sqrt(0.005)))(syms, nr, ni)
    t0 = time.time()
    hard, ok = rx(y, cinit, jnp.float32(0.01))
    ok.block_until_ready()
    print(f"rx compile+run {time.time()-t0:.1f}s; CRC ok: {np.asarray(ok)}", flush=True)
    errs = int((np.asarray(hard)[:, :N] != np.asarray(payload)).sum())
    print("payload bit errors:", errs, flush=True)

    y2 = jax.jit(lambda v: v.at[3, 50].set(10 + 10j))(y)
    _, ok2 = rx(y2, cinit, jnp.float32(0.01))
    print("after corrupting cw 3:", np.asarray(ok2), flush=True)

    # LDPC on TPU: encode + 6-iter decode roundtrip, BG1 Zc=384 (max size).
    bg, zc = 1, 384
    from srsran_edgeric_5g_tpu.ops.ldpc.graph import get_graph
    g = get_graph(bg, zc)
    msgs = jnp.asarray(rng.integers(0, 2, (16, g.k), dtype=np.int8))
    enc = jax.jit(lambda m: encoder.encode(m, bg, zc))
    t0 = time.time()
    cw = enc(msgs)
    cw.block_until_ready()
    print(f"ldpc encode compile+run {time.time()-t0:.1f}s; cw {cw.shape}", flush=True)
    llr = (1 - 2 * cw.astype(jnp.float32)) * 8.0
    llr = llr.at[:, :2 * zc].set(0.0)
    dec = jax.jit(lambda l: decoder.decode(l, bg, zc))
    t0 = time.time()
    hard, okp = dec(llr)
    okp.block_until_ready()
    print(f"ldpc decode compile+run {time.time()-t0:.1f}s; parity ok: "
          f"{np.asarray(okp).all()}, msg match: "
          f"{bool((np.asarray(hard) == np.asarray(msgs)).all())}", flush=True)

    # Steady-state timings.
    for name, fn, args in [("tx", tx, (payload, cinit)),
                           ("rx", rx, (y, cinit, jnp.float32(0.01))),
                           ("ldpc_enc", enc, (msgs,)),
                           ("ldpc_dec", dec, (llr,))]:
        t0 = time.time()
        for _ in range(10):
            out = fn(*args)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        print(f"{name}: {(time.time()-t0)/10*1e3:.2f} ms/iter", flush=True)
    kbits = 16 * g.k
    t0 = time.time()
    for _ in range(10):
        out = dec(llr)
    out[0].block_until_ready()
    dt = (time.time() - t0) / 10
    print(f"ldpc decode throughput: {kbits/dt/1e6:.1f} Mbit/s (B=16, Zc=384, 6 it)",
          flush=True)


if __name__ == "__main__":
    main()
