#!/usr/bin/env python3
"""LDPC decoder schedule/batch sweep on the real TPU + dispatch-overhead probe."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from srsran_edgeric_5g_tpu.ops.ldpc import decoder, encoder
from srsran_edgeric_5g_tpu.ops.ldpc.graph import get_graph


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)

    # Dispatch overhead: trivial op.
    trivial = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    print(f"trivial dispatch: {timeit(trivial, x, iters=50)*1e6:.0f} us", flush=True)

    bg, zc = 1, 384
    g = get_graph(bg, zc)
    rng = np.random.default_rng(0)
    for b in (16, 64, 128):
        msgs = jnp.asarray(rng.integers(0, 2, (b, g.k), dtype=np.int8))
        cw = jax.jit(lambda m: encoder.encode(m, bg, zc))(msgs)
        llr = jax.jit(lambda c: ((1 - 2 * c.astype(jnp.float32)) * 8.0)
                      .at[:, :2 * zc].set(0.0))(cw)
        for sched, iters in (("layered", 6), ("flooding", 12)):
            dec = jax.jit(lambda l: decoder.decode(l, bg, zc, num_iters=iters,
                                                   schedule=sched))
            t0 = time.perf_counter()
            hard, ok = dec(llr)
            ok.block_until_ready()
            compile_s = time.perf_counter() - t0
            dt = timeit(dec, llr, iters=5)
            okv = bool(np.asarray(ok).all())
            print(f"B={b:4d} {sched:9s} it={iters:2d}: {dt*1e3:8.2f} ms "
                  f"({b*g.k/dt/1e6:7.1f} Mbit/s info) ok={okv} "
                  f"compile={compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
