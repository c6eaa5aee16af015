"""Channel equalization: MMSE / ZF for 1 layer x N rx ports (SIMO).

Replicates the reference's per-RE formulas exactly
(srsRAN-5G-ER/lib/phy/upper/equalization/equalize_mmse_1xn.h:42-95,
equalize_zf_1xn.h), vectorised over all REs/symbols/ports at once:

    x_hat = sum_p conj(h_p) y_p * |h|^2 / (|h|^4 + sum_p |h_p|^2 nvar_p)
    nvar_out = sum_p |h_p|^2 nvar_p / (|h|^4 + ...)        (MMSE, unity gain)

with the reference's abnormal-input policy: ports with non-finite/zero channel
or non-positive noise variance are excluded; REs with no usable port produce
x_hat = 0 and nvar_out = +inf (so the demapper emits zero LLRs).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

INFINITY = jnp.float32(jnp.inf)


def _port_validity(h: jnp.ndarray, noise_var: jnp.ndarray) -> jnp.ndarray:
    h_norm = jnp.real(h) ** 2 + jnp.imag(h) ** 2
    return (jnp.isfinite(h_norm) & (h_norm > 0)
            & jnp.isfinite(noise_var) & (noise_var > 0))


def equalize_mmse_1xn(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
                      tx_scaling: float = 1.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MMSE-equalize one spatial layer from N receive ports.

    Args:
      y: received REs, shape (ports, ...).
      h: channel estimates, shape (ports, ...) (broadcastable to y).
      noise_var: per-port noise variance, shape (ports, ...) broadcastable.
      tx_scaling: transmit amplitude scaling applied to the channel.

    Returns (x_hat, nvar_out) with the leading `ports` axis reduced.
    """
    h = h * jnp.asarray(tx_scaling, h.dtype)
    h_norm = jnp.real(h) ** 2 + jnp.imag(h) ** 2
    nv = jnp.broadcast_to(noise_var, h_norm.shape)
    valid = _port_validity(h, nv)

    h_norm = jnp.where(valid, h_norm, 0.0)
    ch_mod_sq = jnp.sum(h_norm, axis=0)
    nvar_acc = jnp.sum(jnp.where(valid, h_norm * nv, 0.0), axis=0)
    mf = jnp.sum(jnp.where(valid, y * jnp.conj(h), 0.0), axis=0)

    ok = (ch_mod_sq > 0) & jnp.isfinite(ch_mod_sq) & (nvar_acc > 0) & jnp.isfinite(nvar_acc)
    denom = ch_mod_sq * ch_mod_sq + nvar_acc
    d_rcp = jnp.where(ok, 1.0 / jnp.where(ok, denom, 1.0), 0.0)

    x_hat = jnp.where(ok, mf * (ch_mod_sq * d_rcp), 0.0 + 0.0j)
    nvar_out = jnp.where(ok, nvar_acc * d_rcp, INFINITY)
    return x_hat.astype(jnp.complex64), nvar_out.astype(jnp.float32)


def equalize_mmse_2xn(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
                      tx_scaling: float = 1.0
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MMSE for 2 spatial layers x N rx ports (counterpart of
    equalize_zf_2xn.h / the reference's 2xN specialisations).

    Args:
      y: (ports, ...) received REs.
      h: (ports, 2, ...) channel matrix per RE.
      noise_var: broadcastable per-port noise variance (ports, ...).

    Per RE solves x = (H^H H + N)^-1 H^H y with the closed-form 2x2 inverse,
    unity-gain normalised per layer like the 1xN path; returns
    ((2, ...) x_hat, (2, ...) nvar_out).
    """
    h = h * jnp.asarray(tx_scaling, h.dtype)
    nv = jnp.broadcast_to(noise_var, y.shape)

    # Gram matrix A = H^H H (2x2 Hermitian) and matched filter z = H^H y,
    # with per-port noise whitening folded in (divide each port by nv_p).
    w = 1.0 / jnp.maximum(nv, 1e-30)
    hw = h * w[:, None]
    a00 = jnp.sum(jnp.conj(h[:, 0]) * hw[:, 0], axis=0).real
    a11 = jnp.sum(jnp.conj(h[:, 1]) * hw[:, 1], axis=0).real
    a01 = jnp.sum(jnp.conj(h[:, 0]) * hw[:, 1], axis=0)
    z0 = jnp.sum(jnp.conj(hw[:, 0]) * y, axis=0)
    z1 = jnp.sum(jnp.conj(hw[:, 1]) * y, axis=0)

    # MMSE: (A + I)^{-1} (noise already whitened to unit variance).
    b00 = a00 + 1.0
    b11 = a11 + 1.0
    det = b00 * b11 - (a01 * jnp.conj(a01)).real
    det = jnp.maximum(det, 1e-30)
    x0 = (b11 * z0 - a01 * z1) / det
    x1 = (b00 * z1 - jnp.conj(a01) * z0) / det

    # Unbias: E[x_hat_l | x] = g_l x_l with g_l = 1 - [ (A+I)^-1 ]_ll.
    inv00 = b11 / det
    inv11 = b00 / det
    g0 = jnp.maximum(1.0 - inv00, 1e-6)
    g1 = jnp.maximum(1.0 - inv11, 1e-6)
    x_hat = jnp.stack([x0 / g0, x1 / g1]).astype(jnp.complex64)
    # Post-equalization noise variance per layer: (1-g)/g.
    nv_out = jnp.stack([(1.0 - g0) / g0, (1.0 - g1) / g1]).astype(jnp.float32)
    return x_hat, nv_out


def _inv2(b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched (..., 2, 2) matrices."""
    det = b[..., 0, 0] * b[..., 1, 1] - b[..., 0, 1] * b[..., 1, 0]
    d = 1.0 / det
    row0 = jnp.stack([b[..., 1, 1] * d, -b[..., 0, 1] * d], axis=-1)
    row1 = jnp.stack([-b[..., 1, 0] * d, b[..., 0, 0] * d], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _inv_small(b: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of tiny Hermitian-PD (..., L, L) Gram matrices.

    jnp.linalg.inv lowers batched small LU factorisations to sequential
    triangular solves on TPU (measured ~100x the cost of the rest of the
    MIMO front at the bench shapes); L=2 uses the closed form and L=4 a
    blockwise 2x2 Schur-complement inverse (A+I is Hermitian PD, so the
    Schur complement D - C A^-1 B stays invertible) — both are pure
    elementwise tensor ops that fuse.  Other L falls back to linalg.inv.
    """
    l = b.shape[-1]
    if l == 1:
        return 1.0 / b
    if l == 2:
        return _inv2(b)
    if l == 4:
        mm = functools.partial(jnp.einsum, "...ij,...jk->...ik")
        a, b12 = b[..., :2, :2], b[..., :2, 2:]
        c, d = b[..., 2:, :2], b[..., 2:, 2:]
        ai = _inv2(a)
        si = _inv2(d - mm(c, mm(ai, b12)))
        aib = mm(ai, b12)
        sicai = mm(si, mm(c, ai))
        tl = ai + mm(aib, sicai)
        tr = -mm(aib, si)
        bl = -sicai
        top = jnp.concatenate([tl, tr], axis=-1)
        bot = jnp.concatenate([bl, si], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
    return jnp.linalg.inv(b)


def equalize_mmse_lxn(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
                      tx_scaling: float = 1.0
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MMSE for L spatial layers x N rx ports — the general-dimension
    counterpart of the reference's equalizer (channel_equalizer_generic_impl
    routes >2-layer cases through the same whitened-Gram formulation the
    2xN specialisation closed-forms).

    Args:
      y: (ports, ...) received REs.
      h: (ports, L, ...) channel matrix per RE.
      noise_var: broadcastable per-port noise variance (ports, ...).

    Per RE solves x = (H^H W H + I)^-1 H^H W y with per-port noise whitening
    W = diag(1/nvar_p), then unbiases each layer to unity gain exactly like
    the 1xN/2xN paths.  Returns ((L, ...) x_hat, (L, ...) nvar_out).
    """
    h = h * jnp.asarray(tx_scaling, h.dtype)
    nof_layers = h.shape[1]
    nv = jnp.broadcast_to(noise_var, y.shape)
    w = (1.0 / jnp.maximum(nv, 1e-30)).astype(jnp.float32)
    hw = h * w[:, None]

    # Gram A = H^H W H (..., L, L) and matched filter z = H^H W y (..., L).
    a = jnp.einsum("pl...,pm...->...lm", jnp.conj(h), hw)
    z = jnp.einsum("pl...,p...->...l", jnp.conj(hw), y)
    b = a + jnp.eye(nof_layers, dtype=a.dtype)
    binv = _inv_small(b)
    xw = jnp.einsum("...lm,...m->...l", binv, z)

    # Unbias: E[x_hat_l | x] = g_l x_l with g_l = 1 - [(A+I)^-1]_ll;
    # post-equalization noise variance per layer is (1-g)/g.
    g = jnp.maximum(
        1.0 - jnp.real(jnp.diagonal(binv, axis1=-2, axis2=-1)), 1e-6)
    x_hat = jnp.moveaxis(xw / g, -1, 0).astype(jnp.complex64)
    nv_out = jnp.moveaxis((1.0 - g) / g, -1, 0).astype(jnp.float32)
    return x_hat, nv_out


def mmse_weights_lxn(h: jnp.ndarray, noise_var: jnp.ndarray
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute the LxN MMSE combining weights for a time-invariant
    channel estimate.

    The slot receiver estimates ONE channel per subcarrier and applies it to
    every data symbol (the reference interpolates per-symbol but the
    estimate is constant between DM-RS hops) — so the per-RE Gram matrix,
    its inverse and the unbiasing gains are identical across the symbol
    axis.  `equalize_mmse_lxn` recomputes them per RE; at the 4x4 slot
    shapes that Gram/inverse work was ~90% of the whole MIMO step's device
    time (ndata-fold redundant).  This computes, per (batch, subcarrier):

        W = G^-1 (A + I)^-1 H^H diag(1/nvar_p)      (L, P)
        nv_out_l = (1 - g_l) / g_l,  g_l = 1 - [(A+I)^-1]_ll

    so that x_hat = W y per data-symbol RE is exactly the
    `equalize_mmse_lxn` output (same whitened-Gram formulation as the
    reference's channel_equalizer_generic_impl).

    Args:
      h: (P, L, ..., w) channel estimate (no symbol axis).
      noise_var: per-port noise variance broadcastable to (P, ..., w).

    Returns:
      weights: (..., w, L, P) combining matrix (unbias folded in).
      nv_out: (..., w, L) post-equalization noise variance per layer.
    """
    nof_layers = h.shape[1]
    nv = jnp.broadcast_to(noise_var, h.shape[:1] + h.shape[2:])
    w = (1.0 / jnp.maximum(nv, 1e-30)).astype(jnp.float32)
    hw = h * w[:, None]

    if nof_layers in (1, 2, 4):
        # Scalar-component formulation: every quantity is a (...,) array and
        # every op elementwise, so XLA fuses the whole Gram+inverse+weights
        # chain into a handful of large kernels.  The einsum/slice route
        # materializes (..., L, L) tensors whose trailing 2x2/4x4 dims tile
        # terribly on TPU (T(2,128)/T(4,128) layouts + copies were ~30% of
        # the 4x4 step's device time).
        binv, g = _binv_scalars(h, hw, nof_layers)
        wts = jnp.stack(
            [jnp.stack(
                [sum(binv[(l, m)] * jnp.conj(hw[:, m])[p] for m in
                     range(nof_layers)) / g[l]
                 for p in range(h.shape[0])], axis=-1)
             for l in range(nof_layers)], axis=-2).astype(jnp.complex64)
        # nv_out = (1-g)/g with 1-g taken DIRECTLY as [(A+I)^-1]_ll: the
        # (1.0 - g) form cancels to exactly 0 in f32 at high SNR (binv_ll ~
        # 1e-9 rounds away against 1.0), and a zero noise variance trips
        # the demapper's abnormal-input rule into all-zero LLRs.
        nv_out = jnp.stack(
            [jnp.maximum(binv[(l, l)].real, 1e-30) / g[l]
             for l in range(nof_layers)], axis=-1).astype(jnp.float32)
        return wts, nv_out

    a = jnp.einsum("pl...,pm...->...lm", jnp.conj(h), hw)
    b = a + jnp.eye(nof_layers, dtype=a.dtype)
    binv = _inv_small(b)
    diag = jnp.real(jnp.diagonal(binv, axis1=-2, axis2=-1))
    g = jnp.maximum(1.0 - diag, 1e-6)
    wts = jnp.einsum("...lm,pm...->...lp", binv, jnp.conj(hw))
    wts = (wts / g[..., None]).astype(jnp.complex64)
    # Direct (no 1-g cancellation) post-equalization noise variance — see
    # the scalar path's note.
    nv_out = (jnp.maximum(diag, 1e-30) / g).astype(jnp.float32)
    return wts, nv_out


def mmse_equalize_timeinv(y: jnp.ndarray, h: jnp.ndarray,
                          noise_var: jnp.ndarray
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weights-once MMSE equalization of a time-invariant channel, fused.

    Args:
      y: (P, B, n, w) received data REs (n = data symbols).
      h: (P, L, B, w) channel estimate (constant over n).
      noise_var: per-port noise variance broadcastable to (P, B, w).

    Returns (x_hat (B, L, n, w) LAYER-MAJOR, nv_out (B, L, w)).

    Same math as `mmse_weights_lxn` + application, but entirely in scalar
    components INCLUDING the application: each layer's output is a fused
    sum of P elementwise multiply-adds over (B, n, w).  The output keeps
    the layer axis MAJOR: with the spec's RE-major/layer-minor codeword
    order as the array's minor axis, every downstream elementwise tensor
    tiles (8, 128) against a 2/4-wide minor dim — the demap ops ran at a
    fraction of VPU lane utilization (~18% of the 2x2 step).  The caller
    demaps per layer in this wide layout and performs the spec interleave
    ONCE on the LLR tensor.
    """
    nof_layers = h.shape[1]
    nv = jnp.broadcast_to(noise_var, h.shape[:1] + h.shape[2:])
    w_n = (1.0 / jnp.maximum(nv, 1e-30)).astype(jnp.float32)
    hw = h * w_n[:, None]
    binv, g = _binv_scalars(h, hw, nof_layers)
    xs, nvs = [], []
    for l in range(nof_layers):
        acc = None
        for p in range(h.shape[0]):
            w_lp = sum(binv[(l, m)] * jnp.conj(hw[p, m])
                       for m in range(nof_layers)) / g[l]     # (B, w)
            term = w_lp[:, None, :] * y[p]                    # (B, n, w)
            acc = term if acc is None else acc + term
        xs.append(acc)
        nvs.append(jnp.maximum(binv[(l, l)].real, 1e-30) / g[l])
    x_hat = jnp.stack(xs, axis=1).astype(jnp.complex64)       # (B, L, n, w)
    nv_out = jnp.stack(nvs, axis=1).astype(jnp.float32)       # (B, L, w)
    return x_hat, nv_out


def mmse_equalize_timeinv_grid(y: jnp.ndarray, h: jnp.ndarray,
                               noise_var: jnp.ndarray
                               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`mmse_equalize_timeinv` consuming the receive grid's NATIVE layout.

    Args:
      y: (S, P, n, U, w) received data REs exactly as sliced from the
         per-antenna OFDM grid — no (P, S*U, n, w) regrouping.  The two
         strided transpose copies that regrouping cost were 14% of the 2x2
         full-slot step on v5e (xplane profile); the channel tensors are
         n-fold smaller than the data, so the P/L-major permutes this
         variant does instead are noise.
      h: (S, P, L, U, w) channel estimate (constant over n).
      noise_var: broadcastable to (S, P, U, w).

    Returns (x_hat (S, n, U, w, L) complex64, nv_out (S, U, w, L) f32).
    With the layer axis MINOR, flattening (n, w, L) per (S, U) row and
    qm-expanding the last axis IS the TS 38.211 layer interleave
    d(L*i+l) — the caller needs one transpose of the (small) complex
    tensor instead of the old y-regroup + LLR-tensor interleave.
    """
    nof_layers = h.shape[2]
    nv = jnp.broadcast_to(noise_var, h.shape[:2] + h.shape[3:])  # (S,P,U,w)
    w_n = (1.0 / jnp.maximum(nv, 1e-30)).astype(jnp.float32)
    hw = h * w_n[:, :, None]
    ht = h.transpose(1, 2, 0, 3, 4)       # (P, L, S, U, w) — small tensors
    hwt = hw.transpose(1, 2, 0, 3, 4)
    binv, g = _binv_scalars(ht, hwt, nof_layers)       # entries (S, U, w)
    xs, nvs = [], []
    for l in range(nof_layers):
        acc = None
        for p in range(h.shape[1]):
            w_lp = sum(binv[(l, m)] * jnp.conj(hwt[p, m])
                       for m in range(nof_layers)) / g[l]     # (S, U, w)
            term = w_lp[:, None] * y[:, p]                    # (S, n, U, w)
            acc = term if acc is None else acc + term
        xs.append(acc)
        nvs.append(jnp.maximum(binv[(l, l)].real, 1e-30) / g[l])
    x_hat = jnp.stack(xs, axis=-1).astype(jnp.complex64)  # (S, n, U, w, L)
    nv_out = jnp.stack(nvs, axis=-1).astype(jnp.float32)  # (S, U, w, L)
    return x_hat, nv_out


def _binv_scalars(h: jnp.ndarray, hw: jnp.ndarray, nof_layers: int):
    """(A + I)^-1 of the whitened Gram as a dict of (...,) scalar arrays.

    Returns (binv, g): binv[(l, m)] = [(A+I)^-1]_lm for all l, m and
    g[l] = max(1 - Re binv[(l,l)], 1e-6).  A = H^H W H is Hermitian PD + I,
    inverted in closed form — directly for L=1/2, blockwise 2x2
    Schur-complement for L=4 (the Schur complement of a Hermitian PD matrix
    stays Hermitian PD, so each 2x2 inverse is safe).
    """
    def gram(l, m):                     # a_lm = sum_p conj(h_pl) hw_pm
        return jnp.sum(jnp.conj(h[:, l]) * hw[:, m], axis=0)

    def inv2h(b00, b01, b11):
        """Hermitian 2x2 [[b00, b01], [conj(b01), b11]] inverse scalars
        (b00/b11 real) -> (i00, i01, i11)."""
        det = b00 * b11 - (b01.real ** 2 + b01.imag ** 2)
        d = 1.0 / det
        return b11 * d, -b01 * d, b00 * d

    if nof_layers == 1:
        b00 = gram(0, 0).real + 1.0
        i00 = 1.0 / b00
        binv = {(0, 0): i00}
    elif nof_layers == 2:
        i00, i01, i11 = inv2h(gram(0, 0).real + 1.0, gram(0, 1),
                              gram(1, 1).real + 1.0)
        binv = {(0, 0): i00, (0, 1): i01, (1, 0): jnp.conj(i01), (1, 1): i11}
    else:
        # B = [[A, C], [C^H, D]] in 2x2 blocks; E = A^-1 C, S = D - C^H E.
        a00 = gram(0, 0).real + 1.0
        a01 = gram(0, 1)
        a11 = gram(1, 1).real + 1.0
        c00, c01 = gram(0, 2), gram(0, 3)
        c10, c11 = gram(1, 2), gram(1, 3)
        d00 = gram(2, 2).real + 1.0
        d01 = gram(2, 3)
        d11 = gram(3, 3).real + 1.0
        ai00, ai01, ai11 = inv2h(a00, a01, a11)
        ai10 = jnp.conj(ai01)
        e00 = ai00 * c00 + ai01 * c10
        e01 = ai00 * c01 + ai01 * c11
        e10 = ai10 * c00 + ai11 * c10
        e11 = ai10 * c01 + ai11 * c11
        # S = D - C^H E (Hermitian: s00/s11 real).
        s00 = d00 - (jnp.conj(c00) * e00 + jnp.conj(c10) * e10).real
        s01 = d01 - (jnp.conj(c00) * e01 + jnp.conj(c10) * e11)
        s11 = d11 - (jnp.conj(c01) * e01 + jnp.conj(c11) * e11).real
        si00, si01, si11 = inv2h(s00, s01, s11)
        si10 = jnp.conj(si01)
        # Top-right block: -E Si; bottom-left is its conjugate transpose.
        tr00 = -(e00 * si00 + e01 * si10)
        tr01 = -(e00 * si01 + e01 * si11)
        tr10 = -(e10 * si00 + e11 * si10)
        tr11 = -(e10 * si01 + e11 * si11)
        # Top-left: A^-1 + E Si E^H = A^-1 + (-TR) E^H.
        tl00 = ai00 - (tr00 * jnp.conj(e00) + tr01 * jnp.conj(e01))
        tl01 = ai01 - (tr00 * jnp.conj(e10) + tr01 * jnp.conj(e11))
        tl11 = ai11 - (tr10 * jnp.conj(e10) + tr11 * jnp.conj(e11))
        binv = {(0, 0): tl00, (0, 1): tl01, (1, 1): tl11,
                (0, 2): tr00, (0, 3): tr01, (1, 2): tr10, (1, 3): tr11,
                (2, 2): si00, (2, 3): si01, (3, 3): si11}
        for (l, m) in list(binv):
            if m > l:
                binv[(m, l)] = jnp.conj(binv[(l, m)])
        binv[(1, 0)] = jnp.conj(binv[(0, 1)])
    g = [jnp.maximum(1.0 - binv[(l, l)].real, 1e-6)
         for l in range(nof_layers)]
    return binv, g


def equalize_zf_1xn(y: jnp.ndarray, h: jnp.ndarray, noise_var: jnp.ndarray,
                    tx_scaling: float = 1.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-forcing variant: x_hat = sum conj(h) y / sum |h|^2."""
    h = h * jnp.asarray(tx_scaling, h.dtype)
    h_norm = jnp.real(h) ** 2 + jnp.imag(h) ** 2
    nv = jnp.broadcast_to(noise_var, h_norm.shape)
    valid = _port_validity(h, nv)

    h_norm = jnp.where(valid, h_norm, 0.0)
    ch_mod_sq = jnp.sum(h_norm, axis=0)
    nvar_acc = jnp.sum(jnp.where(valid, h_norm * nv, 0.0), axis=0)
    mf = jnp.sum(jnp.where(valid, y * jnp.conj(h), 0.0), axis=0)

    ok = (ch_mod_sq > 0) & jnp.isfinite(ch_mod_sq)
    d_rcp = jnp.where(ok, 1.0 / jnp.where(ok, ch_mod_sq, 1.0), 0.0)
    x_hat = jnp.where(ok, mf * d_rcp, 0.0 + 0.0j)
    nvar_out = jnp.where(ok, nvar_acc * d_rcp * d_rcp, INFINITY)
    return x_hat.astype(jnp.complex64), nvar_out.astype(jnp.float32)
