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
