"""O-RAN fronthaul U-Plane serdes: eCPRI IQ-data frames, section type 1.

ctypes wrapper over native/ofh/ofh_uplane.cpp — the byte-exact counterpart
of the reference's ecpri_packet_builder_impl +
ofh_uplane_message_builder_static_compression_impl (cross-validated in
tests/test_reference_parity.py::test_ofh_uplane_frame_parity).

Bridges the TPU compression kernels to a fronthaul transport:
ops/ofh_compression.bfp_compress -> per-PRB exponents + int16 mantissas ->
pack_prbs -> frames here (one eCPRI message per OFDM symbol).  The
Ethernet/DPDK NIC layer itself is out of scope on this machine.
"""

from __future__ import annotations

import ctypes
import dataclasses
import pathlib
import subprocess

import numpy as np

from ..ops import ofh_compression as comp

_NATIVE = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB = _NATIVE / "build" / "libofhuplane.so"
_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if not _LIB.exists():
            subprocess.run(["make", "-C", str(_NATIVE)], check=True,
                           capture_output=True)
        l = ctypes.CDLL(str(_LIB))
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        l.ofh_uplane_frame_size.restype = ctypes.c_uint
        l.ofh_uplane_frame_size.argtypes = [ctypes.c_uint] * 3
        l.ofh_uplane_build_dl.restype = ctypes.c_uint
        l.ofh_uplane_build_dl.argtypes = (
            [u8p, ctypes.c_uint16, ctypes.c_uint16] + [ctypes.c_uint] * 7
            + [u8p, u8p])
        l.ofh_uplane_parse.restype = ctypes.c_int
        l.ofh_uplane_parse.argtypes = (
            [u8p, ctypes.c_uint,
             ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16)]
            + [ctypes.POINTER(ctypes.c_uint)] * 6
            + [ctypes.c_uint, ctypes.c_uint, u8p, u8p])
        _lib = l
    return _lib


@dataclasses.dataclass(frozen=True)
class UplaneHeader:
    pc_id: int
    seq_id: int
    sfn: int
    subframe: int
    slot: int
    symbol: int
    start_prb: int
    nof_prb: int


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def build_dl_frame(pc_id: int, seq_id: int, sfn: int, subframe: int,
                   slot: int, symbol: int, start_prb: int, width: int,
                   exponents: np.ndarray | None,
                   packed: np.ndarray) -> bytes:
    """One symbol's compressed PRBs -> one eCPRI U-Plane frame.

    ``packed`` is (nof_prb, ceil(24*width/8)) uint8 (ofh_compression
    pack_prbs output); ``exponents`` is (nof_prb,) uint8 or None for the
    'none' compression type.
    """
    nof_prb = packed.shape[0]
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    exp = (np.ascontiguousarray(exponents, dtype=np.uint8)
           if exponents is not None else None)
    size = lib().ofh_uplane_frame_size(nof_prb, width,
                                       1 if exp is not None else 0)
    out = np.empty(size, np.uint8)
    n = lib().ofh_uplane_build_dl(
        _u8(out), pc_id, seq_id, sfn, subframe, slot, symbol, start_prb,
        nof_prb, width, _u8(exp) if exp is not None else None, _u8(packed))
    assert n == size, (n, size)
    return out.tobytes()


def parse_frame(frame: bytes, width: int, with_exponent: bool = True
                ) -> tuple[UplaneHeader, np.ndarray | None, np.ndarray]:
    """Inverse of build_dl_frame: -> (header, exponents, packed)."""
    buf = np.frombuffer(frame, np.uint8)
    prb_payload = (24 * width + 7) // 8
    prb_bytes = prb_payload + (1 if with_exponent else 0)
    max_prb = (len(frame) - 16) // prb_bytes
    exps = np.zeros(max_prb, np.uint8)
    packed = np.zeros((max_prb, prb_payload), np.uint8)
    u16 = ctypes.c_uint16
    u = ctypes.c_uint
    pc, seq = u16(), u16()
    sfn, sub, slot, sym, sprb, nprb = u(), u(), u(), u(), u(), u()
    rc = lib().ofh_uplane_parse(
        _u8(buf), len(frame), ctypes.byref(pc), ctypes.byref(seq),
        ctypes.byref(sfn), ctypes.byref(sub), ctypes.byref(slot),
        ctypes.byref(sym), ctypes.byref(sprb), ctypes.byref(nprb),
        width, 1 if with_exponent else 0, _u8(exps), _u8(packed))
    assert rc == 0, f"parse failed: {rc}"
    n = nprb.value
    hdr = UplaneHeader(pc.value, seq.value, sfn.value, sub.value, slot.value,
                       sym.value, sprb.value, n)
    return hdr, (exps[:n] if with_exponent else None), packed[:n]


def frame_dl_slot(grid_iq: np.ndarray, pc_id: int, sfn: int, subframe: int,
                  slot: int, width: int = 9, iq_scaling: float = 1.0,
                  seq0: int = 0) -> list[bytes]:
    """Compress + frame a whole DL slot grid (nsymb, nsubc complex) into one
    eCPRI U-Plane message per OFDM symbol."""
    import jax.numpy as jnp

    nsymb, nsubc = grid_iq.shape
    assert nsubc % 12 == 0
    mant, exp = comp.bfp_compress(jnp.asarray(grid_iq), width, iq_scaling)
    mant, exp = np.asarray(mant), np.asarray(exp).astype(np.uint8)
    frames = []
    for l in range(nsymb):
        packed = comp.pack_prbs(mant[l], width)
        frames.append(build_dl_frame(pc_id, (seq0 + l) & 0xFFFF, sfn,
                                     subframe, slot, l, 0, width, exp[l],
                                     packed))
    return frames


def deframe_dl_slot(frames: list[bytes], width: int = 9) -> np.ndarray:
    """Inverse of frame_dl_slot -> (nsymb, nsubc) complex64 grid."""
    import jax.numpy as jnp

    rows = []
    for f in frames:
        hdr, exps, packed = parse_frame(f, width)
        mant = comp.unpack_prbs(packed, width)
        iq = comp.bfp_decompress(jnp.asarray(mant)[None],
                                 jnp.asarray(exps.astype(np.int32))[None])
        rows.append((hdr.symbol, np.asarray(iq)[0]))
    rows.sort(key=lambda r: r[0])
    return np.stack([r[1] for r in rows])
