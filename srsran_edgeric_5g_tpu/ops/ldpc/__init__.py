"""LDPC BG1/BG2 coding chain (TS 38.212 §5.2.2, §5.3.2, §5.4.2).

TPU-native counterpart of the reference's
srsRAN-5G-ER/lib/phy/upper/channel_coding/ldpc/ (encoder, decoder, rate
matcher/dematcher, segmenter, graph LUTs) — re-designed around static-shape
batched tensor ops: edge-gathers + GF(2) matmuls for encode, a layered
min-sum sweep with per-layer gather/scatter for decode, precomputed index
plans per (base graph, lifting size).

Submodules: graph, encoder, decoder, rate_match, segmenter.
"""

from . import decoder, encoder, graph, rate_match, segmenter  # noqa: F401
