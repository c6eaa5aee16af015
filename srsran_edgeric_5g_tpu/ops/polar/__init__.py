"""Polar code chain for PDCCH / PBCH / UCI (TS 38.212 §5.3.1, §5.4.1).

Counterpart of the reference's lib/phy/upper/channel_coding/polar/ (code
construction, allocator, encoder, SC decoder, interleaver, rate matcher) —
TPU-shaped: the F^{(x)n} encode is n batched butterfly XOR stages, the rate
matcher is a fused precomputed gather, and the SC decoder is a statically
unrolled tree over batched LLR tensors.

Submodules: code (construction), encoder, decoder, rate_match.
"""

from . import code, decoder, encoder, rate_match  # noqa: F401
