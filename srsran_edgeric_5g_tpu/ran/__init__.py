"""TS 38.211/212/214 parameter math (scope mirror of reference lib/ran/)."""

from .numerology import (  # noqa: F401
    CyclicPrefixTiming,
    SlotTiming,
    cp_lengths,
    sample_rate,
    slot_timing,
    symbols_per_slot,
)
