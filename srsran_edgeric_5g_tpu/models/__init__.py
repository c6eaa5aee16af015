"""Channel processors: full TX/RX chains composed from ops kernels.

Counterpart of the reference's lib/phy/upper/channel_processors (PDSCH
processor, PUSCH processor/demodulator/decoder) — but batch/slot-oriented:
one jitted program processes a whole slot for all UEs.
"""
