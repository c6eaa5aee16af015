"""TPU-native 5G gNB PHY signal chain.

A brand-new JAX/XLA/Pallas implementation of the 5G NR physical layer hot loop
(the capability set of ushasigh/srsran-edgeric-5g's srsRAN gNB PHY, re-designed
TPU-first): OFDM modulation/demodulation, CRC + LDPC BG1/BG2 encode and layered
min-sum decode with rate matching, QAM mapping and max-log soft demapping,
DMRS-based channel estimation and MMSE equalization — operating on HBM-resident
slot buffers, batched over codeblocks/UEs, and sharded over a TPU device mesh.

Layout:
  ran/        TS 38.211/212/214 numerology and parameter math
              (scope mirror of reference lib/ran/)
  ops/        compute kernels: CRC, sequences, LDPC, modulation, OFDM,
              equalizer, channel estimation (reference lib/phy/{upper,lower})
  models/     channel processors: PDSCH / PUSCH / SSB / PRACH chains
              (reference lib/phy/upper/channel_processors)
  parallel/   mesh axes + sharded full-cell slot pipelines
  utils/      bit packing, test helpers
  data/       spec-constant tables (TS 38.212 LDPC shift coefficients, ...)
"""

__version__ = "0.1.0"
