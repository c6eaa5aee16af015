// Oracle harness around the REFERENCE's C++ PHY kernels (compiled directly
// from /root/reference/srsRAN-5G-ER — nothing vendored into this repo).
//
// Purpose (SURVEY.md §4.5 / §6): the reference's MATLAB-generated .dat
// conformance vectors are not shipped in its tree, so this binary GENERATES
// golden vectors by running the reference implementations themselves
// (ldpc_encoder_{generic,avx2}, ldpc_decoder_{generic,avx2}, CRC LUT,
// ldpc_rate_matcher/dematcher) on deterministic pseudo-random inputs, and
// doubles as the reference-side throughput benchmark (the counterpart of
// tests/benchmarks/phy/ldpc_encoder_benchmark.cpp etc., whose harness prints
// Mbit/s — include/srsran/support/benchmark_utils.h).
//
// Output protocol: raw little-endian binary on stdout (parsed by
// tests/test_reference_parity.py); human-readable bench lines on stderr.
//
// Subcommands:
//   encode    <bg> <zc> <nmsg> <seed> <impl>          -> msg bits, cw bits
//   crc       <poly> <nbytes> <nmsg> <seed>           -> data bytes, checksums
//   ratematch <bg> <zc> <E> <rv> <qm> <nfill> <nmsg> <seed> -> cw bits, E bits
//   dematch   <bg> <zc> <E> <rv> <qm> <nfill> <nmsg> <seed> -> llrs, N llrs
//   decode    <bg> <zc> <nmsg> <seed> <sigma_x1000> <iters> <impl> <early>
//                                                     -> msg, llrs, hard, its
//   bench_encode <bg> <zc> <iters> <impl>
//   bench_decode <bg> <zc> <iters> <sigma_x1000> <impl> <early>
//
// v2 adds the rest of the bit/symbol-level PHY kernels (all compiled from the
// reference tree as well):
//   prg        <c_init> <len> <nseq>                  -> sequence bits
//   lowpapr    <u> <v> <alpha_num> <alpha_den> <m>    -> cf32 sequence
//   modmap     <qm> <nsym> <nmsg> <seed>              -> bits, cf32 symbols
//   demap      <qm> <nsym> <nmsg> <seed> <sigma_x1000>-> sym, nvars, i8 llrs
//   eq         <algo:mmse|zf> <nports> <nre> <nmsg> <seed> <txs_x1000>
//              -> y(cbf16->f32), h(cbf16->f32), port nvars, eq sym, eq nvars
//   shortblock <k> <e> <qm> <nmsg> <seed> <sigma_x1000>
//              -> msgs, cw bits, i8 llrs, detected, valid
//   polar      <K> <E> <nmax> <ibil> <nmsg> <seed> <sigma_x1000>
//              -> header(N,n,nPC,set masks,PC set), per msg: msg, interleaved,
//                 allocated, encoded, ratematched, i8 llrs, decoded msg

#include <cinttypes>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <random>
#include <string>
#include <vector>

#include "ldpc_encoder_generic.h"
#include "ldpc_encoder_avx2.h"
#include "ldpc_decoder_generic.h"
#include "ldpc_decoder_avx2.h"
#include "ldpc_rate_matcher_impl.h"
#include "ldpc_rate_dematcher_impl.h"
#include "../crc_calculator_lut_impl.h"
#include "../crc_calculator_generic_impl.h"

#include "pseudo_random_generator_impl.h"
#include "low_papr_sequence_generator_impl.h"
#include "modulation_mapper_lut_impl.h"
#include "demodulation_mapper_impl.h"
#include "channel_equalizer_generic_impl.h"
#include "short_block_encoder_impl.h"
#include "short_block_detector_impl.h"
#include "polar_code_impl.h"
#include "polar_encoder_impl.h"
#include "polar_decoder_impl.h"
#include "polar_allocator_impl.h"
#include "polar_deallocator_impl.h"
#include "polar_interleaver_impl.h"
#include "polar_rate_matcher_impl.h"
#include "polar_rate_dematcher_impl.h"
#include "iq_compression_bfp_impl.h"
#include "quantizer.h"
#include "srsran/srslog/srslog.h"
#include "ofdm_modulator_impl.h"
#include "ofdm_demodulator_impl.h"
#include "dft_processor_generic_impl.h"
#include "port_channel_estimator_average_impl.h"
#include "interpolator_linear_impl.h"
#include "time_alignment_estimator_dft_impl.h"
#include "prach_generator_impl.h"
#include "prach_detector_generic_impl.h"
#include "pucch_detector_format0.h"
#include "low_papr_sequence_collection_impl.h"
#include "srsran/phy/support/prach_buffer.h"
#include "ulsch_demultiplex_impl.h"
#include "pbch_encoder_impl.h"
#include "pdsch_processor_impl.h"
#include "pusch_processor_impl.h"
#include "pusch_decoder_impl.h"
#include "pusch_demodulator_impl.h"
#include "pusch_codeblock_decoder.h"
#include "dmrs_pusch_estimator_impl.h"
#include "uci_decoder_impl.h"
#include "srsran/phy/upper/unique_rx_buffer.h"
#include "srsran/ran/pusch/ulsch_info.h"
#include "pdsch_encoder_impl.h"
#include "pdsch_modulator_impl.h"
#include "dmrs_pdsch_processor_impl.h"
#include "ldpc_segmenter_impl.h"
#include "resource_grid_mapper_impl.h"
#include "channel_precoder_generic.h"
#include "srsran/ran/precoding/precoding_codebooks.h"
#include "srsran/phy/support/precoding_configuration.h"
#include "pbch_modulator_impl.h"
#include "pdcch_encoder_impl.h"
#include "pss_processor_impl.h"
#include "sss_processor_impl.h"
#include "dmrs_pbch_processor_impl.h"
#include "srsran/phy/upper/channel_processors/pusch/pusch_decoder_buffer.h"
#include "srsran/phy/upper/channel_processors/pusch/pusch_codeword_buffer.h"
#include "ofh_uplane_message_builder_static_compression_impl.h"
#include "ecpri_packet_builder_impl.h"
#include "vlan_ethernet_frame_builder_impl.h"
#include "vlan_ethernet_frame_decoder_impl.h"
#include "srsran/ofh/ecpri/ecpri_packet_properties.h"
#include "srsran/phy/support/resource_grid_reader.h"
#include "srsran/phy/support/resource_grid_writer.h"

#include "pdcch_processor_impl.h"
#include "pdcch_modulator_impl.h"
#include "dmrs_pdcch_processor_impl.h"
#include "nzp_csi_rs_generator_impl.h"
#include "pucch_detector_format1.h"
#include "pucch_demodulator_impl.h"
#include "pucch/dmrs_pucch_processor_format1_impl.h"
#include "pucch/dmrs_pucch_processor_format2_impl.h"
#include "srs/srs_estimator_generic_impl.h"
#include "srsran/ran/srs/srs_information.h"
#include "srsran/phy/upper/signal_processors/srs/srs_estimator_configuration.h"
#include "srsran/phy/upper/signal_processors/srs/srs_estimator_result.h"

#include "srsran/adt/bit_buffer.h"
#include "srsran/phy/support/re_buffer.h"
#include "srsran/phy/upper/equalization/modular_ch_est_list.h"
#include "srsran/srsvec/bit.h"

using namespace srsran;

namespace {

// splitmix64: deterministic, trivially re-implementable host-side if needed.
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed) {}
  uint64_t next()
  {
    s += 0x9e3779b97f4a7c15ULL;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  uint8_t bit() { return static_cast<uint8_t>(next() & 1); }
  uint8_t byte() { return static_cast<uint8_t>(next() & 0xff); }
};

void write_bytes(const void* p, size_t n)
{
  std::fwrite(p, 1, n, stdout);
}

ldpc::lifting_size_t to_ls(unsigned zc)
{
  for (auto ls : ldpc::all_lifting_sizes) {
    if (static_cast<unsigned>(ls) == zc) {
      return ls;
    }
  }
  std::fprintf(stderr, "bad lifting size %u\n", zc);
  std::exit(2);
}

std::unique_ptr<ldpc_encoder> make_encoder(const std::string& impl)
{
  if (impl == "avx2") {
    return std::make_unique<ldpc_encoder_avx2>();
  }
  return std::make_unique<ldpc_encoder_generic>();
}

std::unique_ptr<ldpc_decoder> make_decoder(const std::string& impl)
{
  if (impl == "avx2") {
    return std::make_unique<ldpc_decoder_avx2>();
  }
  return std::make_unique<ldpc_decoder_generic>();
}

struct Dims {
  unsigned k;       // message bits (22|10)*zc
  unsigned n_out;   // encoder output bits (66|50 - 2)*zc
};

Dims dims(unsigned bg, unsigned zc)
{
  // Full base graphs: BG1 68 cols, BG2 52; the encoder/rate-matcher domain
  // drops the 2*Zc punctured systematic columns -> N = 66*Zc | 50*Zc.
  unsigned kb = (bg == 1) ? 22 : 10;
  unsigned cols = (bg == 1) ? 68 : 52;
  return {kb * zc, (cols - 2) * zc};
}

codeblock_metadata make_cfg(unsigned bg, unsigned zc, unsigned rv = 0,
                            unsigned qm = 1, unsigned e = 0,
                            unsigned nfill = 0)
{
  codeblock_metadata cfg = {};
  cfg.tb_common.base_graph =
      (bg == 1) ? ldpc_base_graph_type::BG1 : ldpc_base_graph_type::BG2;
  cfg.tb_common.lifting_size = to_ls(zc);
  cfg.tb_common.rv = rv;
  switch (qm) {
    case 2: cfg.tb_common.mod = modulation_scheme::QPSK; break;
    case 4: cfg.tb_common.mod = modulation_scheme::QAM16; break;
    case 6: cfg.tb_common.mod = modulation_scheme::QAM64; break;
    case 8: cfg.tb_common.mod = modulation_scheme::QAM256; break;
    default: cfg.tb_common.mod = modulation_scheme::BPSK; break;
  }
  cfg.tb_common.Nref = 0;
  cfg.cb_specific.full_length = dims(bg, zc).n_out + 2 * zc;
  cfg.cb_specific.rm_length = e;
  cfg.cb_specific.nof_filler_bits = nfill;
  cfg.cb_specific.cw_offset = 0;
  return cfg;
}

// Encode nmsg random messages; emit unpacked message bits then codeword bits.
// With nfill > 0 the LAST nfill message bits are filler (zero), matching the
// segmenter's layout (ldpc_segmenter_impl.cpp).
void gen_codewords(unsigned bg, unsigned zc, unsigned nmsg, uint64_t seed,
                   const std::string& impl, unsigned nfill,
                   std::vector<uint8_t>& msgs, std::vector<uint8_t>& cws)
{
  Dims d = dims(bg, zc);
  auto enc = make_encoder(impl);
  Rng rng(seed);
  msgs.assign(size_t(nmsg) * d.k, 0);
  cws.assign(size_t(nmsg) * d.n_out, 0);
  dynamic_bit_buffer msg_packed(d.k);
  dynamic_bit_buffer cw_packed(d.n_out);
  std::vector<uint8_t> cw_unpacked(d.n_out);
  for (unsigned m = 0; m != nmsg; ++m) {
    uint8_t* mb = &msgs[size_t(m) * d.k];
    for (unsigned i = 0; i != d.k - nfill; ++i) {
      mb[i] = rng.bit();
    }
    srsvec::bit_pack(msg_packed, span<const uint8_t>(mb, d.k));
    auto cfg = make_cfg(bg, zc);
    cfg.cb_specific.nof_filler_bits = nfill;
    enc->encode(cw_packed, msg_packed, cfg.tb_common);
    srsvec::bit_unpack(span<uint8_t>(cw_unpacked), cw_packed);
    std::memcpy(&cws[size_t(m) * d.n_out], cw_unpacked.data(), d.n_out);
  }
}

int cmd_encode(unsigned bg, unsigned zc, unsigned nmsg, uint64_t seed,
               const std::string& impl)
{
  std::vector<uint8_t> msgs, cws;
  gen_codewords(bg, zc, nmsg, seed, impl, 0, msgs, cws);
  write_bytes(msgs.data(), msgs.size());
  write_bytes(cws.data(), cws.size());
  return 0;
}

int cmd_crc(const std::string& poly, unsigned nbytes, unsigned nmsg,
            uint64_t seed)
{
  crc_generator_poly p = crc_generator_poly::CRC24A;
  if (poly == "24B") p = crc_generator_poly::CRC24B;
  else if (poly == "24C") p = crc_generator_poly::CRC24C;
  else if (poly == "16") p = crc_generator_poly::CRC16;
  else if (poly == "11") p = crc_generator_poly::CRC11;
  else if (poly == "6") p = crc_generator_poly::CRC6;
  // The LUT impl covers the SCH polys; CRC6/CRC11 (UCI) only exist in the
  // generic impl (crc_calculator_generic_impl.cpp:52).
  std::unique_ptr<crc_calculator> crc;
  if (poly == "6" || poly == "11") {
    crc = std::make_unique<crc_calculator_generic_impl>(p);
  } else {
    crc = std::make_unique<crc_calculator_lut_impl>(p);
  }
  Rng rng(seed);
  std::vector<uint8_t> data(size_t(nmsg) * nbytes);
  for (auto& b : data) {
    b = rng.byte();
  }
  std::vector<uint32_t> sums(nmsg);
  for (unsigned m = 0; m != nmsg; ++m) {
    sums[m] = crc->calculate_byte(
        span<const uint8_t>(&data[size_t(m) * nbytes], nbytes));
  }
  write_bytes(data.data(), data.size());
  write_bytes(sums.data(), sums.size() * 4);
  return 0;
}

int cmd_ratematch(unsigned bg, unsigned zc, unsigned e, unsigned rv,
                  unsigned qm, unsigned nfill, unsigned nmsg, uint64_t seed)
{
  // Drive with REAL encoder output (the matcher reads the filler span as
  // <FILLER_BIT>, which only exists in genuine codewords).
  std::vector<uint8_t> msgs, cws;
  gen_codewords(bg, zc, nmsg, seed, "generic", nfill, msgs, cws);
  Dims d = dims(bg, zc);
  ldpc_rate_matcher_impl rm;
  auto cfg = make_cfg(bg, zc, rv, qm, e, nfill);
  dynamic_bit_buffer in_packed(d.n_out);
  dynamic_bit_buffer out_packed(e);
  std::vector<uint8_t> out_unpacked(e);
  std::vector<uint8_t> outs(size_t(nmsg) * e);
  for (unsigned m = 0; m != nmsg; ++m) {
    srsvec::bit_pack(in_packed,
                     span<const uint8_t>(&cws[size_t(m) * d.n_out], d.n_out));
    rm.rate_match(out_packed, in_packed, cfg);
    srsvec::bit_unpack(span<uint8_t>(out_unpacked), out_packed);
    std::memcpy(&outs[size_t(m) * e], out_unpacked.data(), e);
  }
  write_bytes(msgs.data(), msgs.size());
  write_bytes(cws.data(), cws.size());
  write_bytes(outs.data(), outs.size());
  return 0;
}

int cmd_dematch(unsigned bg, unsigned zc, unsigned e, unsigned rv,
                unsigned qm, unsigned nfill, unsigned nmsg, uint64_t seed)
{
  Dims d = dims(bg, zc);
  ldpc_rate_dematcher_impl rdm;
  auto cfg = make_cfg(bg, zc, rv, qm, e, nfill);
  Rng rng(seed);
  std::vector<int8_t> llrs(size_t(nmsg) * e);
  for (auto& v : llrs) {
    v = static_cast<int8_t>(int(rng.next() % 241) - 120);
  }
  // Reference dematch output = the N = (cols-2)*Zc circular buffer (the
  // 2*Zc punctured positions are NOT part of its domain).
  std::vector<int8_t> outs(size_t(nmsg) * d.n_out);
  std::vector<log_likelihood_ratio> out(d.n_out);
  for (unsigned m = 0; m != nmsg; ++m) {
    std::vector<log_likelihood_ratio> in(e);
    for (unsigned i = 0; i != e; ++i) {
      in[i] = llrs[size_t(m) * e + i];
    }
    // Fresh buffer per call (the rx_buffer pool hands out zeroed
    // reservations): with k0 inside the parity region the reference's
    // copy-mode pass zeroes only the info-bit prefix, so a reused buffer
    // would leak stale LLRs into [nof_info_bits, k0).
    std::fill(out.begin(), out.end(), log_likelihood_ratio(0));
    rdm.rate_dematch(span<log_likelihood_ratio>(out),
                     span<const log_likelihood_ratio>(in),
                     /*new_data=*/true, cfg);
    for (unsigned i = 0; i != out.size(); ++i) {
      outs[size_t(m) * out.size() + i] = out[i].to_int();
    }
  }
  write_bytes(llrs.data(), llrs.size());
  write_bytes(outs.data(), outs.size());
  return 0;
}

// Encode -> BPSK -> AWGN -> reference demapper quantization (clip +-20 ->
// +-120 int8) -> reference decoder.  Emits msgs, int8 LLRs (full codeword
// incl. the 2*zc punctured positions as 0), hard decisions, iteration counts
// (int32, -1 = failed), so the Python side can replay the SAME LLRs through
// the TPU decoder's reference-semantics int8 schedule.
int cmd_decode(unsigned bg, unsigned zc, unsigned nmsg, uint64_t seed,
               unsigned sigma_x1000, unsigned iters, const std::string& impl,
               unsigned early)
{
  std::vector<uint8_t> msgs, cws;
  gen_codewords(bg, zc, nmsg, seed, "generic", 0, msgs, cws);
  Dims d = dims(bg, zc);
  double sigma = sigma_x1000 / 1000.0;
  std::mt19937_64 g(seed ^ 0xabcdef);
  std::normal_distribution<double> noise(0.0, sigma);

  auto dec = make_decoder(impl);
  crc_calculator_lut_impl crc16(crc_generator_poly::CRC16);

  // Decoder input is the N-domain LLR vector (2*Zc punctured positions are
  // inserted internally, ldpc_decoder_impl.cpp load_soft_bits); the llrs
  // EXPORT keeps the full-codeword layout (leading 2*Zc zeros) to match the
  // TPU decoder's input convention.
  unsigned n_full = d.n_out + 2 * zc;
  std::vector<int8_t> llrs(size_t(nmsg) * n_full, 0);
  std::vector<uint8_t> hards(size_t(nmsg) * d.k, 0);
  std::vector<int32_t> its(nmsg, -1);

  ldpc_decoder::configuration cfg = {};
  cfg.block_conf = make_cfg(bg, zc);
  cfg.algorithm_conf.max_iterations = iters;
  cfg.algorithm_conf.scaling_factor = 0.8;

  dynamic_bit_buffer out_packed(d.k);
  std::vector<uint8_t> out_unpacked(d.k);
  for (unsigned m = 0; m != nmsg; ++m) {
    int8_t* lr = &llrs[size_t(m) * n_full];
    std::vector<log_likelihood_ratio> in(d.n_out);
    for (unsigned i = 0; i != d.n_out; ++i) {
      double x = 1.0 - 2.0 * double(cws[size_t(m) * d.n_out + i]);
      double y = x + noise(g);
      double l = 2.0 * y / (sigma * sigma);
      // Reference demapper int8 quantization: clip +-20, scale to +-120
      // (demodulation_mapper_qam16.cpp:36-37, log_likelihood_ratio).
      double q = std::round(l * (120.0 / 20.0));
      q = std::min(120.0, std::max(-120.0, q));
      lr[2 * zc + i] = static_cast<int8_t>(q);
      in[i] = static_cast<int8_t>(q);
    }
    auto r = dec->decode(out_packed, span<const log_likelihood_ratio>(in),
                         early ? &crc16 : nullptr, cfg);
    // NOTE: with a CRC the decoder checks the last 16 message bits as a
    // CRC16 over the rest — our random messages don't satisfy that, so for
    // vector generation early-stop stays off (early=0) unless the caller
    // builds CRC-valid messages.
    if (r.has_value()) {
      its[m] = static_cast<int32_t>(*r);
    }
    srsvec::bit_unpack(span<uint8_t>(out_unpacked), out_packed);
    std::memcpy(&hards[size_t(m) * d.k], out_unpacked.data(), d.k);
  }
  write_bytes(msgs.data(), msgs.size());
  write_bytes(llrs.data(), llrs.size());
  write_bytes(hards.data(), hards.size());
  write_bytes(its.data(), its.size() * 4);
  return 0;
}

// Decode caller-supplied int8 LLRs: nmsg x (n_out + 2*zc) int8 on stdin in
// the full-codeword layout cmd_decode exports (the leading 2*Zc punctured
// positions are ignored).  Emits hard decisions (nmsg x k bytes) and
// iteration counts (int32, -1 = hit max without the internal CRC hook).
// This is the decoder-parity probe: the Python side generates ONE set of
// noisy realizations (through its own modulate/demap/dematch chain at a
// real MCS operating point) and feeds the identical buffers to this
// reference decoder and to the TPU decoder schedules, so BLER curves
// compare decoder-vs-decoder with no other variable.
extern "C" int dbg_decode_soft(const char* impl, unsigned bg_i, unsigned zc,
                               unsigned iters, const int8_t* in,
                               unsigned n_out, int8_t* soft_out,
                               unsigned nof_nodes);

// decode_soft: like decode_llrs but emits the decoder's FULL internal
// soft-bit state (nof_nodes x zc int8) per message — trajectory-level
// debugging of decoder parity.
int cmd_decode_soft(unsigned bg, unsigned zc, unsigned nmsg, unsigned iters,
                    const std::string& impl, unsigned n_out)
{
  unsigned n_full    = n_out + 2 * zc;
  unsigned nof_nodes = n_full / zc;
  std::vector<int8_t> llrs(size_t(nmsg) * n_full);
  if (std::fread(llrs.data(), 1, llrs.size(), stdin) != llrs.size()) {
    std::fprintf(stderr, "short stdin read\n");
    return 2;
  }
  std::vector<int8_t> soft(size_t(nmsg) * nof_nodes * zc);
  for (unsigned m = 0; m != nmsg; ++m) {
    dbg_decode_soft(impl.c_str(), bg, zc, iters, &llrs[size_t(m) * n_full + 2 * zc],
                    n_out, &soft[size_t(m) * nof_nodes * zc], nof_nodes);
  }
  write_bytes(soft.data(), soft.size());
  return 0;
}

int cmd_decode_llrs(unsigned bg, unsigned zc, unsigned nmsg, unsigned iters,
                    const std::string& impl, unsigned n_out_override = 0)
{
  Dims d = dims(bg, zc);
  if (n_out_override != 0) {
    // Short input => fewer decode layers (codeblock_length derives from
    // input_size, ldpc_decoder_impl.cpp:107) — the layer-bisection probe.
    d.n_out = n_out_override;
  }
  unsigned n_full = d.n_out + 2 * zc;
  std::vector<int8_t> llrs(size_t(nmsg) * n_full);
  if (std::fread(llrs.data(), 1, llrs.size(), stdin) != llrs.size()) {
    std::fprintf(stderr, "short stdin read\n");
    return 2;
  }
  auto dec = make_decoder(impl);
  ldpc_decoder::configuration cfg = {};
  cfg.block_conf = make_cfg(bg, zc);
  cfg.algorithm_conf.max_iterations = iters;
  cfg.algorithm_conf.scaling_factor = 0.8;

  std::vector<uint8_t> hards(size_t(nmsg) * d.k, 0);
  std::vector<int32_t> its(nmsg, -1);
  dynamic_bit_buffer out_packed(d.k);
  std::vector<uint8_t> out_unpacked(d.k);
  for (unsigned m = 0; m != nmsg; ++m) {
    std::vector<log_likelihood_ratio> in(d.n_out);
    const int8_t* lr = &llrs[size_t(m) * n_full];
    for (unsigned i = 0; i != d.n_out; ++i) {
      in[i] = lr[2 * zc + i];
    }
    auto r = dec->decode(out_packed, span<const log_likelihood_ratio>(in),
                         nullptr, cfg);
    if (r.has_value()) {
      its[m] = static_cast<int32_t>(*r);
    }
    srsvec::bit_unpack(span<uint8_t>(out_unpacked), out_packed);
    std::memcpy(&hards[size_t(m) * d.k], out_unpacked.data(), d.k);
  }
  write_bytes(hards.data(), hards.size());
  write_bytes(its.data(), its.size() * 4);
  return 0;
}

int cmd_bench_encode(unsigned bg, unsigned zc, unsigned iters,
                     const std::string& impl)
{
  Dims d = dims(bg, zc);
  auto enc = make_encoder(impl);
  Rng rng(1);
  std::vector<uint8_t> mb(d.k);
  for (auto& b : mb) {
    b = rng.bit();
  }
  dynamic_bit_buffer msg_packed(d.k);
  srsvec::bit_pack(msg_packed, span<const uint8_t>(mb));
  dynamic_bit_buffer cw_packed(d.n_out);
  auto cfg = make_cfg(bg, zc);
  auto t0 = std::chrono::steady_clock::now();
  for (unsigned i = 0; i != iters; ++i) {
    enc->encode(cw_packed, msg_packed, cfg.tb_common);
  }
  double dt = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count();
  std::fprintf(stderr,
               "bench_encode %s bg%u zc%u: %.3f us/cb, %.1f Mbit/s (msg)\n",
               impl.c_str(), bg, zc, dt / iters * 1e6,
               double(d.k) * iters / dt / 1e6);
  std::printf("%.6f\n", double(d.k) * iters / dt / 1e6);
  return 0;
}

int cmd_bench_decode(unsigned bg, unsigned zc, unsigned iters,
                     unsigned sigma_x1000, const std::string& impl,
                     unsigned early)
{
  std::vector<uint8_t> msgs, cws;
  gen_codewords(bg, zc, 1, 7, "generic", 0, msgs, cws);
  Dims d = dims(bg, zc);
  double sigma = sigma_x1000 / 1000.0;
  std::mt19937_64 g(99);
  std::normal_distribution<double> noise(0.0, sigma);
  std::vector<log_likelihood_ratio> in(d.n_out);
  for (unsigned i = 0; i != d.n_out; ++i) {
    double x = 1.0 - 2.0 * double(cws[i]);
    double l = 2.0 * (x + noise(g)) / (sigma * sigma);
    double q = std::min(120.0, std::max(-120.0, std::round(l * 6.0)));
    in[i] = static_cast<int8_t>(q);
  }
  auto dec = make_decoder(impl);
  crc_calculator_lut_impl crc16(crc_generator_poly::CRC16);
  ldpc_decoder::configuration cfg = {};
  cfg.block_conf = make_cfg(bg, zc);
  cfg.algorithm_conf.max_iterations = 6;
  cfg.algorithm_conf.scaling_factor = 0.8;
  dynamic_bit_buffer out_packed(d.k);
  auto t0 = std::chrono::steady_clock::now();
  for (unsigned i = 0; i != iters; ++i) {
    dec->decode(out_packed, span<const log_likelihood_ratio>(in),
                early ? &crc16 : nullptr, cfg);
  }
  double dt = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count();
  std::fprintf(stderr,
               "bench_decode %s bg%u zc%u sigma%.2f early%u: %.3f us/cb, "
               "%.1f Mbit/s (msg)\n",
               impl.c_str(), bg, zc, sigma, early, dt / iters * 1e6,
               double(d.k) * iters / dt / 1e6);
  std::printf("%.6f\n", double(d.k) * iters / dt / 1e6);
  return 0;
}

modulation_scheme to_mod(unsigned qm)
{
  switch (qm) {
    case 2: return modulation_scheme::QPSK;
    case 4: return modulation_scheme::QAM16;
    case 6: return modulation_scheme::QAM64;
    case 8: return modulation_scheme::QAM256;
    default: return modulation_scheme::BPSK;
  }
}

// TS 38.211 5.2.1 Gold sequence bits straight from the reference generator
// (pseudo_random_generator_impl.cpp: x1/x2 LFSRs + fast-advance LUTs).
int cmd_prg(unsigned c_init, unsigned len, unsigned nseq)
{
  pseudo_random_generator_impl prg;
  std::vector<uint8_t> zeros(len, 0), out(len);
  for (unsigned i = 0; i != nseq; ++i) {
    prg.init(c_init + i * 7919u);
    prg.apply_xor(span<uint8_t>(out), span<const uint8_t>(zeros));
    write_bytes(out.data(), len);
  }
  return 0;
}

// TS 38.211 5.2.2 low-PAPR r^(alpha)_{u,v} sequence
// (low_papr_sequence_generator_impl.cpp).
int cmd_lowpapr(unsigned u, unsigned v, unsigned anum, unsigned aden,
                unsigned m)
{
  low_papr_sequence_generator_impl gen;
  std::vector<cf_t> seq(m);
  gen.generate(span<cf_t>(seq), u, v, anum, aden);
  write_bytes(seq.data(), m * sizeof(cf_t));
  return 0;
}

// Modulation mapper LUT impl (modulation_mapper_lut_impl.cpp): bits -> cf_t.
int cmd_modmap(unsigned qm, unsigned nsym, unsigned nmsg, uint64_t seed)
{
  modulation_mapper_lut_impl mapper;
  Rng rng(seed);
  unsigned nbits = nsym * qm;
  std::vector<uint8_t> bits(nbits);
  dynamic_bit_buffer packed(nbits);
  std::vector<cf_t> syms(nsym);
  for (unsigned m = 0; m != nmsg; ++m) {
    for (auto& b : bits) {
      b = rng.bit();
    }
    srsvec::bit_pack(packed, span<const uint8_t>(bits));
    mapper.modulate(span<cf_t>(syms), packed, to_mod(qm));
    write_bytes(bits.data(), nbits);
    write_bytes(syms.data(), nsym * sizeof(cf_t));
  }
  return 0;
}

// Soft demapper (demodulation_mapper_impl.cpp + per-QAM AVX2/interval
// kernels): noisy symbols + per-symbol noise vars -> int8 LLRs.
int cmd_demap(unsigned qm, unsigned nsym, unsigned nmsg, uint64_t seed,
              unsigned sigma_x1000)
{
  modulation_mapper_lut_impl mapper;
  demodulation_mapper_impl demapper;
  Rng rng(seed);
  std::mt19937_64 g(seed ^ 0x5eed);
  double sigma = sigma_x1000 / 1000.0;
  std::normal_distribution<double> noise(0.0, sigma);
  unsigned nbits = nsym * qm;
  std::vector<uint8_t> bits(nbits);
  dynamic_bit_buffer packed(nbits);
  std::vector<cf_t> syms(nsym);
  std::vector<float> nvars(nsym);
  std::vector<log_likelihood_ratio> llrs(nbits);
  std::vector<int8_t> llrs_i8(nbits);
  for (unsigned m = 0; m != nmsg; ++m) {
    for (auto& b : bits) {
      b = rng.bit();
    }
    srsvec::bit_pack(packed, span<const uint8_t>(bits));
    mapper.modulate(span<cf_t>(syms), packed, to_mod(qm));
    for (unsigned i = 0; i != nsym; ++i) {
      syms[i] += cf_t(float(noise(g)), float(noise(g)));
      nvars[i] = float(sigma * sigma) * (0.5f + 0.125f * float(i % 8));
    }
    demapper.demodulate_soft(span<log_likelihood_ratio>(llrs),
                             span<const cf_t>(syms),
                             span<const float>(nvars), to_mod(qm));
    for (unsigned i = 0; i != nbits; ++i) {
      llrs_i8[i] = llrs[i].to_int();
    }
    write_bytes(syms.data(), nsym * sizeof(cf_t));
    write_bytes(nvars.data(), nsym * sizeof(float));
    write_bytes(llrs_i8.data(), nbits);
  }
  return 0;
}

// Channel equalizer (channel_equalizer_generic_impl.cpp, 1 layer x N ports,
// MMSE / ZF).  Inputs are quantized to cbf16 exactly as the reference's
// resource grid / channel estimate stores them; the EXPORTED y/h are the
// cbf16->f32 roundtripped values so the Python side replays identical
// numbers.  A few REs get zeroed channels to exercise the abnormal-input
// policy (x=0, nvar=inf).
int cmd_eq(const std::string& algo, unsigned nports, unsigned nre,
           unsigned nmsg, uint64_t seed, unsigned txs_x1000)
{
  channel_equalizer_generic_impl eq(
      algo == "zf" ? channel_equalizer_algorithm_type::zf
                   : channel_equalizer_algorithm_type::mmse);
  std::mt19937_64 g(seed);
  std::normal_distribution<double> gauss(0.0, 1.0);
  float txs = txs_x1000 / 1000.0f;
  for (unsigned m = 0; m != nmsg; ++m) {
    dynamic_re_buffer<cbf16_t> ch_symbols(nports, nre);
    modular_ch_est_list<16> ests(nports, 1);
    ests.resize(nre, nports, 1);
    std::vector<cbf16_t> est_store(size_t(nports) * nre);
    std::vector<float> port_nvars(nports);
    std::vector<cf_t> y_out(size_t(nports) * nre);
    std::vector<cf_t> h_out(size_t(nports) * nre);
    for (unsigned p = 0; p != nports; ++p) {
      port_nvars[p] = 0.01f + 0.2f * float(p) + float((m * 31 + p) % 5) * 0.07f;
      span<cbf16_t> row = ch_symbols.get_slice(p);
      for (unsigned i = 0; i != nre; ++i) {
        cf_t y = cf_t(float(gauss(g)), float(gauss(g)));
        cf_t h = cf_t(float(gauss(g)), float(gauss(g)));
        if (i % 17 == 3 && p == 0) {
          h = 0.0f;  // abnormal channel on port 0
        }
        row[i] = to_cbf16(y);
        est_store[size_t(p) * nre + i] = to_cbf16(h);
        y_out[size_t(p) * nre + i] = to_cf(row[i]);
        h_out[size_t(p) * nre + i] = to_cf(est_store[size_t(p) * nre + i]);
      }
      ests.set_channel(
          span<const cbf16_t>(&est_store[size_t(p) * nre], nre), p, 0);
    }
    std::vector<cf_t> eq_syms(nre);
    std::vector<float> eq_nvars(nre);
    eq.equalize(span<cf_t>(eq_syms), span<float>(eq_nvars), ch_symbols, ests,
                span<const float>(port_nvars), txs);
    write_bytes(y_out.data(), y_out.size() * sizeof(cf_t));
    write_bytes(h_out.data(), h_out.size() * sizeof(cf_t));
    write_bytes(port_nvars.data(), nports * sizeof(float));
    write_bytes(eq_syms.data(), nre * sizeof(cf_t));
    write_bytes(eq_nvars.data(), nre * sizeof(float));
  }
  return 0;
}

// Short-block (Reed-Muller / repetition) encoder + ML detector
// (short_block_{encoder,detector}_impl.cpp).
int cmd_shortblock(unsigned k, unsigned e, unsigned qm, unsigned nmsg,
                   uint64_t seed, unsigned sigma_x1000)
{
  short_block_encoder_impl enc;
  short_block_detector_impl det;
  Rng rng(seed);
  std::mt19937_64 g(seed ^ 0xb10c);
  double sigma = sigma_x1000 / 1000.0;
  std::normal_distribution<double> noise(0.0, sigma);
  std::vector<uint8_t> msg(k), cw(e), out(k);
  std::vector<log_likelihood_ratio> llrs(e);
  std::vector<int8_t> llrs_i8(e);
  for (unsigned m = 0; m != nmsg; ++m) {
    for (auto& b : msg) {
      b = rng.bit();
    }
    enc.encode(span<uint8_t>(cw), span<const uint8_t>(msg), to_mod(qm));
    for (unsigned i = 0; i != e; ++i) {
      double x = 1.0 - 2.0 * double(cw[i]);
      double l = 2.0 * (x + noise(g)) / (sigma * sigma);
      double q = std::min(120.0, std::max(-120.0, std::round(l * 6.0)));
      llrs[i] = static_cast<int8_t>(q);
      llrs_i8[i] = static_cast<int8_t>(q);
    }
    bool valid = det.detect(span<uint8_t>(out),
                            span<const log_likelihood_ratio>(llrs),
                            to_mod(qm));
    uint8_t vb = valid ? 1 : 0;
    write_bytes(msg.data(), k);
    write_bytes(cw.data(), e);
    write_bytes(llrs_i8.data(), e);
    write_bytes(out.data(), k);
    write_bytes(&vb, 1);
  }
  return 0;
}

// Polar chain (polar_*_impl.cpp): code construction + TX chain
// (interleave -> allocate -> encode -> rate match, the pdcch_encoder_impl
// order) and RX chain (rate dematch -> SC decode -> deallocate ->
// deinterleave).
int cmd_polar(unsigned K, unsigned E, unsigned nmax, unsigned ibil,
              unsigned nmsg, uint64_t seed, unsigned sigma_x1000)
{
  polar_code_impl code;
  code.set(K, E, nmax,
           ibil ? polar_code_ibil::present : polar_code_ibil::not_present);
  unsigned N = code.get_N();
  uint32_t hdr[3] = {N, code.get_n(), code.get_nPC()};
  write_bytes(hdr, sizeof(hdr));
  // Per-position membership masks: bit0 = K_set (info+PC), bit1 = F_set.
  const auto& kset = code.get_K_set();
  const auto& fset = code.get_F_set();
  std::vector<uint8_t> mask(N, 0);
  for (unsigned i = 0; i != N; ++i) {
    mask[i] = (kset.test(i) ? 1 : 0) | (fset.test(i) ? 2 : 0);
  }
  write_bytes(mask.data(), N);
  // get_PC_set() may be backed by a fixed-capacity buffer; only the first
  // nPC entries are meaningful.
  auto pc = code.get_PC_set();
  uint32_t npc = std::min<uint32_t>(code.get_nPC(), pc.size());
  write_bytes(&npc, 4);
  write_bytes(pc.data(), npc * sizeof(uint16_t));

  polar_interleaver_impl itl;
  polar_allocator_impl alloc;
  polar_encoder_impl enc;
  polar_rate_matcher_impl rm;
  polar_rate_dematcher_impl rdm;
  polar_deallocator_impl dealloc;
  polar_decoder_impl dec(std::make_unique<polar_encoder_impl>(), 10);

  Rng rng(seed);
  std::mt19937_64 g(seed ^ 0x9017a);
  double sigma = sigma_x1000 / 1000.0;
  std::normal_distribution<double> noise(0.0, sigma);

  std::vector<uint8_t> msg(K), c_prime(K), allocated(N), encoded(N),
      matched(E), dec_n(N), dec_msg_itl(K), dec_msg(K);
  std::vector<log_likelihood_ratio> llr_e(E), llr_n(N);
  std::vector<int8_t> llr_i8(E);
  for (unsigned m = 0; m != nmsg; ++m) {
    for (auto& b : msg) {
      b = rng.bit();
    }
    itl.interleave(span<uint8_t>(c_prime), span<const uint8_t>(msg),
                   polar_interleaver_direction::tx);
    alloc.allocate(span<uint8_t>(allocated), span<const uint8_t>(c_prime),
                   code);
    enc.encode(span<uint8_t>(encoded), span<const uint8_t>(allocated),
               code.get_n());
    rm.rate_match(span<uint8_t>(matched), span<const uint8_t>(encoded), code);
    for (unsigned i = 0; i != E; ++i) {
      double x = 1.0 - 2.0 * double(matched[i]);
      double l = 2.0 * (x + noise(g)) / (sigma * sigma);
      double q = std::min(120.0, std::max(-120.0, std::round(l * 6.0)));
      llr_e[i] = static_cast<int8_t>(q);
      llr_i8[i] = static_cast<int8_t>(q);
    }
    rdm.rate_dematch(span<log_likelihood_ratio>(llr_n),
                     span<const log_likelihood_ratio>(llr_e), code);
    dec.decode(span<uint8_t>(dec_n), span<const log_likelihood_ratio>(llr_n),
               code);
    dealloc.deallocate(span<uint8_t>(dec_msg_itl),
                       span<const uint8_t>(dec_n), code);
    itl.interleave(span<uint8_t>(dec_msg), span<const uint8_t>(dec_msg_itl),
                   polar_interleaver_direction::rx);
    write_bytes(msg.data(), K);
    write_bytes(c_prime.data(), K);
    write_bytes(allocated.data(), N);
    write_bytes(encoded.data(), N);
    write_bytes(matched.data(), E);
    write_bytes(llr_i8.data(), E);
    write_bytes(dec_msg.data(), K);
  }
  return 0;
}

// O-RAN fronthaul BFP IQ compression (lib/ofh/compression): cbf16 grid IQ ->
// per-PRB exponent + packed W-bit mantissas -> decompressed cbf16.  Emits
// every stage so the TPU op is validated bit-exactly end to end.
int cmd_ofhbfp(unsigned width, unsigned nprb, unsigned nmsg, uint64_t seed,
               unsigned scale_x1000)
{
  auto& logger = srslog::fetch_basic_logger("OFH");
  float iq_scaling = scale_x1000 / 1000.0f;
  ofh::iq_compression_bfp_impl comp(logger, iq_scaling);
  ofh::ru_compression_params params;
  params.type = ofh::compression_type::BFP;
  params.data_width = width;
  std::mt19937_64 g(seed);
  std::uniform_real_distribution<float> uni(-1.0f, 1.0f);
  unsigned nsamp = nprb * 12;
  unsigned psize = (24 * width + 7) / 8;
  ofh::quantizer q16(16);
  for (unsigned m = 0; m != nmsg; ++m) {
    std::vector<cbf16_t> in(nsamp);
    std::vector<cf_t> in_f32(nsamp);
    // A few PRBs get tiny amplitudes to exercise the full exponent range.
    for (unsigned i = 0; i != nsamp; ++i) {
      float att = ((i / 12) % 5 == 2) ? 1e-3f : 1.0f;
      cf_t v = cf_t(uni(g), uni(g)) * att;
      in[i] = to_cbf16(v);
      in_f32[i] = to_cf(in[i]);
    }
    // Quantized int16 stage (quantizer.h span conversion).
    std::vector<int16_t> quant(nsamp * 2);
    q16.to_fixed_point(span<int16_t>(quant),
                       span<const bf16_t>(
                           reinterpret_cast<const bf16_t*>(in.data()),
                           nsamp * 2),
                       iq_scaling);
    std::vector<ofh::compressed_prb> prbs(nprb);
    comp.compress(span<ofh::compressed_prb>(prbs),
                  span<const cbf16_t>(in), params);
    std::vector<uint8_t> exps(nprb);
    std::vector<uint8_t> packed(size_t(nprb) * psize, 0);
    for (unsigned p = 0; p != nprb; ++p) {
      exps[p] = prbs[p].get_compression_param();
      auto d = prbs[p].get_packed_data();
      std::memcpy(&packed[size_t(p) * psize], d.data(),
                  std::min<size_t>(d.size(), psize));
    }
    std::vector<cbf16_t> out(nsamp);
    comp.decompress(span<cbf16_t>(out),
                    span<const ofh::compressed_prb>(prbs), params);
    std::vector<cf_t> out_f32(nsamp);
    for (unsigned i = 0; i != nsamp; ++i) {
      out_f32[i] = to_cf(out[i]);
    }
    write_bytes(in_f32.data(), nsamp * sizeof(cf_t));
    write_bytes(quant.data(), quant.size() * 2);
    write_bytes(exps.data(), nprb);
    write_bytes(packed.data(), packed.size());
    write_bytes(out_f32.data(), nsamp * sizeof(cf_t));
  }
  return 0;
}

// Minimal in-memory resource grid (cf_t storage; inputs are pre-rounded to
// bf16 host-side so the comparison against our c64 path is exact) for
// driving the reference OFDM modulator/demodulator.
class flat_grid : public resource_grid_reader, public resource_grid_writer {
public:
  flat_grid(unsigned nsymb, unsigned nsubc)
      : nsubc_(nsubc), data_(size_t(nsymb) * nsubc, cf_t()) {}

  cf_t* row(unsigned l)
  {
    fold();
    return &data_[size_t(l) * nsubc_];
  }

  // reader
  unsigned get_nof_subc() const override { return nsubc_; }
  unsigned get_nof_symbols() const override { return 14; }
  unsigned get_nof_ports() const override { return 1; }
  bool is_empty(unsigned) const override { return false; }
  bool is_empty() const override { return false; }
  span<cf_t> get(span<cf_t> symbols, unsigned, unsigned l, unsigned k_init,
                 const bounded_bitset<MAX_RB * NRE>& mask) const override
  {
    fold();
    unsigned count = 0;
    for (unsigned k = 0; k != mask.size(); ++k) {
      if (mask.test(k)) {
        symbols[count++] = data_[size_t(l) * nsubc_ + k_init + k];
      }
    }
    return symbols.last(symbols.size() - count);
  }
  span<cbf16_t> get(span<cbf16_t> symbols, unsigned, unsigned l,
                    unsigned k_init,
                    const bounded_bitset<MAX_RB * NRE>& mask) const override
  {
    fold();
    unsigned count = 0;
    for (unsigned k = 0; k != mask.size(); ++k) {
      if (mask.test(k)) {
        symbols[count++] = to_cbf16(data_[size_t(l) * nsubc_ + k_init + k]);
      }
    }
    return symbols.last(symbols.size() - count);
  }
  void get(span<cf_t> symbols, unsigned, unsigned l, unsigned k_init,
           unsigned stride) const override
  {
    fold();
    for (unsigned i = 0; i != symbols.size(); ++i) {
      symbols[i] = data_[size_t(l) * nsubc_ + k_init + i * stride];
    }
  }
  void get(span<cbf16_t> symbols, unsigned, unsigned l,
           unsigned k_init) const override
  {
    fold();
    for (unsigned i = 0; i != symbols.size(); ++i) {
      symbols[i] = to_cbf16(data_[size_t(l) * nsubc_ + k_init + i]);
    }
  }
  span<const cbf16_t> get_view(unsigned, unsigned l) const override
  {
    ensure_bf16(l);
    return span<const cbf16_t>(bf16_rows_[l]);
  }
  // writer
  span<const cf_t> put(unsigned, unsigned l, unsigned k_init,
                       const bounded_bitset<NRE * MAX_RB>& mask,
                       span<const cf_t> symbols) override
  {
    fold();
    unsigned count = 0;
    for (unsigned k = 0; k != mask.size(); ++k) {
      if (mask.test(k)) {
        data_[size_t(l) * nsubc_ + k_init + k] = symbols[count++];
      }
    }
    return symbols.last(symbols.size() - count);
  }
  span<const cbf16_t> put(unsigned, unsigned, unsigned,
                          const bounded_bitset<NRE * MAX_RB>&,
                          span<const cbf16_t>) override
  {
    std::abort();
  }
  void put(unsigned, unsigned l, unsigned k_init,
           span<const cf_t> symbols) override
  {
    fold();
    for (unsigned i = 0; i != symbols.size(); ++i) {
      data_[size_t(l) * nsubc_ + k_init + i] = symbols[i];
    }
  }
  void put(unsigned, unsigned l, unsigned k_init, unsigned stride,
           span<const cbf16_t> symbols) override
  {
    fold();
    for (unsigned i = 0; i != symbols.size(); ++i) {
      data_[size_t(l) * nsubc_ + k_init + i * stride] = to_cf(symbols[i]);
    }
  }
  // Writable cbf16 view: hand out a shadow row and fold it back into the
  // cf_t storage on the next access (the mapper writes whole symbols).
  span<cbf16_t> get_view(unsigned, unsigned l) override
  {
    ensure_bf16(l);
    dirty_[l] = true;
    return span<cbf16_t>(bf16_rows_[l]);
  }

private:
  void ensure_bf16(unsigned l) const
  {
    if (bf16_rows_.empty()) {
      bf16_rows_.resize(data_.size() / nsubc_,
                        std::vector<cbf16_t>(nsubc_));
      dirty_.assign(bf16_rows_.size(), false);
    }
    fold();
    for (unsigned k = 0; k != nsubc_; ++k) {
      bf16_rows_[l][k] = to_cbf16(data_[size_t(l) * nsubc_ + k]);
    }
  }
  // Fold any dirty bf16 view rows back into the cf_t store.  Called at the
  // start of every accessor so interleaved view writes and direct puts
  // cannot clobber each other.
  void fold() const
  {
    for (unsigned r = 0; r != bf16_rows_.size(); ++r) {
      if (dirty_[r]) {
        for (unsigned k = 0; k != nsubc_; ++k) {
          const_cast<flat_grid*>(this)->data_[size_t(r) * nsubc_ + k] =
              to_cf(bf16_rows_[r][k]);
        }
        dirty_[r] = false;
      }
    }
  }

  unsigned nsubc_;
  std::vector<cf_t> data_;
  mutable std::vector<std::vector<cbf16_t>> bf16_rows_;
  mutable std::vector<bool> dirty_;
};

// OFDM slot modulation + demodulation through the reference's generic
// (FFTW-free) DFT: grid -> samples -> grid, all stages emitted.
int cmd_ofdm(unsigned mu, unsigned bw_rb, unsigned dft_size,
             unsigned slot_idx, unsigned scale_x1000, unsigned cfreq_hz,
             unsigned win_offset, uint64_t seed)
{
  unsigned nsubc = bw_rb * 12;
  unsigned nsymb = 14;
  std::mt19937_64 g(seed);
  std::uniform_real_distribution<float> uni(-1.0f, 1.0f);
  flat_grid grid(nsymb, nsubc);
  std::vector<cf_t> grid_out(size_t(nsymb) * nsubc);
  for (unsigned l = 0; l != nsymb; ++l) {
    for (unsigned k = 0; k != nsubc; ++k) {
      cf_t v = to_cf(to_cbf16(cf_t(uni(g), uni(g))));
      grid.row(l)[k] = v;
      grid_out[size_t(l) * nsubc + k] = v;
    }
  }

  ofdm_modulator_configuration mod_cfg = {};
  mod_cfg.numerology = mu;
  mod_cfg.bw_rb = bw_rb;
  mod_cfg.dft_size = dft_size;
  mod_cfg.cp = cyclic_prefix::NORMAL;
  mod_cfg.scale = scale_x1000 / 1000.0f;
  mod_cfg.center_freq_hz = double(cfreq_hz);
  ofdm_modulator_common_configuration mod_common;
  dft_processor::configuration dft_cfg_inv = {dft_size,
                                              dft_processor::direction::INVERSE};
  mod_common.dft = std::make_unique<dft_processor_generic_impl>(dft_cfg_inv);
  ofdm_slot_modulator_impl mod(mod_common, mod_cfg);

  unsigned slot_size = mod.get_slot_size(slot_idx);
  std::vector<cf_t> samples(slot_size);
  mod.modulate(span<cf_t>(samples), grid, 0, slot_idx);

  ofdm_demodulator_configuration dem_cfg = {};
  dem_cfg.numerology = mu;
  dem_cfg.bw_rb = bw_rb;
  dem_cfg.dft_size = dft_size;
  dem_cfg.cp = cyclic_prefix::NORMAL;
  dem_cfg.nof_samples_window_offset = win_offset;
  dem_cfg.scale = 1.0f / (mod_cfg.scale * float(dft_size));
  dem_cfg.center_freq_hz = double(cfreq_hz);
  ofdm_demodulator_common_configuration dem_common;
  dft_processor::configuration dft_cfg_fwd = {dft_size,
                                              dft_processor::direction::DIRECT};
  dem_common.dft = std::make_unique<dft_processor_generic_impl>(dft_cfg_fwd);
  ofdm_slot_demodulator_impl dem(dem_common, dem_cfg);

  flat_grid rx_grid(nsymb, nsubc);
  dem.demodulate(rx_grid, span<const cf_t>(samples), 0, slot_idx);
  std::vector<cf_t> rx_out(size_t(nsymb) * nsubc);
  for (unsigned l = 0; l != nsymb; ++l) {
    std::memcpy(&rx_out[size_t(l) * nsubc], rx_grid.row(l),
                nsubc * sizeof(cf_t));
  }

  uint32_t hdr[2] = {nsubc, slot_size};
  write_bytes(hdr, sizeof(hdr));
  write_bytes(grid_out.data(), grid_out.size() * sizeof(cf_t));
  write_bytes(samples.data(), samples.size() * sizeof(cf_t));
  write_bytes(rx_out.data(), rx_out.size() * sizeof(cf_t));
  return 0;
}

// PUSCH port channel estimation (port_channel_estimator_average_impl:
// pilot match + CFO + time-average + 4096-IDFT TA + fd smoothing +
// interpolation) on a synthetic 2-tap channel with CFO and AWGN.  Emits the
// exact rx pilot REs so the TPU estimator runs on identical inputs, the
// reference's full-band estimate, and its CSI metrics — the Python side
// compares estimation QUALITY vs the known true channel (the TPU estimator
// is an intentional algorithmic redesign, not a float-for-float port).
int cmd_chest(unsigned nprb, unsigned ndmrs, unsigned delay_ns,
              unsigned cfo_hz, int snr_db_x10, unsigned smoothing,
              uint64_t seed)
{
  unsigned nsubc = nprb * 12;
  unsigned npil = nprb * 6;
  unsigned nsymb = 14;
  // DM-RS symbol positions spread over the slot.
  std::vector<unsigned> dsyms;
  if (ndmrs == 1) dsyms = {2};
  else if (ndmrs == 2) dsyms = {2, 11};
  else if (ndmrs == 3) dsyms = {2, 7, 11};
  else dsyms = {2, 5, 8, 11};

  // Symbol start times of the useful part (15 kHz SCS, normal CP) — same
  // convention as the estimator's internal CFO machinery.
  double srate = 1536 * 15000.0;
  std::vector<double> t_sym(nsymb);
  {
    double t = 0;
    for (unsigned l = 0; l != nsymb; ++l) {
      unsigned cp = ((l == 0) ? 120u : 108u);
      t_sym[l] = (t + cp) / srate;
      t += cp + 1536;
    }
  }

  // True 2-tap channel over the full band.
  double tau0 = delay_ns * 1e-9, tau1 = delay_ns * 1e-9 + 200e-9;
  std::vector<cf_t> h_true(nsubc);
  for (unsigned k = 0; k != nsubc; ++k) {
    double w0 = -2.0 * M_PI * 15000.0 * k * tau0;
    double w1 = -2.0 * M_PI * 15000.0 * k * tau1;
    h_true[k] = cf_t(std::cos(w0), std::sin(w0))
              + 0.4f * cf_t(std::cos(w1), std::sin(w1));
  }

  double sigma = std::pow(10.0, -double(snr_db_x10) / 200.0);
  std::mt19937_64 g(seed);
  std::normal_distribution<double> gauss(0.0, sigma / std::sqrt(2.0));

  Rng rng(seed ^ 0xc4e57ull);
  flat_grid grid(nsymb, nsubc);
  dmrs_symbol_list pilots({npil, ndmrs, 1});
  std::vector<cf_t> rx_out(size_t(ndmrs) * npil);
  std::vector<cf_t> pil_out(size_t(ndmrs) * npil);
  for (unsigned d = 0; d != ndmrs; ++d) {
    span<cf_t> prow = pilots.get_symbol(d, 0);
    unsigned l = dsyms[d];
    double rot_w = 2.0 * M_PI * double(cfo_hz) * t_sym[l];
    cf_t rot = cf_t(float(std::cos(rot_w)), float(std::sin(rot_w)));
    for (unsigned i = 0; i != npil; ++i) {
      float pr = rng.bit() ? -float(M_SQRT1_2) : float(M_SQRT1_2);
      float pi_ = rng.bit() ? -float(M_SQRT1_2) : float(M_SQRT1_2);
      cf_t p = cf_t(pr, pi_);
      prow[i] = p;
      unsigned k = 2 * i;  // type-1 comb: even subcarriers
      cf_t y = h_true[k] * rot * p
             + cf_t(float(gauss(g)), float(gauss(g)));
      y = to_cf(to_cbf16(y));  // grid storage quantization
      grid.row(l)[k] = y;
      rx_out[size_t(d) * npil + i] = y;
      pil_out[size_t(d) * npil + i] = p;
    }
  }

  port_channel_estimator::configuration cfg;
  cfg.scs = subcarrier_spacing::kHz15;
  cfg.cp = cyclic_prefix::NORMAL;
  cfg.first_symbol = 0;
  cfg.nof_symbols = nsymb;
  port_channel_estimator::layer_dmrs_pattern pat;
  pat.symbols.resize(nsymb);
  for (unsigned l : dsyms) {
    pat.symbols.set(l);
  }
  pat.rb_mask.resize(nprb);
  pat.rb_mask.fill(0, nprb, true);
  pat.re_pattern.resize(12);
  for (unsigned k = 0; k != 12; k += 2) {
    pat.re_pattern.set(k);
  }
  cfg.dmrs_pattern.push_back(pat);
  cfg.rx_ports.push_back(0);
  cfg.scaling = 1.0f;

  dft_processor::configuration ta_dft_cfg = {
      time_alignment_estimator_dft_impl::dft_size,
      dft_processor::direction::INVERSE};
  port_channel_estimator_average_impl est(
      std::make_unique<interpolator_linear_impl>(),
      std::make_unique<time_alignment_estimator_dft_impl>(
          std::make_unique<dft_processor_generic_impl>(ta_dft_cfg)),
      static_cast<port_channel_estimator_fd_smoothing_strategy>(smoothing),
      /*compensate_cfo=*/true);

  channel_estimate ce({nprb, nsymb, 1, 1});
  est.compute(ce, grid, 0, pilots, cfg);

  std::vector<cf_t> h_est(size_t(nsymb) * nsubc);
  for (unsigned l = 0; l != nsymb; ++l) {
    auto row = ce.get_symbol_ch_estimate(l, 0, 0);
    for (unsigned k = 0; k != nsubc; ++k) {
      h_est[size_t(l) * nsubc + k] = to_cf(row[k]);
    }
  }

  float metrics[6];
  metrics[0] = ce.get_noise_variance(0);
  metrics[1] = ce.get_rsrp(0);
  metrics[2] = ce.get_epre(0);
  metrics[3] = ce.get_snr(0);
  metrics[4] = float(ce.get_time_alignment(0).to_seconds());
  auto cfo_opt = ce.get_cfo_Hz(0);
  metrics[5] = cfo_opt.has_value() ? *cfo_opt : NAN;

  uint32_t hdr[3] = {nsubc, npil, ndmrs};
  write_bytes(hdr, sizeof(hdr));
  write_bytes(h_true.data(), nsubc * sizeof(cf_t));
  write_bytes(pil_out.data(), pil_out.size() * sizeof(cf_t));
  write_bytes(rx_out.data(), rx_out.size() * sizeof(cf_t));
  write_bytes(h_est.data(), h_est.size() * sizeof(cf_t));
  write_bytes(metrics, sizeof(metrics));
  // Symbol times for the Python side's CFO machinery (float64).
  write_bytes(t_sym.data(), nsymb * sizeof(double));
  return 0;
}

// PRACH frequency-domain preamble y_{u,v} (prach_generator_impl.cpp:
// logical-root table walk + N_cs/restricted cyclic shifts + ZC DFT).
int cmd_prachgen(unsigned is_long, unsigned root_idx, unsigned preamble,
                 unsigned zcz, unsigned restricted)
{
  prach_generator_impl gen;
  prach_generator::configuration cfg;
  cfg.format = is_long ? prach_format_type::zero : prach_format_type::B4;
  cfg.root_sequence_index = root_idx;
  cfg.preamble_index = preamble;
  cfg.restricted_set = static_cast<restricted_set_config>(restricted);
  cfg.zero_correlation_zone = zcz;
  auto seq = gen.generate(cfg);
  uint32_t n = seq.size();
  write_bytes(&n, 4);
  write_bytes(seq.data(), seq.size() * sizeof(cf_t));
  return 0;
}

// Reference-side throughput baselines for the v2 kernels on this host
// (the counterpart of tests/benchmarks/phy/*_benchmark.cpp lines; consumed
// by BASELINE.md as CPU denominators).
int cmd_bench_kernels(unsigned iters)
{
  std::mt19937_64 g(1);
  std::normal_distribution<float> gauss(0.0f, 0.5f);
  // Soft demapper, 64QAM.
  {
    unsigned nsym = 14336;
    std::vector<cf_t> syms(nsym);
    std::vector<float> nv(nsym, 0.05f);
    for (auto& v : syms) v = cf_t(gauss(g), gauss(g));
    std::vector<log_likelihood_ratio> llrs(nsym * 6);
    demodulation_mapper_impl dem;
    auto t0 = std::chrono::steady_clock::now();
    for (unsigned i = 0; i != iters; ++i) {
      dem.demodulate_soft(span<log_likelihood_ratio>(llrs),
                          span<const cf_t>(syms), span<const float>(nv),
                          modulation_scheme::QAM64);
      syms[0] += cf_t(1e-9f, 0);
    }
    double dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    std::fprintf(stderr, "bench demap64 (AVX2): %.1f Msymb/s/core\n",
                 double(nsym) * iters / dt / 1e6);
  }
  // Modulation mapper, 64QAM.
  {
    unsigned nsym = 14336;
    dynamic_bit_buffer bits(nsym * 6);
    for (unsigned i = 0; i != nsym * 6 / 8; ++i) {
      bits.set_byte(uint8_t(g()), i);
    }
    std::vector<cf_t> syms(nsym);
    modulation_mapper_lut_impl mm;
    auto t0 = std::chrono::steady_clock::now();
    for (unsigned i = 0; i != iters; ++i) {
      mm.modulate(span<cf_t>(syms), bits, modulation_scheme::QAM64);
    }
    double dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    std::fprintf(stderr, "bench modmap64 (LUT): %.1f Msymb/s/core\n",
                 double(nsym) * iters / dt / 1e6);
  }
  // MMSE equalizer 1x2.
  {
    unsigned nre = 14336, nports = 2;
    channel_equalizer_generic_impl eq(
        channel_equalizer_algorithm_type::mmse);
    dynamic_re_buffer<cbf16_t> y(nports, nre);
    modular_ch_est_list<16> ests(nports, 1);
    ests.resize(nre, nports, 1);
    std::vector<cbf16_t> est_store(size_t(nports) * nre);
    std::vector<float> pnv(nports, 0.05f);
    for (unsigned p = 0; p != nports; ++p) {
      auto row = y.get_slice(p);
      for (unsigned i = 0; i != nre; ++i) {
        row[i] = to_cbf16(cf_t(gauss(g), gauss(g)));
        est_store[size_t(p) * nre + i] = to_cbf16(cf_t(gauss(g), gauss(g)));
      }
      ests.set_channel(span<const cbf16_t>(&est_store[size_t(p) * nre], nre),
                       p, 0);
    }
    std::vector<cf_t> xhat(nre);
    std::vector<float> nvo(nre);
    auto t0 = std::chrono::steady_clock::now();
    for (unsigned i = 0; i != iters; ++i) {
      eq.equalize(span<cf_t>(xhat), span<float>(nvo), y, ests,
                  span<const float>(pnv), 1.0f);
    }
    double dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    std::fprintf(stderr, "bench eq_mmse_1x2 (AVX2): %.1f MRE/s/core\n",
                 double(nre) * iters / dt / 1e6);
  }
  // OFH BFP compression, 9-bit.
  {
    auto& logger = srslog::fetch_basic_logger("B");
    ofh::iq_compression_bfp_impl comp(logger, 1.0f);
    ofh::ru_compression_params params;
    params.type = ofh::compression_type::BFP;
    params.data_width = 9;
    unsigned nprb = 273;  // compress() caps at MAX_NOF_PRBS per call
    std::vector<cbf16_t> in(nprb * 12);
    for (auto& v : in) v = to_cbf16(cf_t(gauss(g), gauss(g)));
    std::vector<ofh::compressed_prb> prbs(nprb);
    auto t0 = std::chrono::steady_clock::now();
    for (unsigned i = 0; i != iters; ++i) {
      comp.compress(span<ofh::compressed_prb>(prbs),
                    span<const cbf16_t>(in), params);
    }
    double dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    std::fprintf(stderr, "bench ofh_bfp9 compress: %.1f Msamp/s/core\n",
                 double(nprb) * 12 * iters / dt / 1e6);
  }
  return 0;
}

// O-RAN U-Plane eCPRI frame (static-compression builder + eCPRI IQ-data
// header) for one DL symbol: emits the input IQ (cbf16->f32) and the
// complete wire frame for byte-exact comparison with native/ofh.
int cmd_ouplane(unsigned nprb, unsigned width, unsigned pc_id, unsigned seq,
                unsigned sfn, unsigned subframe, unsigned slot,
                unsigned symbol, uint64_t seed)
{
  auto& logger = srslog::fetch_basic_logger("OFHU");
  float iq_scaling = 1.0f;
  ofh::iq_compression_bfp_impl comp(logger, iq_scaling);
  ofh::ofh_uplane_message_builder_static_compression_impl builder(logger,
                                                                  comp);
  ecpri::packet_builder_impl ecpri_builder;

  std::mt19937_64 g(seed);
  std::uniform_real_distribution<float> uni(-1.0f, 1.0f);
  unsigned nsamp = nprb * 12;
  std::vector<cbf16_t> iq(nsamp);
  std::vector<cf_t> iq_f32(nsamp);
  for (unsigned i = 0; i != nsamp; ++i) {
    cf_t v = cf_t(uni(g), uni(g));
    iq[i] = to_cbf16(v);
    iq_f32[i] = to_cf(iq[i]);
  }

  ofh::uplane_message_params params;
  params.direction = ofh::data_direction::downlink;
  params.slot = slot_point(0, sfn % 1024, subframe);  // mu=0: slot==subframe
  params.filter_index = ofh::filter_index_type::standard_channel_filter;
  params.start_prb = 0;
  params.nof_prb = nprb;
  params.symbol_id = symbol;
  params.sect_type = ofh::section_type::type_1;
  params.compression_params.type = ofh::compression_type::BFP;
  params.compression_params.data_width = width;
  (void)slot;

  std::vector<uint8_t> frame(9000, 0);
  unsigned ecpri_hdr = 8;  // common header + PC_ID + SEQ_ID
  unsigned len = builder.build_message(
      span<uint8_t>(frame.data() + ecpri_hdr, frame.size() - ecpri_hdr),
      span<const cbf16_t>(iq), params);
  ecpri::iq_data_parameters ecpri_params;
  ecpri_params.pc_id = uint16_t(pc_id);
  ecpri_params.seq_id = uint16_t(seq);
  ecpri_builder.build_data_packet(
      span<uint8_t>(frame.data(), ecpri_hdr + len), ecpri_params);

  uint32_t total = ecpri_hdr + len;
  write_bytes(&total, 4);
  write_bytes(iq_f32.data(), nsamp * sizeof(cf_t));
  write_bytes(frame.data(), total);
  return 0;
}

// VLAN Ethernet frame serdes (vlan_ethernet_frame_builder_impl +
// vlan_ethernet_frame_decoder_impl): builds the tagged header around a
// random payload (padded to the 64-byte minimum like ethernet_frame_pool),
// then runs the reference decoder on the NIC-stripped form.  Emits the MACs,
// the tagged frame, and the decoder's parsed eth_type + payload span so the
// Python side can compare both directions byte-exactly.
int cmd_oeth(unsigned tci, unsigned eth_type, unsigned payload_len,
             uint64_t seed)
{
  ether::vlan_frame_builder_impl builder;
  auto& logger = srslog::fetch_basic_logger("ETH");
  ether::vlan_frame_decoder_impl decoder(logger);

  std::mt19937_64 g(seed);
  ether::vlan_frame_params params;
  for (unsigned i = 0; i != 6; ++i) {
    params.mac_dst_address[i] = uint8_t(g());
    params.mac_src_address[i] = uint8_t(g());
  }
  params.tci = uint16_t(tci);
  params.eth_type = uint16_t(eth_type);

  unsigned hdr = builder.get_header_size().value();
  std::vector<uint8_t> frame(hdr + payload_len, 0);
  builder.build_vlan_frame(span<uint8_t>(frame), params);
  for (unsigned i = 0; i != payload_len; ++i) {
    frame[hdr + i] = uint8_t(g());
  }
  if (frame.size() < 64) {
    frame.resize(64, 0);  // ethernet_frame_pool minimum-length padding
  }

  // NIC-stripped form (VLAN tag removed) for the reference decoder.
  std::vector<uint8_t> stripped(frame.begin(), frame.begin() + 12);
  stripped.insert(stripped.end(), frame.begin() + 16, frame.end());
  ether::vlan_frame_params parsed;
  span<const uint8_t> rest =
      decoder.decode(span<const uint8_t>(stripped), parsed);

  write_bytes(params.mac_dst_address.data(), 6);
  write_bytes(params.mac_src_address.data(), 6);
  uint32_t flen = uint32_t(frame.size());
  write_bytes(&flen, 4);
  write_bytes(frame.data(), frame.size());
  uint32_t ptype = parsed.eth_type;
  uint32_t rlen = uint32_t(rest.size());
  write_bytes(&ptype, 4);
  write_bytes(&rlen, 4);
  write_bytes(rest.data(), rest.size());
  return 0;
}

// Recording sink for the UL-SCH demultiplexer's three output streams.
class record_buffer : public pusch_decoder_buffer {
public:
  std::vector<log_likelihood_ratio> data;
  std::vector<log_likelihood_ratio> scratch;
  span<log_likelihood_ratio> get_next_block_view(unsigned n) override
  {
    scratch.resize(n);
    return span<log_likelihood_ratio>(scratch);
  }
  void on_new_softbits(span<const log_likelihood_ratio> s) override
  {
    data.insert(data.end(), s.begin(), s.end());
  }
  void on_end_softbits() override {}
};

// UL-SCH demultiplex (TS 38.212 6.2.7, ulsch_demultiplex_impl.cpp): feed a
// synthetic LLR codeword whose value ENCODES its stream position (i mod
// 2000 - 1000 clipped to int8 via a deterministic map), emit the three
// output streams so the Python side can recover the exact placement.
int cmd_ulschdemux(unsigned nprb, unsigned nsym, unsigned qm, unsigned oack,
                   unsigned gack, unsigned ocsi, unsigned gcsi,
                   unsigned grvd, unsigned mode, unsigned ocsi2 = 0,
                   unsigned gcsi2 = 0)
{
  ulsch_demultiplex_impl demux;
  ulsch_demultiplex::configuration cfg;
  cfg.modulation = to_mod(qm);
  cfg.nof_layers = 1;
  cfg.nof_prb = nprb;
  cfg.start_symbol_index = 0;
  cfg.nof_symbols = nsym;
  cfg.nof_harq_ack_rvd = grvd;
  cfg.dmrs = dmrs_type::TYPE1;
  cfg.dmrs_symbol_mask = symbol_slot_mask(14);
  cfg.dmrs_symbol_mask.set(2);
  if (nsym > 11) {
    cfg.dmrs_symbol_mask.set(11);
  }
  cfg.nof_cdm_groups_without_data = 2;
  cfg.nof_harq_ack_bits = oack;
  cfg.nof_enc_harq_ack_bits = gack;
  cfg.nof_csi_part1_bits = ocsi;
  cfg.nof_enc_csi_part1_bits = gcsi;

  record_buffer sch, ack, csi, csi2;
  pusch_codeword_buffer& in = demux.demultiplex(sch, ack, csi, cfg);
  if (gcsi2 > 0) {
    // CSI Part 2 registers after demultiplex() (in the real flow its size
    // comes from decoding CSI Part 1 first).
    demux.set_csi_part2(csi2, ocsi2, gcsi2);
  }

  // Number of data REs: type-1 DM-RS with 2 CDM groups -> DM-RS symbols
  // carry no data.
  unsigned ndmrs = cfg.dmrs_symbol_mask.count();
  unsigned g_total = (nsym - ndmrs) * nprb * 12 * qm;
  // Position-encoding LLRs: three digit planes (mode 0/1/2 = base-100
  // digits of the stream index i) let the Python side reconstruct the
  // exact source position of every output softbit from three runs.
  std::vector<log_likelihood_ratio> cw(g_total);
  for (unsigned i = 0; i != g_total; ++i) {
    unsigned digit = (mode == 0) ? (i % 100)
                   : (mode == 1) ? ((i / 100) % 100)
                                 : ((i / 10000) % 100);
    cw[i] = int8_t(int(digit) - 50);
  }
  // Zero scrambling sequence (placeholder handling multiplies by +1).
  dynamic_bit_buffer seq(g_total);
  for (unsigned i = 0; i != (g_total + 7) / 8; ++i) {
    seq.set_byte(0, i);
  }
  in.on_new_block(span<const log_likelihood_ratio>(cw), seq);
  in.on_end_codeword();

  uint32_t hdr[5] = {g_total, uint32_t(sch.data.size()),
                     uint32_t(ack.data.size()), uint32_t(csi.data.size()),
                     uint32_t(csi2.data.size())};
  write_bytes(hdr, sizeof(hdr));
  std::vector<int8_t> tmp;
  for (auto* rb : {&sch, &ack, &csi, &csi2}) {
    tmp.assign(rb->data.size(), 0);
    for (size_t i = 0; i != rb->data.size(); ++i) {
      tmp[i] = rb->data[i].to_int();
    }
    write_bytes(tmp.data(), tmp.size());
  }
  return 0;
}

// Complete SS/PBCH block on a local 4 x 240 grid: PSS + SSS + PBCH
// (payload interleave, 1st scrambling, CRC24C, polar, rate match, 2nd
// scrambling, QPSK, mapping) + PBCH DM-RS — the reference's full SSB TX.
int cmd_ssbgrid(unsigned pci, unsigned ssb_idx, unsigned lmax, unsigned hrf,
                unsigned sfn, unsigned kssb, uint64_t seed)
{
  pbch_encoder_impl enc(
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24C),
      std::make_unique<pseudo_random_generator_impl>(),
      std::make_unique<polar_interleaver_impl>(),
      std::make_unique<polar_allocator_impl>(),
      std::make_unique<polar_code_impl>(),
      std::make_unique<polar_encoder_impl>(),
      std::make_unique<polar_rate_matcher_impl>());
  pbch_modulator_impl mod(std::make_unique<modulation_mapper_lut_impl>(),
                          std::make_unique<pseudo_random_generator_impl>());
  pss_processor_impl pss;
  sss_processor_impl sss;
  dmrs_pbch_processor_impl dmrs(
      std::make_unique<pseudo_random_generator_impl>());

  Rng rng(seed);
  pbch_encoder::pbch_msg_t msg = {};
  msg.N_id = pci;
  msg.ssb_idx = ssb_idx;
  msg.L_max = lmax;
  msg.hrf = hrf != 0;
  msg.sfn = sfn;
  msg.k_ssb = kssb;
  for (unsigned i = 0; i != 24; ++i) {
    msg.payload[i] = rng.bit();
  }
  std::vector<uint8_t> encoded(pbch_encoder::E, 0);
  enc.encode(span<uint8_t>(encoded), msg);

  flat_grid grid(4, 240);
  pss_processor::config_t pcfg;
  pcfg.phys_cell_id = pci;
  pcfg.ssb_first_subcarrier = 0;
  pcfg.ssb_first_symbol = 0;
  pcfg.amplitude = 1.0f;
  pcfg.ports.push_back(0);
  pss.map(grid, pcfg);
  sss_processor::config_t scfg;
  scfg.phys_cell_id = pci;
  scfg.ssb_first_subcarrier = 0;
  scfg.ssb_first_symbol = 0;
  scfg.amplitude = 1.0f;
  scfg.ports.push_back(0);
  sss.map(grid, scfg);
  pbch_modulator::config_t mcfg;
  mcfg.phys_cell_id = pci;
  mcfg.ssb_idx = ssb_idx;
  mcfg.ssb_first_subcarrier = 0;
  mcfg.ssb_first_symbol = 0;
  mcfg.amplitude = 1.0f;
  mcfg.ports.push_back(0);
  mod.put(span<const uint8_t>(encoded), grid, mcfg);
  dmrs_pbch_processor::config_t dcfg;
  dcfg.phys_cell_id = pci;
  dcfg.ssb_idx = ssb_idx;
  dcfg.L_max = lmax;
  dcfg.ssb_first_subcarrier = 0;
  dcfg.ssb_first_symbol = 0;
  dcfg.hrf = hrf != 0;
  dcfg.amplitude = 1.0f;
  dcfg.ports.push_back(0);
  dmrs.map(grid, dcfg);

  std::vector<uint8_t> payload(24);
  {
    Rng rng2(seed);
    for (unsigned i = 0; i != 24; ++i) {
      payload[i] = rng2.bit();
    }
  }
  write_bytes(payload.data(), 24);
  write_bytes(encoded.data(), encoded.size());
  std::vector<cf_t> out(4 * 240);
  for (unsigned l = 0; l != 4; ++l) {
    std::memcpy(&out[l * 240], grid.row(l), 240 * sizeof(cf_t));
  }
  write_bytes(out.data(), out.size() * sizeof(cf_t));
  return 0;
}

// PDCCH encoder (CRC24C w/ ones prefix + RNTI mask, DCI polar chain).
int cmd_pdcchenc(unsigned a_bits, unsigned e, unsigned rnti, unsigned nmsg,
                 uint64_t seed)
{
  pdcch_encoder_impl enc(
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24C),
      std::make_unique<polar_interleaver_impl>(),
      std::make_unique<polar_allocator_impl>(),
      std::make_unique<polar_code_impl>(),
      std::make_unique<polar_encoder_impl>(),
      std::make_unique<polar_rate_matcher_impl>());
  Rng rng(seed);
  std::vector<uint8_t> data(a_bits), encoded(e);
  pdcch_encoder::config_t cfg;
  cfg.E = e;
  cfg.rnti = rnti;
  for (unsigned m = 0; m != nmsg; ++m) {
    for (auto& b : data) {
      b = rng.bit();
    }
    enc.encode(span<uint8_t>(encoded), span<const uint8_t>(data), cfg);
    write_bytes(data.data(), data.size());
    write_bytes(encoded.data(), encoded.size());
  }
  return 0;
}

class null_pdsch_notifier : public pdsch_processor_notifier {
public:
  void on_finish_processing() override {}
};

// Full PDSCH processor (segment+CRC -> LDPC -> rate match -> scramble ->
// QAM -> RG map + DM-RS) onto a one-port grid: the reference's complete DL
// shared-channel transmit for one PDU.
int cmd_pdschproc(unsigned bwp_rb, unsigned alloc_rb, unsigned qm,
                  unsigned rv, unsigned tbs_bytes, unsigned rnti,
                  unsigned nid, uint64_t seed)
{
  ldpc_segmenter_impl::sch_crc crcs{
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC16),
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24A),
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24B)};
  auto seg = ldpc_segmenter_impl::create_ldpc_segmenter_impl_tx(crcs);
  auto enc = std::make_unique<pdsch_encoder_impl>(
      std::move(seg), std::make_unique<ldpc_encoder_generic>(),
      std::make_unique<ldpc_rate_matcher_impl>());
  auto mod = std::make_unique<pdsch_modulator_impl>(
      std::make_unique<modulation_mapper_lut_impl>(),
      std::make_unique<pseudo_random_generator_impl>());
  auto dmrs = std::make_unique<dmrs_pdsch_processor_impl>(
      std::make_unique<pseudo_random_generator_impl>());
  pdsch_processor_impl proc(std::move(enc), std::move(mod), std::move(dmrs));

  unsigned nsubc = bwp_rb * 12;
  flat_grid grid(14, nsubc);
  resource_grid_mapper_impl mapper(1, nsubc, grid,
                                   std::make_unique<channel_precoder_generic>());

  Rng rng(seed);
  std::vector<uint8_t> data(tbs_bytes);
  for (auto& b : data) {
    b = rng.byte();
  }

  pdsch_processor::pdu_t pdu = {};
  pdu.slot = slot_point(0, 0, 0);
  pdu.rnti = uint16_t(rnti);
  pdu.bwp_size_rb = bwp_rb;
  pdu.bwp_start_rb = 0;
  pdu.cp = cyclic_prefix::NORMAL;
  pdsch_processor::codeword_description cw;
  cw.modulation = to_mod(qm);
  cw.rv = rv;
  pdu.codewords.push_back(cw);
  pdu.n_id = nid;
  pdu.ref_point = pdsch_processor::pdu_t::CRB0;
  pdu.dmrs_symbol_mask = symbol_slot_mask(14);
  pdu.dmrs_symbol_mask.set(2);
  pdu.dmrs_symbol_mask.set(7);
  pdu.dmrs_symbol_mask.set(11);
  pdu.dmrs = dmrs_type::TYPE1;
  pdu.scrambling_id = nid;
  pdu.n_scid = false;
  pdu.nof_cdm_groups_without_data = 2;
  pdu.freq_alloc = rb_allocation::make_type1(0, alloc_rb);
  pdu.start_symbol_index = 2;
  pdu.nof_symbols = 12;
  // Base graph like TS 38.212 7.2.2 at the resulting code rate.
  unsigned tbs_bits = tbs_bytes * 8;
  pdu.ldpc_base_graph = (tbs_bits <= 292 ||
                         (tbs_bits <= 3824))  // small TBs in these tests
                            ? ldpc_base_graph_type::BG2
                            : ldpc_base_graph_type::BG1;
  if (tbs_bits > 3824) {
    pdu.ldpc_base_graph = ldpc_base_graph_type::BG1;
  }
  pdu.tbs_lbrm = tbs_lbrm_default;
  pdu.ratio_pdsch_dmrs_to_sss_dB = 0.0f;
  pdu.ratio_pdsch_data_to_sss_dB = 0.0f;
  pdu.precoding = precoding_configuration::make_wideband(make_single_port());

  null_pdsch_notifier notifier;
  static_vector<span<const uint8_t>, pdsch_processor::MAX_NOF_TRANSPORT_BLOCKS>
      data_list;
  data_list.push_back(span<const uint8_t>(data));
  proc.process(mapper, notifier, data_list, pdu);

  uint32_t hdr[2] = {nsubc, tbs_bytes};
  write_bytes(hdr, sizeof(hdr));
  write_bytes(data.data(), data.size());
  std::vector<cf_t> out(size_t(14) * nsubc);
  for (unsigned l = 0; l != 14; ++l) {
    std::memcpy(&out[size_t(l) * nsubc], grid.row(l), nsubc * sizeof(cf_t));
  }
  write_bytes(out.data(), out.size() * sizeof(cf_t));
  return 0;
}

// Minimal in-harness HARQ rx buffer (the reference pool hands out zeroed
// reservations).
class simple_rx_buffer : public unique_rx_buffer::callback {
public:
  explicit simple_rx_buffer(unsigned nof_cb)
      : nof_cb_(nof_cb), crc_(new bool[nof_cb]()), soft_(nof_cb),
        data_(nof_cb) {}
  unsigned get_nof_codeblocks() const override { return nof_cb_; }
  void reset_codeblocks_crc() override
  {
    std::fill(crc_.get(), crc_.get() + nof_cb_, false);
  }
  span<bool> get_codeblocks_crc() override
  {
    return span<bool>(crc_.get(), nof_cb_);
  }
  unsigned get_absolute_codeblock_id(unsigned id) const override
  {
    return id;
  }
  span<log_likelihood_ratio> get_codeblock_soft_bits(unsigned id,
                                                     unsigned size) override
  {
    if (id == 0) {
      debug_cb0_size = std::max(debug_cb0_size, size);
    }
    // Persistent storage across calls (the decoder re-fetches views with
    // varying sizes): grow-only, never clobber.
    if (soft_[id].size() < size) {
      soft_[id].resize(size, 0);
    }
    return span<log_likelihood_ratio>(soft_[id].data(), size);
  }
  unsigned debug_cb0_size = 0;
  bit_buffer get_codeblock_data_bits(unsigned id, unsigned size) override
  {
    // The decoder re-fetches this view when assembling the TB — the
    // storage must persist across calls (grow-only).
    if (!data_[id] || data_[id]->size() < size) {
      data_[id] = std::make_unique<dynamic_bit_buffer>(
          std::max(size, 8u * 16384u));
    }
    return data_[id]->first(size);
  }
  void lock() override {}
  void unlock() override {}
  void release() override {}

private:
  unsigned nof_cb_;
  std::unique_ptr<bool[]> crc_;
  std::vector<std::vector<log_likelihood_ratio>> soft_;
  std::vector<std::unique_ptr<dynamic_bit_buffer>> data_;
};

class capture_pusch_notifier : public pusch_processor_result_notifier {
public:
  void on_uci(const pusch_processor_result_control& uci) override
  {
    auto grab = [](const pusch_uci_field& f, std::vector<uint8_t>& out,
                   uint8_t& valid) {
      valid = f.status == uci_status::valid ? 1 : 0;
      out.resize(f.payload.size());
      for (unsigned i = 0; i != f.payload.size(); ++i) {
        out[i] = f.payload.test(i) ? 1 : 0;
      }
    };
    grab(uci.harq_ack, ack_bits, ack_valid);
    grab(uci.csi_part1, csi1_bits, csi1_valid);
    grab(uci.csi_part2, csi2_bits, csi2_valid);
    got_uci = true;
  }
  void on_sch(const pusch_processor_result_data& sch) override
  {
    ok = sch.data.tb_crc_ok;
    sinr_dB = sch.csi.get_sinr_dB().value_or(NAN);
    got = true;
  }
  bool got = false;
  bool ok = false;
  bool got_uci = false;
  uint8_t ack_valid = 0, csi1_valid = 0, csi2_valid = 0;
  std::vector<uint8_t> ack_bits, csi1_bits, csi2_bits;
  float sinr_dB = NAN;
};

// Recording pusch_codeword_buffer: captures the demodulated codeword LLR
// stream (post descramble) for stage-level debugging.
class record_codeword_buffer : public pusch_codeword_buffer {
public:
  std::vector<log_likelihood_ratio> data;
  std::vector<log_likelihood_ratio> scratch;
  span<log_likelihood_ratio> get_next_block_view(unsigned n) override
  {
    scratch.resize(n);
    return span<log_likelihood_ratio>(scratch);
  }
  void on_new_block(span<const log_likelihood_ratio> d,
                    const bit_buffer&) override
  {
    data.insert(data.end(), d.begin(), d.end());
  }
  void on_end_codeword() override {}
};

// Probe: estimator + demodulator only — dumps the descrambled codeword LLR
// stream from a grid on stdin.
int cmd_puschdemod(unsigned nprb, unsigned qm, unsigned rnti, unsigned nid,
                   unsigned dmrs3)
{
  unsigned nsubc = nprb * 12;
  flat_grid grid(14, nsubc);
  {
    std::vector<cf_t> buf(size_t(14) * nsubc);
    if (std::fread(buf.data(), sizeof(cf_t), buf.size(), stdin)
        != buf.size()) {
      return 3;
    }
    for (unsigned l = 0; l != 14; ++l) {
      std::memcpy(grid.row(l), &buf[size_t(l) * nsubc],
                  nsubc * sizeof(cf_t));
    }
  }
  dmrs_pusch_estimator_impl estimator(
      std::make_unique<pseudo_random_generator_impl>(),
      std::make_unique<port_channel_estimator_average_impl>(
          std::make_unique<interpolator_linear_impl>(),
          std::make_unique<time_alignment_estimator_dft_impl>(
              std::make_unique<dft_processor_generic_impl>(
                  dft_processor::configuration{
                      time_alignment_estimator_dft_impl::dft_size,
                      dft_processor::direction::INVERSE})),
          port_channel_estimator_fd_smoothing_strategy::filter, true));
  pusch_demodulator_impl demod(
      std::make_unique<channel_equalizer_generic_impl>(
          channel_equalizer_algorithm_type::mmse),
      nullptr, std::make_unique<demodulation_mapper_impl>(), nullptr,
      std::make_unique<pseudo_random_generator_impl>(), nprb, false);

  dmrs_pusch_estimator::configuration est_cfg;
  est_cfg.slot = slot_point(0, 0, 0);
  est_cfg.type = dmrs_type::TYPE1;
  est_cfg.scrambling_id = nid;
  est_cfg.n_scid = false;
  est_cfg.scaling = 1.0f;
  est_cfg.c_prefix = cyclic_prefix::NORMAL;
  est_cfg.symbols_mask = bounded_bitset<MAX_NSYMB_PER_SLOT>(14);
  est_cfg.symbols_mask.set(2);
  if (dmrs3) {
    est_cfg.symbols_mask.set(7);
  }
  est_cfg.symbols_mask.set(11);
  est_cfg.rb_mask = bounded_bitset<MAX_RB>(nprb);
  est_cfg.rb_mask.fill(0, nprb, true);
  est_cfg.first_symbol = 2;
  est_cfg.nof_symbols = 12;
  est_cfg.nof_tx_layers = 1;
  est_cfg.rx_ports.push_back(0);

  channel_estimate::channel_estimate_dimensions dims;
  dims.nof_prb = nprb;
  dims.nof_symbols = 14;
  dims.nof_rx_ports = 1;
  dims.nof_tx_layers = 1;
  channel_estimate ce(dims);
  estimator.estimate(ce, grid, est_cfg);

  pusch_demodulator::configuration cfg;
  cfg.rnti = rnti;
  cfg.rb_mask = bounded_bitset<MAX_RB>(nprb);
  cfg.rb_mask.fill(0, nprb, true);
  cfg.modulation = to_mod(qm);
  cfg.start_symbol_index = 2;
  cfg.nof_symbols = 12;
  cfg.dmrs_symb_pos = est_cfg.symbols_mask;
  cfg.dmrs_config_type = dmrs_type::TYPE1;
  cfg.nof_cdm_groups_without_data = 2;
  cfg.n_id = nid;
  cfg.nof_tx_layers = 1;
  cfg.enable_transform_precoding = false;
  cfg.rx_ports.push_back(0);

  class null_demod_notifier : public pusch_demodulator_notifier {
  public:
    void on_provisional_stats(const demodulation_stats&) override {}
    void on_end_stats(const demodulation_stats&) override {}
  } dn;

  // Route through the UL-SCH demultiplexer exactly like the processor does.
  ulsch_demultiplex_impl demux;
  ulsch_demultiplex::configuration dcfg;
  dcfg.modulation = to_mod(qm);
  dcfg.nof_layers = 1;
  dcfg.nof_prb = nprb;
  dcfg.start_symbol_index = 2;
  dcfg.nof_symbols = 12;
  dcfg.nof_harq_ack_rvd = 12;
  dcfg.dmrs = dmrs_type::TYPE1;
  dcfg.dmrs_symbol_mask = est_cfg.symbols_mask;
  dcfg.nof_cdm_groups_without_data = 2;
  dcfg.nof_harq_ack_bits = 0;
  dcfg.nof_enc_harq_ack_bits = 0;
  dcfg.nof_csi_part1_bits = 0;
  dcfg.nof_enc_csi_part1_bits = 0;
  // Print the processor-derived UL-SCH info for this configuration.
  {
    ulsch_configuration ucfg = {};
    ucfg.tbs = units::bits(8000);
    ucfg.mcs_descr.modulation = to_mod(qm);
    ucfg.mcs_descr.target_code_rate = 0.5f;
    ucfg.nof_harq_ack_bits = units::bits(0);
    ucfg.nof_csi_part1_bits = units::bits(0);
    ucfg.nof_csi_part2_bits = units::bits(0);
    ucfg.alpha_scaling = 1.0f;
    ucfg.beta_offset_harq_ack = 1.0f;
    ucfg.beta_offset_csi_part1 = 1.0f;
    ucfg.beta_offset_csi_part2 = 1.0f;
    ucfg.nof_rb = nprb;
    ucfg.start_symbol_index = 2;
    ucfg.nof_symbols = 12;
    ucfg.dmrs_type = dmrs_config_type::type1;
    ucfg.dmrs_symbol_mask = est_cfg.symbols_mask;
    ucfg.nof_cdm_groups_without_data = 2;
    ucfg.nof_layers = 1;
    ulsch_information info = get_ulsch_information(ucfg);
    std::fprintf(stderr,
                 "ulsch_info: ul_sch_bits=%llu harq_rvd=%llu dmrs_re?=.. \n",
                 (unsigned long long)info.nof_ul_sch_bits.value(),
                 (unsigned long long)info.nof_harq_ack_rvd.value());
  }
  record_buffer sch, ack, csi;
  pusch_codeword_buffer& cwb = demux.demultiplex(sch, ack, csi, dcfg);
  demod.demodulate(cwb, dn, grid, ce, cfg);

  uint32_t n = sch.data.size();
  write_bytes(&n, 4);
  std::vector<int8_t> d(n);
  for (unsigned i = 0; i != n; ++i) {
    d[i] = sch.data[i].to_int();
  }
  write_bytes(d.data(), n);
  return 0;
}

class capture_decoder_notifier : public pusch_decoder_notifier {
public:
  void on_sch_data(const pusch_decoder_result& r) override
  {
    ok = r.tb_crc_ok;
    got = true;
  }
  bool got = false, ok = false;
};

// Probe: the reference pusch_decoder alone — codeword LLR stream on stdin.
int cmd_puschdec(unsigned nprb, unsigned qm, unsigned rv,
                 unsigned tbs_bytes, unsigned e_total)
{
  std::vector<log_likelihood_ratio> stream(e_total);
  {
    std::vector<int8_t> raw(e_total);
    if (std::fread(raw.data(), 1, e_total, stdin) != e_total) {
      return 3;
    }
    for (unsigned i = 0; i != e_total; ++i) {
      stream[i] = raw[i];
    }
  }
  pusch_codeblock_decoder::sch_crc cb_crcs{
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC16),
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24A),
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24B)};
  std::vector<std::unique_ptr<pusch_codeblock_decoder>> cb_decoders;
  cb_decoders.push_back(std::make_unique<pusch_codeblock_decoder>(
      std::unique_ptr<ldpc_rate_dematcher>(
          std::make_unique<ldpc_rate_dematcher_impl>()),
      std::unique_ptr<ldpc_decoder>(std::make_unique<ldpc_decoder_generic>()),
      cb_crcs));
  auto decoder_pool =
      std::make_shared<pusch_decoder_impl::codeblock_decoder_pool>(
          std::move(cb_decoders));
  pusch_decoder_impl decoder(
      ldpc_segmenter_impl::create_ldpc_segmenter_impl_rx(), decoder_pool,
      pusch_decoder_impl::sch_crc{
          std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC16),
          std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24A),
          std::make_unique<crc_calculator_lut_impl>(
              crc_generator_poly::CRC24B)},
      nullptr, nprb, 1);

  unsigned tbs_bits = tbs_bytes * 8;
  pusch_decoder::configuration dcfg;
  dcfg.base_graph = (tbs_bits > 3824) ? ldpc_base_graph_type::BG1
                                      : ldpc_base_graph_type::BG2;
  dcfg.rv = rv;
  dcfg.mod = to_mod(qm);
  dcfg.Nref = ldpc::compute_N_ref(
      tbs_lbrm_default,
      ldpc::compute_nof_codeblocks(units::bits(tbs_bits), dcfg.base_graph))
      .value();
  dcfg.nof_layers = 1;
  dcfg.nof_ldpc_iterations = 6;
  dcfg.use_early_stop = true;
  dcfg.new_data = true;

  unsigned nof_cb = ldpc::compute_nof_codeblocks(units::bits(tbs_bits),
                                                 dcfg.base_graph);
  simple_rx_buffer buffer(nof_cb);
  capture_decoder_notifier dn;
  std::vector<uint8_t> data(tbs_bytes, 0);
  pusch_decoder_buffer& in = decoder.new_data(
      span<uint8_t>(data), unique_rx_buffer(buffer), dn, dcfg);
  decoder.set_nof_softbits(units::bits(e_total));
  in.on_new_softbits(span<const log_likelihood_ratio>(stream));
  in.on_end_softbits();

  uint8_t okb = dn.got && dn.ok;
  write_bytes(&okb, 1);
  write_bytes(data.data(), data.size());
  return 0;
}

// Full reference PUSCH receiver (DM-RS chest -> MMSE -> demap ->
// descramble -> rate dematch -> LDPC decode -> CRC) on a grid read from
// STDIN — used to prove the reference gNB decodes OUR transmit.
int cmd_puschproc(unsigned nprb, unsigned qm, unsigned rv,
                  unsigned tbs_bytes, unsigned rnti, unsigned nid,
                  unsigned iters, unsigned dmrs3, unsigned oack = 0,
                  unsigned ocsi1 = 0, unsigned ocsi2 = 0,
                  unsigned info_only = 0)
{
  // With UCI configured the PUSCH must START on a data symbol: the
  // reference's ulsch_demultiplex parks on the first symbol at
  // new_transmission() and only advances past 0-softbit (DM-RS) symbols
  // inside on_new_block(); if the first symbol is DM-RS,
  // get_next_block_view() returns an empty span forever and
  // pusch_demodulator_impl's `while (count_re_symbol != nof_re_symbol)`
  // never progresses (live-lock; ulsch_demultiplex_impl.cpp:253-263 +
  // pusch_demodulator_impl.cpp:224).  Production srsRAN starts PUSCH at
  // symbol 0 with type-A DM-RS at l0=2, so the latent edge never fires
  // there — the UCI probes here use that same layout.
  bool uci_cfg = (oack | ocsi1 | ocsi2) != 0;
  unsigned start_sym = uci_cfg ? 0 : 2;
  unsigned nsym = uci_cfg ? 14 : 12;

  if (info_only) {
    // Emit the reference-derived UCI coded-bit counts (get_ulsch_information
    // with the same configuration the processor derives) so the caller can
    // build a matching transmission before invoking the full receive.
    ulsch_configuration ucfg = {};
    ucfg.tbs = units::bits(tbs_bytes * 8);
    ucfg.mcs_descr.modulation = to_mod(qm);
    ucfg.mcs_descr.target_code_rate = 0.5f;
    ucfg.nof_harq_ack_bits = units::bits(oack);
    ucfg.nof_csi_part1_bits = units::bits(ocsi1);
    ucfg.nof_csi_part2_bits = units::bits(ocsi2);
    ucfg.alpha_scaling = 1.0f;
    ucfg.beta_offset_harq_ack = 1.0f;
    ucfg.beta_offset_csi_part1 = 1.0f;
    ucfg.beta_offset_csi_part2 = 1.0f;
    ucfg.nof_rb = nprb;
    ucfg.start_symbol_index = start_sym;
    ucfg.nof_symbols = nsym;
    ucfg.dmrs_type = dmrs_config_type::type1;
    ucfg.dmrs_symbol_mask = bounded_bitset<MAX_NSYMB_PER_SLOT>(14);
    ucfg.dmrs_symbol_mask.set(2);
    if (dmrs3) {
      ucfg.dmrs_symbol_mask.set(7);
    }
    ucfg.dmrs_symbol_mask.set(11);
    ucfg.nof_cdm_groups_without_data = 2;
    ucfg.nof_layers = 1;
    ulsch_information info = get_ulsch_information(ucfg);
    uint32_t hdr[5] = {
        uint32_t(info.nof_ul_sch_bits.value()),
        uint32_t(info.nof_harq_ack_bits.value()),
        uint32_t(info.nof_csi_part1_bits.value()),
        uint32_t(info.nof_csi_part2_bits.value()),
        uint32_t(info.nof_harq_ack_rvd.value())};
    write_bytes(hdr, sizeof(hdr));
    return 0;
  }

  unsigned nsubc = nprb * 12;
  // Read the 14 x nsubc complex64 grid from stdin.
  flat_grid grid(14, nsubc);
  {
    std::vector<cf_t> buf(size_t(14) * nsubc);
    size_t n = std::fread(buf.data(), sizeof(cf_t), buf.size(), stdin);
    if (n != buf.size()) {
      std::fprintf(stderr, "short grid read: %zu\n", n);
      return 3;
    }
    for (unsigned l = 0; l != 14; ++l) {
      std::memcpy(grid.row(l), &buf[size_t(l) * nsubc],
                  nsubc * sizeof(cf_t));
    }
  }

  // Build the processor.
  auto estimator = std::make_unique<dmrs_pusch_estimator_impl>(
      std::make_unique<pseudo_random_generator_impl>(),
      std::make_unique<port_channel_estimator_average_impl>(
          std::make_unique<interpolator_linear_impl>(),
          std::make_unique<time_alignment_estimator_dft_impl>(
              std::make_unique<dft_processor_generic_impl>(
                  dft_processor::configuration{
                      time_alignment_estimator_dft_impl::dft_size,
                      dft_processor::direction::INVERSE})),
          port_channel_estimator_fd_smoothing_strategy::filter,
          /*compensate_cfo=*/true));
  auto demodulator = std::make_unique<pusch_demodulator_impl>(
      std::make_unique<channel_equalizer_generic_impl>(
          channel_equalizer_algorithm_type::mmse),
      nullptr, std::make_unique<demodulation_mapper_impl>(), nullptr,
      std::make_unique<pseudo_random_generator_impl>(), nprb, false);
  auto demux = std::make_unique<ulsch_demultiplex_impl>();
  auto uci_dec = std::make_unique<uci_decoder_impl>(
      std::make_unique<short_block_detector_impl>(),
      std::make_unique<polar_code_impl>(),
      std::make_unique<polar_rate_dematcher_impl>(),
      std::make_unique<polar_decoder_impl>(
          std::make_unique<polar_encoder_impl>(), 10),
      std::make_unique<polar_deallocator_impl>(),
      std::make_unique<crc_calculator_generic_impl>(crc_generator_poly::CRC6),
      std::make_unique<crc_calculator_generic_impl>(
          crc_generator_poly::CRC11));

  auto make_crcs = [] {
    return pusch_decoder_impl::sch_crc{
        std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC16),
        std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24A),
        std::make_unique<crc_calculator_lut_impl>(
            crc_generator_poly::CRC24B)};
  };
  pusch_codeblock_decoder::sch_crc cb_crcs{
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC16),
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24A),
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24B)};
  std::vector<std::unique_ptr<pusch_codeblock_decoder>> cb_decoders;
  cb_decoders.push_back(std::make_unique<pusch_codeblock_decoder>(
      std::unique_ptr<ldpc_rate_dematcher>(
          std::make_unique<ldpc_rate_dematcher_impl>()),
      std::unique_ptr<ldpc_decoder>(std::make_unique<ldpc_decoder_generic>()),
      cb_crcs));
  auto decoder_pool =
      std::make_shared<pusch_decoder_impl::codeblock_decoder_pool>(
          std::move(cb_decoders));
  auto decoder = std::make_unique<pusch_decoder_impl>(
      ldpc_segmenter_impl::create_ldpc_segmenter_impl_rx(), decoder_pool,
      make_crcs(), nullptr, nprb, 1);

  channel_estimate::channel_estimate_dimensions ce_dims;
  ce_dims.nof_prb = nprb;
  ce_dims.nof_symbols = 14;
  ce_dims.nof_rx_ports = 1;
  ce_dims.nof_tx_layers = 1;

  std::vector<std::unique_ptr<
      pusch_processor_impl::concurrent_dependencies>> deps;
  deps.push_back(
      std::make_unique<pusch_processor_impl::concurrent_dependencies>(
          std::move(estimator), std::move(demodulator), std::move(demux),
          std::move(uci_dec), ce_dims));
  pusch_processor_impl::configuration cfg;
  cfg.thread_local_dependencies_pool = std::make_shared<
      pusch_processor_impl::concurrent_dependencies_pool_type>(
      std::move(deps));
  cfg.decoder = std::move(decoder);
  cfg.dec_nof_iterations = iters;
  cfg.dec_enable_early_stop = true;
  cfg.csi_sinr_calc_method =
      channel_state_information::sinr_type::channel_estimator;
  pusch_processor_impl proc(cfg);

  pusch_processor::pdu_t pdu = {};
  pdu.slot = slot_point(0, 0, 0);
  pdu.rnti = uint16_t(rnti);
  pdu.bwp_size_rb = nprb;
  pdu.bwp_start_rb = 0;
  pdu.cp = cyclic_prefix::NORMAL;
  pusch_processor::codeword_description cw;
  cw.rv = rv;
  unsigned tbs_bits = tbs_bytes * 8;
  // TS 38.212 7.2.2 at the signalled target rate 0.5 (matching the model's
  // select_base_graph(tbs, target_rate=0.5)): BG1 above 3824 bits.
  cw.ldpc_base_graph = (tbs_bits > 3824) ? ldpc_base_graph_type::BG1
                                         : ldpc_base_graph_type::BG2;
  cw.new_data = true;
  pdu.codeword = cw;
  pdu.mcs_descr.modulation = to_mod(qm);
  pdu.mcs_descr.target_code_rate = 0.5f;
  pdu.n_id = nid;
  pdu.nof_tx_layers = 1;
  pdu.rx_ports.push_back(0);
  pdu.dmrs_symbol_mask = symbol_slot_mask(14);
  pdu.dmrs_symbol_mask.set(2);
  if (dmrs3) {
    pdu.dmrs_symbol_mask.set(7);
  }
  pdu.dmrs_symbol_mask.set(11);
  pdu.dmrs = dmrs_type::TYPE1;
  pdu.scrambling_id = nid;
  pdu.n_scid = false;
  pdu.nof_cdm_groups_without_data = 2;
  pdu.freq_alloc = rb_allocation::make_type1(0, nprb);
  pdu.start_symbol_index = start_sym;
  pdu.nof_symbols = nsym;
  pdu.tbs_lbrm = tbs_lbrm_default;
  pdu.uci.nof_harq_ack = oack;
  pdu.uci.nof_csi_part1 = ocsi1;
  pdu.uci.csi_part2_size = uci_part2_size_description(ocsi2);
  pdu.uci.alpha_scaling = 1.0f;
  pdu.uci.beta_offset_harq_ack = 1.0f;
  pdu.uci.beta_offset_csi_part1 = 1.0f;
  pdu.uci.beta_offset_csi_part2 = 1.0f;

  // Estimate codeblock count for the buffer.
  unsigned nof_cb =
      ldpc::compute_nof_codeblocks(units::bits(tbs_bits), cw.ldpc_base_graph);
  simple_rx_buffer buffer(nof_cb);
  capture_pusch_notifier notifier;
  std::vector<uint8_t> data(tbs_bytes, 0);
  proc.process(span<uint8_t>(data), unique_rx_buffer(buffer), notifier,
               grid, pdu);

  uint8_t okb = notifier.got && notifier.ok;
  write_bytes(&okb, 1);
  write_bytes(&notifier.sinr_dB, 4);
  write_bytes(data.data(), data.size());
  // Debug tail: the dematched soft bits of codeblock 0 (int8), if any.
  auto soft = buffer.get_codeblock_soft_bits(
      0, buffer.debug_cb0_size ? buffer.debug_cb0_size : 1);
  std::vector<int8_t> sdump(soft.size());
  for (size_t i = 0; i != soft.size(); ++i) {
    sdump[i] = soft[i].to_int();
  }
  uint32_t ns = sdump.size();
  write_bytes(&ns, 4);
  write_bytes(sdump.data(), sdump.size());
  // UCI tail (present when any o_* was configured): per field, a validity
  // byte + u32 count + payload bits.
  uint8_t got_uci = notifier.got_uci ? 1 : 0;
  write_bytes(&got_uci, 1);
  if (got_uci) {
    auto dump = [](uint8_t valid, const std::vector<uint8_t>& bits) {
      write_bytes(&valid, 1);
      uint32_t n = bits.size();
      write_bytes(&n, 4);
      write_bytes(bits.data(), bits.size());
    };
    dump(notifier.ack_valid, notifier.ack_bits);
    dump(notifier.csi1_valid, notifier.csi1_bits);
    dump(notifier.csi2_valid, notifier.csi2_bits);
  }
  return 0;
}

// Single-occasion PRACH buffer fake (long preamble, 1 port).
class simple_prach_buffer : public prach_buffer {
public:
  simple_prach_buffer(unsigned nsym, unsigned l)
      : nsym_(nsym), l_(l), data_(size_t(nsym) * l) {}
  unsigned get_max_nof_ports() const override { return 1; }
  unsigned get_max_nof_td_occasions() const override { return 1; }
  unsigned get_max_nof_fd_occasions() const override { return 1; }
  unsigned get_max_nof_symbols() const override { return nsym_; }
  unsigned get_sequence_length() const override { return l_; }
  span<cf_t> get_symbol(unsigned, unsigned, unsigned, unsigned s) override
  {
    return span<cf_t>(&data_[size_t(s) * l_], l_);
  }
  span<const cf_t> get_symbol(unsigned, unsigned, unsigned,
                              unsigned s) const override
  {
    return span<const cf_t>(&data_[size_t(s) * l_], l_);
  }

private:
  unsigned nsym_, l_;
  std::vector<cf_t> data_;
};

// PRACH detection (prach_detector_generic_impl: replica correlation via
// IDFT + noise-floor thresholds): synthesize a delayed noisy preamble in
// the PRACH frequency domain, emit the symbols + the reference's detection
// result so our detector runs on identical input.
int cmd_prachdet(unsigned root, unsigned zcz, unsigned restricted,
                 unsigned tx_preamble, unsigned delay_ns, int snr_db_x10,
                 unsigned nsym, uint64_t seed, unsigned is_long = 1,
                 unsigned fmt_code = 99)
{
  const unsigned L = is_long ? 839 : 139;
  // fmt_code: 99 = legacy default (0 long / B4 short); otherwise
  // 0..3 = long formats 0/1/2/3, 4..10 = A1/A2/A3/B1/B4/C0/C2.
  prach_format_type fmt =
      is_long ? prach_format_type::zero : prach_format_type::B4;
  if (fmt_code != 99) {
    static const prach_format_type codes[] = {
        prach_format_type::zero, prach_format_type::one,
        prach_format_type::two,  prach_format_type::three,
        prach_format_type::A1,   prach_format_type::A2,
        prach_format_type::A3,   prach_format_type::B1,
        prach_format_type::B4,   prach_format_type::C0,
        prach_format_type::C2};
    fmt = codes[fmt_code];
  }
  prach_generator_impl gen;
  prach_generator::configuration gcfg;
  gcfg.format = fmt;
  gcfg.root_sequence_index = root;
  gcfg.preamble_index = tx_preamble;
  gcfg.restricted_set = static_cast<restricted_set_config>(restricted);
  gcfg.zero_correlation_zone = zcz;
  auto seq = gen.generate(gcfg);

  // 1.25 kHz PRACH SCS (long 0/1/2) / 5 kHz (format 3) / 15 kHz (short, mu 0).
  double scs = is_long ? (fmt == prach_format_type::three ? 5000.0 : 1250.0)
                       : 15000.0;
  double tau = delay_ns * 1e-9;
  double sigma = std::pow(10.0, -double(snr_db_x10) / 200.0);
  std::mt19937_64 g(seed);
  std::normal_distribution<double> noise(0.0, sigma / std::sqrt(2.0));

  simple_prach_buffer buf(nsym, L);
  for (unsigned s = 0; s != nsym; ++s) {
    span<cf_t> sym = buf.get_symbol(0, 0, 0, s);
    for (unsigned k = 0; k != L; ++k) {
      double ph = -2.0 * M_PI * scs * double(k) * tau;
      cf_t rot = cf_t(float(std::cos(ph)), float(std::sin(ph)));
      sym[k] = seq[k] * rot + cf_t(float(noise(g)), float(noise(g)));
    }
  }

  prach_detector_generic_impl det(
      std::make_unique<dft_processor_generic_impl>(
          dft_processor::configuration{1536,
                                       dft_processor::direction::INVERSE}),
      std::make_unique<dft_processor_generic_impl>(
          dft_processor::configuration{1024,
                                       dft_processor::direction::INVERSE}),
      std::make_unique<prach_generator_impl>(), true);
  prach_detector::configuration dcfg;
  dcfg.root_sequence_index = root;
  dcfg.format = fmt;
  dcfg.restricted_set = static_cast<restricted_set_config>(restricted);
  dcfg.zero_correlation_zone = zcz;
  dcfg.start_preamble_index = 0;
  dcfg.nof_preamble_indices = 64;
  dcfg.ra_scs = is_long ? (fmt == prach_format_type::three
                               ? prach_subcarrier_spacing::kHz5
                               : prach_subcarrier_spacing::kHz1_25)
                        : prach_subcarrier_spacing::kHz15;
  dcfg.nof_rx_ports = 1;
  dcfg.slot = slot_point(0, 0, 0);
  prach_detection_result res = det.detect(buf, dcfg);

  uint32_t nsym_u = nsym, ndet = res.preambles.size();
  write_bytes(&nsym_u, 4);
  write_bytes(&ndet, 4);
  for (const auto& p : res.preambles) {
    uint32_t idx = p.preamble_index;
    float ta = float(p.time_advance.to_seconds());
    float m = p.detection_metric;
    write_bytes(&idx, 4);
    write_bytes(&ta, 4);
    write_bytes(&m, 4);
  }
  for (unsigned s = 0; s != nsym; ++s) {
    auto sym = buf.get_symbol(0, 0, 0, s);
    write_bytes(sym.data(), L * sizeof(cf_t));
  }
  return 0;
}

// PUCCH Format 0 detection (pucch_detector_format0: low-PAPR correlation
// over cyclic-shift hypotheses): grid on stdin, config in args.
int cmd_pucchf0(unsigned nprb_grid, unsigned start_prb, unsigned start_sym,
                unsigned nsym, unsigned m0, unsigned nid, unsigned nack,
                unsigned sr_opp)
{
  unsigned nsubc = nprb_grid * 12;
  flat_grid grid(14, nsubc);
  {
    std::vector<cf_t> buf(size_t(14) * nsubc);
    if (std::fread(buf.data(), sizeof(cf_t), buf.size(), stdin)
        != buf.size()) {
      return 3;
    }
    for (unsigned l = 0; l != 14; ++l) {
      std::memcpy(grid.row(l), &buf[size_t(l) * nsubc],
                  nsubc * sizeof(cf_t));
    }
  }
  low_papr_sequence_generator_impl gen;
  std::array<float, 12> alphas;
  for (unsigned i = 0; i != 12; ++i) {
    alphas[i] = 2.0f * float(M_PI) * float(i) / 12.0f;
  }
  pucch_detector_format0 det(
      std::make_unique<pseudo_random_generator_impl>(),
      std::make_unique<low_papr_sequence_collection_impl>(
          gen, 1, 0, span<const float>(alphas)));
  pucch_detector::format0_configuration cfg;
  cfg.slot = slot_point(0, 0, 0);
  cfg.cp = cyclic_prefix::NORMAL;
  cfg.starting_prb = start_prb;
  cfg.start_symbol_index = start_sym;
  cfg.nof_symbols = nsym;
  cfg.initial_cyclic_shift = m0;
  cfg.n_id = nid;
  cfg.nof_harq_ack = nack;
  cfg.sr_opportunity = sr_opp != 0;
  cfg.ports.push_back(0);
  auto r = det.detect(grid, cfg);
  const pucch_uci_message& msg = r.first;
  uint8_t valid = msg.get_status() == uci_status::valid ? 1 : 0;
  uint8_t nbits = msg.get_harq_ack_bits().size();
  uint8_t bits[2] = {0, 0};
  for (unsigned i = 0; i != nbits; ++i) {
    bits[i] = msg.get_harq_ack_bits()[i];
  }
  uint8_t sr = msg.get_sr_bits().empty() ? 255 : msg.get_sr_bits()[0];
  float sinr = r.second.get_sinr_dB().value_or(NAN);
  write_bytes(&valid, 1);
  write_bytes(&nbits, 1);
  write_bytes(bits, 2);
  write_bytes(&sr, 1);
  write_bytes(&sinr, 4);
  return 0;
}

bool read_grid_stdin(flat_grid& grid, unsigned nsymb, unsigned nsubc)
{
  std::vector<cf_t> buf(size_t(nsymb) * nsubc);
  if (std::fread(buf.data(), sizeof(cf_t), buf.size(), stdin) != buf.size()) {
    return false;
  }
  for (unsigned l = 0; l != nsymb; ++l) {
    std::memcpy(grid.row(l), &buf[size_t(l) * nsubc], nsubc * sizeof(cf_t));
  }
  return true;
}

// Complete PDCCH processor (pdcch_processor_impl: encoder + modulator +
// DM-RS through a resource_grid_mapper): emits the DCI payload and the full
// CORESET grid for RE-exact comparison.
int cmd_pdcchproc(unsigned bwp_rb, unsigned start_sym, unsigned duration,
                  unsigned al, unsigned cce, unsigned interleaved,
                  unsigned rows, unsigned shift, unsigned rnti, unsigned nid,
                  unsigned npayload, uint64_t seed)
{
  pdcch_processor_impl proc(
      std::make_unique<pdcch_encoder_impl>(
          std::make_unique<crc_calculator_lut_impl>(
              crc_generator_poly::CRC24C),
          std::make_unique<polar_interleaver_impl>(),
          std::make_unique<polar_allocator_impl>(),
          std::make_unique<polar_code_impl>(),
          std::make_unique<polar_encoder_impl>(),
          std::make_unique<polar_rate_matcher_impl>()),
      std::make_unique<pdcch_modulator_impl>(
          std::make_unique<modulation_mapper_lut_impl>(),
          std::make_unique<pseudo_random_generator_impl>()),
      std::make_unique<dmrs_pdcch_processor_impl>(
          std::make_unique<pseudo_random_generator_impl>()));

  unsigned nsubc = bwp_rb * 12;
  flat_grid grid(14, nsubc);
  resource_grid_mapper_impl mapper(
      1, nsubc, grid, std::make_unique<channel_precoder_generic>());

  Rng rng(seed);
  pdcch_processor::pdu_t pdu = {};
  pdu.slot = slot_point(0, 0, 0);
  pdu.cp = cyclic_prefix::NORMAL;
  pdu.coreset.bwp_size_rb = bwp_rb;
  pdu.coreset.bwp_start_rb = 0;
  pdu.coreset.start_symbol_index = start_sym;
  pdu.coreset.duration = duration;
  pdu.coreset.frequency_resources =
      freq_resource_bitmap(pdcch_constants::MAX_NOF_FREQ_RESOURCES);
  for (unsigned g = 0; g != bwp_rb / 6; ++g) {
    pdu.coreset.frequency_resources.set(g);
  }
  pdu.coreset.cce_to_reg_mapping =
      interleaved ? pdcch_processor::cce_to_reg_mapping_type::INTERLEAVED
                  : pdcch_processor::cce_to_reg_mapping_type::NON_INTERLEAVED;
  pdu.coreset.reg_bundle_size = 6;
  pdu.coreset.interleaver_size = rows;
  pdu.coreset.shift_index = shift;
  pdu.dci.rnti = rnti;
  pdu.dci.n_id_pdcch_dmrs = nid;
  pdu.dci.n_id_pdcch_data = nid;
  pdu.dci.n_rnti = rnti;
  pdu.dci.cce_index = cce;
  pdu.dci.aggregation_level = al;
  pdu.dci.dmrs_power_offset_dB = 0.0f;
  pdu.dci.data_power_offset_dB = 0.0f;
  for (unsigned i = 0; i != npayload; ++i) {
    pdu.dci.payload.push_back(rng.bit());
  }
  pdu.dci.precoding = precoding_configuration::make_wideband(
      make_single_port());

  proc.process(mapper, pdu);

  uint32_t hdr[2] = {nsubc, npayload};
  write_bytes(hdr, sizeof(hdr));
  write_bytes(pdu.dci.payload.data(), npayload);
  std::vector<cf_t> out(size_t(14) * nsubc);
  for (unsigned l = 0; l != 14; ++l) {
    std::memcpy(&out[size_t(l) * nsubc], grid.row(l), nsubc * sizeof(cf_t));
  }
  write_bytes(out.data(), out.size() * sizeof(cf_t));
  return 0;
}

// NZP-CSI-RS generator (nzp_csi_rs_generator_impl, TS 38.211 7.4.1.5):
// emits the full grid. density: 0=dot5_even, 1=dot5_odd, 2=one, 3=three.
int cmd_csirs(unsigned bwp_rb, unsigned row, unsigned start_rb,
              unsigned nof_rb, unsigned k0, unsigned l0, unsigned density,
              unsigned scramb_id, unsigned slot_idx)
{
  nzp_csi_rs_generator_impl gen(
      std::make_unique<pseudo_random_generator_impl>());
  unsigned nsubc = bwp_rb * 12;
  flat_grid grid(14, nsubc);
  resource_grid_mapper_impl mapper(
      1, nsubc, grid, std::make_unique<channel_precoder_generic>());

  nzp_csi_rs_generator::config_t cfg = {};
  cfg.slot = slot_point(0, slot_idx);
  cfg.cp = cyclic_prefix::NORMAL;
  cfg.start_rb = start_rb;
  cfg.nof_rb = nof_rb;
  cfg.csi_rs_mapping_table_row = row;
  cfg.freq_allocation_ref_idx.push_back(k0);
  cfg.symbol_l0 = l0;
  cfg.symbol_l1 = 2;
  cfg.cdm = csi_rs_cdm_type::no_CDM;
  cfg.freq_density = static_cast<csi_rs_freq_density_type>(density);
  cfg.scrambling_id = scramb_id;
  cfg.amplitude = 1.0f;
  cfg.precoding = precoding_configuration::make_wideband(make_single_port());
  gen.map(mapper, cfg);

  uint32_t nsubc_u = nsubc;
  write_bytes(&nsubc_u, 4);
  std::vector<cf_t> out(size_t(14) * nsubc);
  for (unsigned l = 0; l != 14; ++l) {
    std::memcpy(&out[size_t(l) * nsubc], grid.row(l), nsubc * sizeof(cf_t));
  }
  write_bytes(out.data(), out.size() * sizeof(cf_t));
  return 0;
}

// PUCCH Format 1 full receive: dmrs_pucch_processor_format1 (channel
// estimation from the even-offset DM-RS symbols) + pucch_detector_format1
// (OCC despread + sequence correlation on the odd-offset data symbols).
// Grid on stdin.
int cmd_pucchf1(unsigned nprb_grid, unsigned start_prb, unsigned start_sym,
                unsigned nsym, unsigned m0, unsigned occ, unsigned nid,
                unsigned nack)
{
  unsigned nsubc = nprb_grid * 12;
  flat_grid grid(14, nsubc);
  if (!read_grid_stdin(grid, 14, nsubc)) {
    return 3;
  }

  low_papr_sequence_generator_impl gen;
  std::array<float, 12> alphas;
  for (unsigned i = 0; i != 12; ++i) {
    alphas[i] = 2.0f * float(M_PI) * float(i) / 12.0f;
  }
  auto make_chest = [] {
    return std::make_unique<port_channel_estimator_average_impl>(
        std::make_unique<interpolator_linear_impl>(),
        std::make_unique<time_alignment_estimator_dft_impl>(
            std::make_unique<dft_processor_generic_impl>(
                dft_processor::configuration{
                    time_alignment_estimator_dft_impl::dft_size,
                    dft_processor::direction::INVERSE})),
        port_channel_estimator_fd_smoothing_strategy::filter, true);
  };
  dmrs_pucch_processor_format1_impl est(
      std::make_unique<pseudo_random_generator_impl>(),
      std::make_unique<low_papr_sequence_collection_impl>(
          gen, 1, 0, span<const float>(alphas)),
      make_chest());
  pucch_detector_format1 det(
      std::make_unique<low_papr_sequence_collection_impl>(
          gen, 1, 0, span<const float>(alphas)),
      std::make_unique<pseudo_random_generator_impl>(),
      std::make_unique<channel_equalizer_generic_impl>(
          channel_equalizer_algorithm_type::zf));

  dmrs_pucch_processor::config_t ecfg = {};
  ecfg.format = pucch_format::FORMAT_1;
  ecfg.slot = slot_point(0, 0, 0);
  ecfg.cp = cyclic_prefix::NORMAL;
  ecfg.group_hopping = pucch_group_hopping::NEITHER;
  ecfg.start_symbol_index = start_sym;
  ecfg.nof_symbols = nsym;
  ecfg.starting_prb = start_prb;
  ecfg.intra_slot_hopping = false;
  ecfg.second_hop_prb = 0;
  ecfg.nof_prb = 1;
  ecfg.initial_cyclic_shift = m0;
  ecfg.time_domain_occ = occ;
  ecfg.additional_dmrs = false;
  ecfg.n_id = nid;
  ecfg.n_id_0 = nid;
  ecfg.ports.push_back(0);

  channel_estimate::channel_estimate_dimensions dims;
  dims.nof_prb = nprb_grid;
  dims.nof_symbols = 14;
  dims.nof_rx_ports = 1;
  dims.nof_tx_layers = 1;
  channel_estimate ce(dims);
  est.estimate(ce, grid, ecfg);

  pucch_detector::format1_configuration dcfg = {};
  dcfg.slot = slot_point(0, 0, 0);
  dcfg.cp = cyclic_prefix::NORMAL;
  dcfg.starting_prb = start_prb;
  dcfg.start_symbol_index = start_sym;
  dcfg.nof_symbols = nsym;
  dcfg.group_hopping = pucch_group_hopping::NEITHER;
  dcfg.ports.push_back(0);
  dcfg.beta_pucch = 1.0f;
  dcfg.time_domain_occ = occ;
  dcfg.initial_cyclic_shift = m0;
  dcfg.n_id = nid;
  dcfg.nof_harq_ack = nack;
  auto r = det.detect(grid, ce, dcfg);

  const pucch_uci_message& msg = r.uci_message;
  uint8_t valid = msg.get_status() == uci_status::valid ? 1 : 0;
  uint8_t nbits = msg.get_harq_ack_bits().size();
  uint8_t bits[2] = {255, 255};
  for (unsigned i = 0; i != nbits && i < 2; ++i) {
    bits[i] = msg.get_harq_ack_bits()[i];
  }
  float metric = r.detection_metric;
  write_bytes(&valid, 1);
  write_bytes(&nbits, 1);
  write_bytes(bits, 2);
  write_bytes(&metric, 4);
  return 0;
}

// PUCCH Format 2 full receive: dmrs_pucch_processor_format2 (chest from the
// 3k+1 DM-RS subcarriers) + pucch_demodulator (ZF equalize + QPSK demap +
// descramble) + uci_decoder (short block or polar).  Grid on stdin.
int cmd_pucchf2(unsigned nprb_grid, unsigned start_prb, unsigned nof_prb,
                unsigned start_sym, unsigned nsym, unsigned rnti,
                unsigned nid, unsigned nid0, unsigned K)
{
  unsigned nsubc = nprb_grid * 12;
  flat_grid grid(14, nsubc);
  if (!read_grid_stdin(grid, 14, nsubc)) {
    return 3;
  }

  dmrs_pucch_processor_format2_impl est(
      std::make_unique<pseudo_random_generator_impl>(),
      std::make_unique<port_channel_estimator_average_impl>(
          std::make_unique<interpolator_linear_impl>(),
          std::make_unique<time_alignment_estimator_dft_impl>(
              std::make_unique<dft_processor_generic_impl>(
                  dft_processor::configuration{
                      time_alignment_estimator_dft_impl::dft_size,
                      dft_processor::direction::INVERSE})),
          port_channel_estimator_fd_smoothing_strategy::filter, true));
  pucch_demodulator_impl demod(
      std::make_unique<channel_equalizer_generic_impl>(
          channel_equalizer_algorithm_type::zf),
      std::make_unique<demodulation_mapper_impl>(),
      std::make_unique<pseudo_random_generator_impl>());
  uci_decoder_impl uci(
      std::make_unique<short_block_detector_impl>(),
      std::make_unique<polar_code_impl>(),
      std::make_unique<polar_rate_dematcher_impl>(),
      std::make_unique<polar_decoder_impl>(
          std::make_unique<polar_encoder_impl>(), 10),
      std::make_unique<polar_deallocator_impl>(),
      // CRC6/11 exist only in the generic CRC impl (the LUT map lacks them).
      std::make_unique<crc_calculator_generic_impl>(crc_generator_poly::CRC6),
      std::make_unique<crc_calculator_generic_impl>(
          crc_generator_poly::CRC11));

  dmrs_pucch_processor::config_t ecfg = {};
  ecfg.format = pucch_format::FORMAT_2;
  ecfg.slot = slot_point(0, 0, 0);
  ecfg.cp = cyclic_prefix::NORMAL;
  ecfg.group_hopping = pucch_group_hopping::NEITHER;
  ecfg.start_symbol_index = start_sym;
  ecfg.nof_symbols = nsym;
  ecfg.starting_prb = start_prb;
  ecfg.intra_slot_hopping = false;
  ecfg.second_hop_prb = 0;
  ecfg.nof_prb = nof_prb;
  ecfg.n_id = nid;
  ecfg.n_id_0 = nid0;
  ecfg.ports.push_back(0);

  channel_estimate::channel_estimate_dimensions dims;
  dims.nof_prb = nprb_grid;
  dims.nof_symbols = 14;
  dims.nof_rx_ports = 1;
  dims.nof_tx_layers = 1;
  channel_estimate ce(dims);
  est.estimate(ce, grid, ecfg);

  unsigned e_total = 16 * nof_prb * nsym;  // 8 data sc/PRB * QPSK
  std::vector<log_likelihood_ratio> llr(e_total);
  pucch_demodulator::format2_configuration dcfg = {};
  dcfg.rx_ports.push_back(0);
  dcfg.first_prb = start_prb;
  dcfg.nof_prb = nof_prb;
  dcfg.start_symbol_index = start_sym;
  dcfg.nof_symbols = nsym;
  dcfg.rnti = rnti;
  dcfg.n_id = nid;
  demod.demodulate(llr, grid, ce, dcfg);

  std::vector<uint8_t> message(K);
  uci_decoder::configuration ucfg;
  ucfg.modulation = modulation_scheme::QPSK;
  uci_status status = uci.decode(message, llr, ucfg);

  uint8_t valid = status == uci_status::valid ? 1 : 0;
  uint32_t k_u = K;
  write_bytes(&valid, 1);
  write_bytes(&k_u, 4);
  write_bytes(message.data(), K);
  return 0;
}

srs_resource_configuration make_srs_resource(unsigned cfg_idx, unsigned b_idx,
                                             unsigned comb,
                                             unsigned comb_offset,
                                             unsigned n_cs, unsigned seq_id,
                                             unsigned start_sym,
                                             unsigned freq_shift,
                                             unsigned freq_pos)
{
  srs_resource_configuration res = {};
  res.nof_antenna_ports = srs_resource_configuration::one_two_four_enum::one;
  res.nof_symbols = srs_resource_configuration::one_two_four_enum::one;
  res.start_symbol = start_sym;
  res.configuration_index = cfg_idx;
  res.sequence_id = seq_id;
  res.bandwidth_index = b_idx;
  res.comb_size = (comb == 4)
                      ? srs_resource_configuration::comb_size_enum::four
                      : srs_resource_configuration::comb_size_enum::two;
  res.comb_offset = comb_offset;
  res.cyclic_shift = n_cs;
  res.freq_position = freq_pos;
  res.freq_shift = freq_shift;
  res.freq_hopping = 3;  // >= b_idx: no frequency hopping
  res.hopping =
      srs_resource_configuration::group_or_sequence_hopping_enum::neither;
  return res;
}

void write_srs_info(const srs_information& info)
{
  uint32_t hdr[7] = {info.sequence_length,  info.sequence_group,
                     info.sequence_number,  info.n_cs,
                     info.n_cs_max,         info.mapping_initial_subcarrier,
                     info.comb_size};
  write_bytes(hdr, sizeof(hdr));
}

// Derived SRS mapping parameters only (so the caller can build a matching
// transmit grid before invoking srsest).
int cmd_srsinfo(unsigned cfg_idx, unsigned b_idx, unsigned comb,
                unsigned comb_offset, unsigned n_cs, unsigned seq_id,
                unsigned start_sym, unsigned freq_shift, unsigned freq_pos)
{
  srs_resource_configuration res =
      make_srs_resource(cfg_idx, b_idx, comb, comb_offset, n_cs, seq_id,
                        start_sym, freq_shift, freq_pos);
  write_srs_info(get_srs_information(res, 0));
  return 0;
}

// SRS channel estimate (srs_estimator_generic_impl): grid on stdin; emits
// the derived mapping info, the wideband channel coefficient, the noise
// variance and the time alignment.
int cmd_srsest(unsigned nprb_grid, unsigned cfg_idx, unsigned b_idx,
               unsigned comb, unsigned comb_offset, unsigned n_cs,
               unsigned seq_id, unsigned start_sym, unsigned freq_shift,
               unsigned freq_pos)
{
  unsigned nsubc = nprb_grid * 12;
  flat_grid grid(14, nsubc);
  if (!read_grid_stdin(grid, 14, nsubc)) {
    return 3;
  }
  srs_estimator_generic_impl::dependencies deps;
  deps.sequence_generator =
      std::make_unique<low_papr_sequence_generator_impl>();
  deps.ta_estimator = std::make_unique<time_alignment_estimator_dft_impl>(
      std::make_unique<dft_processor_generic_impl>(dft_processor::configuration{
          time_alignment_estimator_dft_impl::dft_size,
          dft_processor::direction::INVERSE}));
  srs_estimator_generic_impl est(std::move(deps));

  srs_estimator_configuration cfg;
  cfg.slot = slot_point(0, 0, 0);
  cfg.resource = make_srs_resource(cfg_idx, b_idx, comb, comb_offset, n_cs,
                                   seq_id, start_sym, freq_shift, freq_pos);
  cfg.ports.push_back(0);
  srs_estimator_result r = est.estimate(grid, cfg);

  write_srs_info(get_srs_information(cfg.resource, 0));
  cf_t coeff = r.channel_matrix.get_coefficient(0, 0);
  float vals[5] = {coeff.real(), coeff.imag(), r.noise_variance,
                   float(r.time_alignment.time_alignment),
                   float(r.time_alignment.resolution)};
  write_bytes(vals, sizeof(vals));
  return 0;
}

} // namespace

int main(int argc, char** argv)
{
  if (argc < 2) {
    std::fprintf(stderr, "usage: refharness <cmd> ...\n");
    return 2;
  }
  std::string cmd = argv[1];
  auto u = [&](int i) { return unsigned(std::strtoul(argv[i], nullptr, 10)); };
  if (cmd == "encode" && argc >= 7) {
    return cmd_encode(u(2), u(3), u(4), u(5), argv[6]);
  }
  if (cmd == "crc" && argc >= 6) {
    return cmd_crc(argv[2], u(3), u(4), u(5));
  }
  if (cmd == "ratematch" && argc >= 10) {
    return cmd_ratematch(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9));
  }
  if (cmd == "dematch" && argc >= 10) {
    return cmd_dematch(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9));
  }
  if (cmd == "decode" && argc >= 10) {
    return cmd_decode(u(2), u(3), u(4), u(5), u(6), u(7), argv[8], u(9));
  }
  if (cmd == "decode_soft" && argc >= 8) {
    return cmd_decode_soft(u(2), u(3), u(4), u(5), argv[6], u(7));
  }
  if (cmd == "decode_llrs" && argc >= 8) {
    return cmd_decode_llrs(u(2), u(3), u(4), u(5), argv[6], u(7));
  }
  if (cmd == "decode_llrs" && argc >= 7) {
    return cmd_decode_llrs(u(2), u(3), u(4), u(5), argv[6]);
  }
  if (cmd == "bench_encode" && argc >= 6) {
    return cmd_bench_encode(u(2), u(3), u(4), argv[5]);
  }
  if (cmd == "bench_decode" && argc >= 8) {
    return cmd_bench_decode(u(2), u(3), u(4), u(5), argv[6], u(7));
  }
  if (cmd == "prg" && argc >= 5) {
    return cmd_prg(u(2), u(3), u(4));
  }
  if (cmd == "lowpapr" && argc >= 7) {
    return cmd_lowpapr(u(2), u(3), u(4), u(5), u(6));
  }
  if (cmd == "modmap" && argc >= 6) {
    return cmd_modmap(u(2), u(3), u(4), u(5));
  }
  if (cmd == "demap" && argc >= 7) {
    return cmd_demap(u(2), u(3), u(4), u(5), u(6));
  }
  if (cmd == "eq" && argc >= 8) {
    return cmd_eq(argv[2], u(3), u(4), u(5), u(6), u(7));
  }
  if (cmd == "shortblock" && argc >= 8) {
    return cmd_shortblock(u(2), u(3), u(4), u(5), u(6), u(7));
  }
  if (cmd == "polar" && argc >= 9) {
    return cmd_polar(u(2), u(3), u(4), u(5), u(6), u(7), u(8));
  }
  if (cmd == "ofhbfp" && argc >= 7) {
    return cmd_ofhbfp(u(2), u(3), u(4), u(5), u(6));
  }
  if (cmd == "ofdm" && argc >= 10) {
    return cmd_ofdm(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9));
  }
  if (cmd == "puschdec" && argc >= 7) {
    return cmd_puschdec(u(2), u(3), u(4), u(5), u(6));
  }
  if (cmd == "puschdemod" && argc >= 7) {
    return cmd_puschdemod(u(2), u(3), u(4), u(5), u(6));
  }
  if (cmd == "puschproc" && argc >= 10) {
    return cmd_puschproc(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9),
                         argc >= 14 ? u(10) : 0, argc >= 14 ? u(11) : 0,
                         argc >= 14 ? u(12) : 0, argc >= 14 ? u(13) : 0);
  }
  if (cmd == "pdschproc" && argc >= 10) {
    return cmd_pdschproc(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9));
  }
  if (cmd == "ssbgrid" && argc >= 9) {
    return cmd_ssbgrid(u(2), u(3), u(4), u(5), u(6), u(7), u(8));
  }
  if (cmd == "pdcchenc" && argc >= 7) {
    return cmd_pdcchenc(u(2), u(3), u(4), u(5), u(6));
  }
  if (cmd == "ulschdemux" && argc >= 11) {
    return cmd_ulschdemux(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9),
                          u(10), argc >= 13 ? u(11) : 0,
                          argc >= 13 ? u(12) : 0);
  }
  if (cmd == "oeth" && argc >= 6) {
    return cmd_oeth(u(2), u(3), u(4), std::strtoull(argv[5], nullptr, 10));
  }
  if (cmd == "ouplane" && argc >= 11) {
    return cmd_ouplane(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9),
                       u(10));
  }
  if (cmd == "bench_kernels" && argc >= 3) {
    return cmd_bench_kernels(u(2));
  }
  if (cmd == "pucchf0" && argc >= 10) {
    return cmd_pucchf0(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9));
  }
  if (cmd == "prachdet" && argc >= 10) {
    return cmd_prachdet(u(2), u(3), u(4), u(5), u(6),
                        int(std::strtol(argv[7], nullptr, 10)), u(8), u(9),
                        argc >= 11 ? u(10) : 1, argc >= 12 ? u(11) : 99);
  }
  if (cmd == "prachgen" && argc >= 7) {
    return cmd_prachgen(u(2), u(3), u(4), u(5), u(6));
  }
  if (cmd == "pdcchproc" && argc >= 14) {
    return cmd_pdcchproc(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9),
                         u(10), u(11), u(12), u(13));
  }
  if (cmd == "csirs" && argc >= 11) {
    return cmd_csirs(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9), u(10));
  }
  if (cmd == "pucchf1" && argc >= 10) {
    return cmd_pucchf1(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9));
  }
  if (cmd == "pucchf2" && argc >= 11) {
    return cmd_pucchf2(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9), u(10));
  }
  if (cmd == "srsinfo" && argc >= 11) {
    return cmd_srsinfo(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9), u(10));
  }
  if (cmd == "srsest" && argc >= 12) {
    return cmd_srsest(u(2), u(3), u(4), u(5), u(6), u(7), u(8), u(9), u(10),
                      u(11));
  }
  if (cmd == "chest" && argc >= 9) {
    return cmd_chest(u(2), u(3), u(4), u(5),
                     int(std::strtol(argv[6], nullptr, 10)), u(7), u(8));
  }
  std::fprintf(stderr, "bad command/args\n");
  return 2;
}
