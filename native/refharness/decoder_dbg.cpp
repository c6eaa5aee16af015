// Debug-only shim: exposes the reference LDPC decoder's internal soft-bit
// state after a bounded decode, for trajectory-level parity debugging of
// the TPU decoder (the public API only returns packed hard systematic
// bits).  The `private -> public` define is a test-harness hack confined
// to this translation unit.
// Pre-include the std headers the srsran tree pulls in, BEFORE the
// access hack, so libstdc++ internals keep their real access specifiers.
#include <algorithm>
#include <array>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <optional>
#include <sstream>
#include <string>
#include <vector>

#define private public
#include "ldpc_decoder_avx2.h"
#include "ldpc_decoder_generic.h"
#undef private

#include <cstdio>
#include <cstring>
#include <vector>

using namespace srsran;

// Runs `iters` iterations of the requested impl on `in` (n_out LLRs,
// punctured head NOT included) and writes the full soft-bit node array
// (nof_nodes * lifting_size int8) to `soft_out`.
extern "C" int dbg_decode_soft(const char* impl, unsigned bg_i, unsigned zc,
                               unsigned iters, const int8_t* in,
                               unsigned n_out, int8_t* soft_out,
                               unsigned nof_nodes)
{
  ldpc_decoder::configuration cfg = {};
  cfg.block_conf.tb_common.base_graph =
      (bg_i == 1) ? ldpc_base_graph_type::BG1 : ldpc_base_graph_type::BG2;
  cfg.block_conf.tb_common.lifting_size =
      static_cast<ldpc::lifting_size_t>(zc);
  cfg.block_conf.cb_specific.nof_filler_bits = 0;
  cfg.block_conf.cb_specific.nof_crc_bits    = 16;
  cfg.algorithm_conf.max_iterations          = iters;
  cfg.algorithm_conf.scaling_factor          = 0.8;

  std::vector<log_likelihood_ratio> llrs(n_out);
  for (unsigned i = 0; i != n_out; ++i) {
    llrs[i] = in[i];
  }
  unsigned k = ((bg_i == 1) ? 22 : 10) * zc;
  dynamic_bit_buffer out_packed(k);

  if (std::string(impl) == "avx2") {
    ldpc_decoder_avx2 dec;
    dec.decode(out_packed, span<const log_likelihood_ratio>(llrs), nullptr,
               cfg);
    for (unsigned n = 0; n != nof_nodes; ++n) {
      span<log_likelihood_ratio> sb = dec.get_soft_bits(n);
      for (unsigned j = 0; j != zc; ++j) {
        soft_out[n * zc + j] = sb[j].to_value_type();
      }
    }
  } else {
    ldpc_decoder_generic dec;
    dec.decode(out_packed, span<const log_likelihood_ratio>(llrs), nullptr,
               cfg);
    for (unsigned n = 0; n != nof_nodes; ++n) {
      span<log_likelihood_ratio> sb = dec.get_soft_bits(n);
      for (unsigned j = 0; j != zc; ++j) {
        soft_out[n * zc + j] = sb[j].to_value_type();
      }
    }
  }
  return 0;
}
