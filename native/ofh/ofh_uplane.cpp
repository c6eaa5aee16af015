// O-RAN fronthaul U-Plane framing (eCPRI IQ-data messages, section type 1,
// static compression configuration) — the wire format of the reference's
// lib/ofh/{ecpri/ecpri_packet_builder_impl.cpp,
// serdes/ofh_uplane_message_builder_static_compression_impl.cpp}, built
// byte-exactly (cross-validated in tests/test_reference_parity.py via the
// refharness `ouplane` command).
//
// Scope: the serdes layer between the TPU compression kernels
// (ops/ofh_compression.py producing per-PRB exponents + packed mantissas)
// and an Ethernet/eCPRI transport.  The raw-socket/DPDK NIC path itself is
// out of scope on this machine (no fronthaul NIC).
//
// C ABI for ctypes (runtime/ofh.py).

#include <cstdint>
#include <cstring>

namespace {

constexpr unsigned ECPRI_HDR = 4;     // common header
constexpr unsigned ECPRI_IQ_FIELDS = 4;  // PC_ID + SEQ_ID
constexpr unsigned RADIO_HDR = 4;
constexpr unsigned SECTION1_HDR = 4;

inline void put_u16(uint8_t* p, uint16_t v)
{
  p[0] = uint8_t(v >> 8);
  p[1] = uint8_t(v);
}

inline uint16_t get_u16(const uint8_t* p)
{
  return (uint16_t(p[0]) << 8) | p[1];
}

} // namespace

extern "C" {

// Frame size for nof_prb PRBs of width-bit BFP payloads (+1 exponent byte
// per PRB); width 0 means uncompressed-style payload without exponent.
unsigned ofh_uplane_frame_size(unsigned nof_prb, unsigned width,
                               unsigned with_exponent)
{
  unsigned prb_bytes = (24 * width + 7) / 8 + (with_exponent ? 1 : 0);
  return ECPRI_HDR + ECPRI_IQ_FIELDS + RADIO_HDR + SECTION1_HDR +
         nof_prb * prb_bytes;
}

// Build one DL U-Plane eCPRI frame for one OFDM symbol.
//   out:        caller buffer of at least ofh_uplane_frame_size bytes
//   pc_id/seq:  eCPRI eAxC and sequence id
//   sfn:        frame counter (8 LSBs used)
//   subframe:   0..9; slot: slot index within the subframe; symbol: 0..13
//   start_prb:  first PRB of the section; nof_prb PRBs follow
//   exponents:  nof_prb bytes (BFP udCompParam), may be null (none compr.)
//   payload:    nof_prb * ceil(24*width/8) packed mantissa bytes
// Returns the frame length.
unsigned ofh_uplane_build_dl(uint8_t* out, uint16_t pc_id, uint16_t seq_id,
                             unsigned sfn, unsigned subframe, unsigned slot,
                             unsigned symbol, unsigned start_prb,
                             unsigned nof_prb, unsigned width,
                             const uint8_t* exponents,
                             const uint8_t* payload)
{
  unsigned prb_payload = (24 * width + 7) / 8;
  unsigned total = ofh_uplane_frame_size(nof_prb, width, exponents != nullptr);

  uint8_t* p = out;
  // eCPRI common header: protocol revision 1 in the 4 MSBs, no
  // concatenation (ecpri_packet_builder_impl.cpp get_first_byte...).
  *p++ = uint8_t(1u << 4);
  *p++ = 0;  // message type 0: IQ data
  put_u16(p, uint16_t(total - ECPRI_HDR));  // payload size
  p += 2;
  put_u16(p, pc_id);
  p += 2;
  put_u16(p, seq_id);
  p += 2;

  // Radio application header (ofh_uplane_message_builder_impl.cpp:33-92).
  // Direction DL (bit 7) | payload version 1 (bits 4-6) | filter 0.
  *p++ = uint8_t((1u << 7) | (1u << 4));
  *p++ = uint8_t(sfn);
  *p++ = uint8_t((subframe << 4) | (slot >> 2));
  *p++ = uint8_t(((slot & 0x3) << 6) | (symbol & 0x3f));

  // Section 1 header: sectionId=0; rb=every_rb(0)<<3 | symInc=current(0)<<2
  // | startPrb MSBs; startPrb LSBs; numPrb (0 when > 255).
  *p++ = 0;
  *p++ = uint8_t((start_prb >> 8) & 0x3);
  *p++ = uint8_t(start_prb);
  *p++ = uint8_t(nof_prb > 255 ? 0 : nof_prb);

  // Static compression: no udCompHdr. Per PRB: udCompParam (exponent) then
  // packed mantissas.
  for (unsigned i = 0; i != nof_prb; ++i) {
    if (exponents != nullptr) {
      *p++ = exponents[i];
    }
    std::memcpy(p, payload + size_t(i) * prb_payload, prb_payload);
    p += prb_payload;
  }
  return unsigned(p - out);
}

// Parse a frame built by ofh_uplane_build_dl (or the reference builder).
// Outputs are written through the pointers; exponents/payload are COPIED.
// Returns 0 on success, negative error code otherwise.
int ofh_uplane_parse(const uint8_t* frame, unsigned frame_len,
                     uint16_t* pc_id, uint16_t* seq_id, unsigned* sfn,
                     unsigned* subframe, unsigned* slot, unsigned* symbol,
                     unsigned* start_prb, unsigned* nof_prb, unsigned width,
                     unsigned with_exponent, uint8_t* exponents,
                     uint8_t* payload)
{
  if (frame_len < ECPRI_HDR + ECPRI_IQ_FIELDS + RADIO_HDR + SECTION1_HDR) {
    return -1;
  }
  const uint8_t* p = frame;
  if ((p[0] >> 4) != 1 || p[1] != 0) {
    return -2;  // not an eCPRI rev-1 IQ-data frame
  }
  unsigned payload_size = get_u16(p + 2);
  if (payload_size + ECPRI_HDR != frame_len) {
    return -3;
  }
  *pc_id = get_u16(p + 4);
  *seq_id = get_u16(p + 6);
  p += ECPRI_HDR + ECPRI_IQ_FIELDS;

  if ((p[0] >> 7) != 1) {
    return -4;  // only DL frames here
  }
  *sfn = p[1];
  *subframe = p[2] >> 4;
  *slot = ((p[2] & 0xf) << 2) | (p[3] >> 6);
  *symbol = p[3] & 0x3f;
  p += RADIO_HDR;

  *start_prb = ((p[1] & 0x3) << 8) | p[2];
  unsigned np = p[3];
  p += SECTION1_HDR;

  unsigned prb_payload = (24 * width + 7) / 8;
  unsigned prb_bytes = prb_payload + (with_exponent ? 1 : 0);
  unsigned remaining = frame_len - unsigned(p - frame);
  if (np == 0) {
    np = remaining / prb_bytes;  // numPrb==0 encodes "all PRBs" (> 255)
  }
  if (remaining != np * prb_bytes) {
    return -5;
  }
  *nof_prb = np;
  for (unsigned i = 0; i != np; ++i) {
    if (with_exponent) {
      exponents[i] = *p++;
    }
    std::memcpy(payload + size_t(i) * prb_payload, p, prb_payload);
    p += prb_payload;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// VLAN Ethernet framing — the reference's
// lib/ofh/ethernet/vlan_ethernet_frame_builder_impl.cpp:36-57 (dst MAC,
// src MAC, TPID 0x8100, TCI, ethertype) and
// vlan_ethernet_frame_decoder_impl.cpp:31-52 (NIC-stripped header parse with
// the 64-byte minimum-length drop rule; frames below it are rejected).
// The raw-socket/DPDK NIC send itself stays out of scope (no fronthaul NIC);
// this is the wire format so a transport can be plugged underneath.

namespace {
constexpr unsigned ETH_MIN_LEN = 64;
constexpr uint16_t VLAN_TPID = 0x8100;
} // namespace

// Header size of a VLAN-tagged frame (builder's get_header_size()).
unsigned ofh_eth_header_size() { return 6 + 6 + 4 + 2; }

// Build a VLAN-tagged Ethernet frame around payload, zero-padding to the
// 64-byte minimum like the reference's ethernet_frame_pool. Returns length.
unsigned ofh_eth_build(uint8_t* out, const uint8_t* dst, const uint8_t* src,
                       uint16_t tci, uint16_t eth_type,
                       const uint8_t* payload, unsigned payload_len)
{
  uint8_t* p = out;
  std::memcpy(p, dst, 6);
  p += 6;
  std::memcpy(p, src, 6);
  p += 6;
  put_u16(p, VLAN_TPID);
  p += 2;
  put_u16(p, tci);
  p += 2;
  put_u16(p, eth_type);
  p += 2;
  std::memcpy(p, payload, payload_len);
  p += payload_len;
  while (unsigned(p - out) < ETH_MIN_LEN) {
    *p++ = 0;
  }
  return unsigned(p - out);
}

// Parse an Ethernet frame. The reference decoder sees the VLAN tag already
// stripped by the NIC; loopback frames keep it — both are handled by the
// TPID check. Writes dst/src (6 bytes each), *tci (0xffff when untagged)
// and *eth_type; returns the payload byte offset, or -1 when the frame is
// below the 64-byte minimum (the reference's drop rule).
int ofh_eth_parse(const uint8_t* frame, unsigned frame_len, uint8_t* dst,
                  uint8_t* src, uint16_t* tci, uint16_t* eth_type)
{
  if (frame_len < ETH_MIN_LEN) {
    return -1;
  }
  std::memcpy(dst, frame, 6);
  std::memcpy(src, frame + 6, 6);
  const uint8_t* p = frame + 12;
  *tci = 0xffff;
  if (get_u16(p) == VLAN_TPID) {
    *tci = get_u16(p + 2);
    p += 4;
  }
  *eth_type = get_u16(p);
  p += 2;
  return int(p - frame);
}

} // extern "C"
