// IQ sample bridge: native runtime between the TPU PHY and a ZMQ RF peer.
//
// Native counterpart of the reference's ZMQ radio
// (srsRAN-5G-ER/lib/radio/zmq/radio_zmq_tx_channel.cpp — a bound REP socket
// serving raw cf32 sample buffers on request — and radio_zmq_rx_channel.cpp —
// a REQ socket pulling samples), re-implemented as a small C++ runtime with
// SPSC rings toward the Python/TPU side and a C API for ctypes:
//
//   Python/TPU  --write-->  [tx ring]  --REP serve-->  GNU Radio / srsue
//   Python/TPU  <--read--   [rx ring]  <--REQ pull--   GNU Radio / srsue
//
// Also provides raw-cf32 file capture/replay used by the parity harness.

#include <atomic>
#include <chrono>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include "ring_buffer.h"
#include "zmq_min.h"

using iqbridge::cf32;
using iqbridge::SpscRing;
using iqbridge::ZmqApi;

namespace {

struct TxServer {
  SpscRing ring;
  std::thread thread;
  std::atomic<bool> stop{false};
  std::atomic<std::uint64_t> served{0};
  void* ctx = nullptr;
  void* sock = nullptr;
  unsigned chunk;

  TxServer(std::size_t ring_cap, unsigned chunk_samples)
      : ring(ring_cap), chunk(chunk_samples) {}
};

struct RxClient {
  SpscRing ring;
  std::thread thread;
  std::atomic<bool> stop{false};
  std::atomic<std::uint64_t> received{0};

  explicit RxClient(std::size_t ring_cap) : ring(ring_cap) {}
};

void tx_loop(TxServer* s, std::string addr) {
  auto& z = ZmqApi::instance();
  s->ctx = z.ctx_new();
  s->sock = z.socket(s->ctx, ZmqApi::REP);
  int timeout = 100;
  z.setsockopt(s->sock, ZmqApi::RCVTIMEO, &timeout, sizeof(timeout));
  z.setsockopt(s->sock, ZmqApi::SNDTIMEO, &timeout, sizeof(timeout));
  int linger = 0;
  z.setsockopt(s->sock, ZmqApi::LINGER, &linger, sizeof(linger));
  z.bind(s->sock, addr.c_str());

  std::vector<cf32> buf(s->chunk);
  while (!s->stop.load(std::memory_order_relaxed)) {
    char dummy[8];
    int n = z.recv(s->sock, dummy, sizeof(dummy), 0);
    if (n < 0) continue;  // timeout; poll stop flag
    // Serve one chunk; block (bounded) until the producer catches up.
    std::size_t got = 0;
    while (got < s->chunk && !s->stop.load(std::memory_order_relaxed)) {
      got += s->ring.read(buf.data() + got, s->chunk - got);
      if (got < s->chunk) std::this_thread::sleep_for(std::chrono::microseconds(50));
    }
    z.send(s->sock, buf.data(), got * sizeof(cf32), 0);
    s->served += got;
  }
  z.close(s->sock);
  z.ctx_term(s->ctx);
}

void rx_loop(RxClient* c, std::string addr, unsigned chunk) {
  auto& z = ZmqApi::instance();
  void* ctx = z.ctx_new();
  void* sock = z.socket(ctx, ZmqApi::REQ);
  int timeout = 100;
  z.setsockopt(sock, ZmqApi::RCVTIMEO, &timeout, sizeof(timeout));
  z.setsockopt(sock, ZmqApi::SNDTIMEO, &timeout, sizeof(timeout));
  int linger = 0;
  z.setsockopt(sock, ZmqApi::LINGER, &linger, sizeof(linger));
  z.connect(sock, addr.c_str());

  std::vector<cf32> buf(chunk * 4);
  bool awaiting_reply = false;
  while (!c->stop.load(std::memory_order_relaxed)) {
    if (!awaiting_reply) {
      if (z.send(sock, "", 0, 0) < 0) continue;
      awaiting_reply = true;
    }
    int n = z.recv(sock, buf.data(), buf.size() * sizeof(cf32), 0);
    if (n < 0) continue;  // timeout, retry recv (REQ state machine intact)
    awaiting_reply = false;
    std::size_t samples = static_cast<std::size_t>(n) / sizeof(cf32);
    std::size_t off = 0;
    while (off < samples && !c->stop.load(std::memory_order_relaxed)) {
      off += c->ring.write(buf.data() + off, samples - off);
      if (off < samples) std::this_thread::sleep_for(std::chrono::microseconds(50));
    }
    c->received += samples;
  }
  z.close(sock);
  z.ctx_term(ctx);
}

}  // namespace

extern "C" {

// ---- plain SPSC ring (host-side staging for the TPU process) ----

void* iq_ring_create(std::size_t capacity) { return new SpscRing(capacity); }
void iq_ring_destroy(void* r) { delete static_cast<SpscRing*>(r); }
std::size_t iq_ring_write(void* r, const float* interleaved, std::size_t nsamples) {
  return static_cast<SpscRing*>(r)->write(
      reinterpret_cast<const cf32*>(interleaved), nsamples);
}
std::size_t iq_ring_read(void* r, float* interleaved, std::size_t nsamples) {
  return static_cast<SpscRing*>(r)->read(reinterpret_cast<cf32*>(interleaved),
                                         nsamples);
}
std::size_t iq_ring_size(void* r) { return static_cast<SpscRing*>(r)->size(); }

// ---- ZMQ TX server (reference radio_zmq_tx_channel counterpart) ----

void* iq_tx_server_start(const char* addr, std::size_t ring_cap, unsigned chunk) {
  auto* s = new TxServer(ring_cap, chunk);
  s->thread = std::thread(tx_loop, s, std::string(addr));
  return s;
}
std::size_t iq_tx_server_push(void* h, const float* interleaved, std::size_t n) {
  return static_cast<TxServer*>(h)->ring.write(
      reinterpret_cast<const cf32*>(interleaved), n);
}
std::uint64_t iq_tx_server_served(void* h) {
  return static_cast<TxServer*>(h)->served.load();
}
void iq_tx_server_stop(void* h) {
  auto* s = static_cast<TxServer*>(h);
  s->stop = true;
  if (s->thread.joinable()) s->thread.join();
  delete s;
}

// ---- ZMQ RX client (reference radio_zmq_rx_channel counterpart) ----

void* iq_rx_client_start(const char* addr, std::size_t ring_cap, unsigned chunk) {
  auto* c = new RxClient(ring_cap);
  c->thread = std::thread(rx_loop, c, std::string(addr), chunk);
  return c;
}
std::size_t iq_rx_client_pull(void* h, float* interleaved, std::size_t n) {
  return static_cast<RxClient*>(h)->ring.read(reinterpret_cast<cf32*>(interleaved), n);
}
std::uint64_t iq_rx_client_received(void* h) {
  return static_cast<RxClient*>(h)->received.load();
}
void iq_rx_client_stop(void* h) {
  auto* c = static_cast<RxClient*>(h);
  c->stop = true;
  if (c->thread.joinable()) c->thread.join();
  delete c;
}

// ---- raw cf32 file capture/replay (parity harness) ----

std::size_t iq_file_write(const char* path, const float* interleaved,
                          std::size_t nsamples) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return 0;
  std::size_t n = std::fwrite(interleaved, sizeof(cf32), nsamples, f);
  std::fclose(f);
  return n;
}
std::size_t iq_file_read(const char* path, float* interleaved,
                         std::size_t max_samples) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return 0;
  std::size_t n = std::fread(interleaved, sizeof(cf32), max_samples, f);
  std::fclose(f);
  return n;
}

}  // extern "C"
