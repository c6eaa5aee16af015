// Lock-free single-producer single-consumer ring buffer for IQ samples.
//
// Native runtime counterpart of the reference's blocking_queue /
// rigtorp-SPSC circular buffers between baseband threads
// (srsRAN-5G-ER/include/srsran/adt/blocking_queue.h,
// lib/radio/zmq/* circular sample buffers): the IO threads exchange
// complex<float> samples with the Python/TPU side without locks on the
// hot path.
#pragma once

#include <atomic>
#include <complex>
#include <cstddef>
#include <cstring>
#include <vector>

namespace iqbridge {

using cf32 = std::complex<float>;

class SpscRing {
public:
  explicit SpscRing(std::size_t capacity)
      : buf_(capacity + 1), cap_(capacity + 1), head_(0), tail_(0) {}

  std::size_t capacity() const { return cap_ - 1; }

  std::size_t size() const {
    std::size_t h = head_.load(std::memory_order_acquire);
    std::size_t t = tail_.load(std::memory_order_acquire);
    return (h + cap_ - t) % cap_;
  }

  std::size_t free_space() const { return capacity() - size(); }

  // Producer: copy up to n samples; returns samples written.
  std::size_t write(const cf32* data, std::size_t n) {
    std::size_t h = head_.load(std::memory_order_relaxed);
    std::size_t t = tail_.load(std::memory_order_acquire);
    std::size_t free_n = (t + cap_ - h - 1) % cap_;
    if (n > free_n) n = free_n;
    std::size_t first = std::min(n, cap_ - h);
    std::memcpy(&buf_[h], data, first * sizeof(cf32));
    std::memcpy(&buf_[0], data + first, (n - first) * sizeof(cf32));
    head_.store((h + n) % cap_, std::memory_order_release);
    return n;
  }

  // Consumer: copy up to n samples out; returns samples read.
  std::size_t read(cf32* out, std::size_t n) {
    std::size_t t = tail_.load(std::memory_order_relaxed);
    std::size_t h = head_.load(std::memory_order_acquire);
    std::size_t avail = (h + cap_ - t) % cap_;
    if (n > avail) n = avail;
    std::size_t first = std::min(n, cap_ - t);
    std::memcpy(out, &buf_[t], first * sizeof(cf32));
    std::memcpy(out + first, &buf_[0], (n - first) * sizeof(cf32));
    tail_.store((t + n) % cap_, std::memory_order_release);
    return n;
  }

private:
  std::vector<cf32> buf_;
  std::size_t cap_;
  alignas(64) std::atomic<std::size_t> head_;
  alignas(64) std::atomic<std::size_t> tail_;
};

}  // namespace iqbridge
