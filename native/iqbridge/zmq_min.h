// Minimal libzmq C-ABI loader.
//
// The build image ships libzmq.so.5 without development headers, so the
// handful of functions the IQ bridge needs are declared here and resolved
// with dlopen/dlsym at runtime.  The declarations follow the stable libzmq
// C ABI (zmq.h).
#pragma once

#include <dlfcn.h>

#include <stdexcept>
#include <string>

namespace iqbridge {

struct ZmqApi {
  void* (*ctx_new)();
  int (*ctx_term)(void*);
  void* (*socket)(void*, int);
  int (*close)(void*);
  int (*bind)(void*, const char*);
  int (*connect)(void*, const char*);
  int (*setsockopt)(void*, int, const void*, size_t);
  int (*send)(void*, const void*, size_t, int);
  int (*recv)(void*, void*, size_t, int);
  int (*errno_fn)();

  static constexpr int REQ = 3;
  static constexpr int REP = 4;
  static constexpr int PUB = 1;
  static constexpr int SUB = 2;
  static constexpr int RCVTIMEO = 27;
  static constexpr int SNDTIMEO = 28;
  static constexpr int LINGER = 17;
  static constexpr int SUBSCRIBE = 6;
  static constexpr int CONFLATE = 54;
  static constexpr int DONTWAIT = 1;

  static ZmqApi& instance() {
    static ZmqApi api = load();
    return api;
  }

private:
  static ZmqApi load() {
    void* h = dlopen("libzmq.so.5", RTLD_NOW | RTLD_GLOBAL);
    if (!h) h = dlopen("libzmq.so", RTLD_NOW | RTLD_GLOBAL);
    if (!h) throw std::runtime_error("libzmq not found");
    ZmqApi a{};
    auto sym = [&](const char* n) {
      void* p = dlsym(h, n);
      if (!p) throw std::runtime_error(std::string("libzmq symbol missing: ") + n);
      return p;
    };
    a.ctx_new = reinterpret_cast<void* (*)()>(sym("zmq_ctx_new"));
    a.ctx_term = reinterpret_cast<int (*)(void*)>(sym("zmq_ctx_term"));
    a.socket = reinterpret_cast<void* (*)(void*, int)>(sym("zmq_socket"));
    a.close = reinterpret_cast<int (*)(void*)>(sym("zmq_close"));
    a.bind = reinterpret_cast<int (*)(void*, const char*)>(sym("zmq_bind"));
    a.connect = reinterpret_cast<int (*)(void*, const char*)>(sym("zmq_connect"));
    a.setsockopt = reinterpret_cast<int (*)(void*, int, const void*, size_t)>(
        sym("zmq_setsockopt"));
    a.send = reinterpret_cast<int (*)(void*, const void*, size_t, int)>(sym("zmq_send"));
    a.recv = reinterpret_cast<int (*)(void*, void*, size_t, int)>(sym("zmq_recv"));
    a.errno_fn = reinterpret_cast<int (*)()>(sym("zmq_errno"));
    return a;
  }
};

}  // namespace iqbridge
