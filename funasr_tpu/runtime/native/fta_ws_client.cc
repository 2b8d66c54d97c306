// fta_ws_client: native C++ websocket ASR client speaking the reference
// JSON protocol (runtime/docs/websocket_protocol.md — the role the
// reference's compiled clients fill, runtime/{java,csharp,golang}/).
//
// A second, independent implementation of the client side of the
// protocol: RFC 6455 client handshake + MASKED client frames (the
// asyncio/python client uses the `websockets` package; this one owns the
// bytes).  Usage as a CLI:
//
//   fta-ws-client <host> <port> <pcm16-file> [chunk_ms] [mode]
//
// streams the PCM in chunk_ms frames with mode offline|online|2pass and
// prints each JSON result line.  Also exposed as a C ABI for ctypes
// (fta_ws_client_run) so tests can drive it in-process.

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

int dial(const char *host, int port) {
  struct addrinfo hints = {}, *res = nullptr;
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  char ps[16];
  snprintf(ps, sizeof ps, "%d", port);
  if (getaddrinfo(host, ps, &hints, &res) != 0 || !res) return -1;
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd >= 0 && connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  return fd;
}

bool send_all(int fd, const char *p, size_t n) {
  while (n) {
    ssize_t w = send(fd, p, n, 0);
    if (w <= 0) return false;
    p += w;
    n -= (size_t)w;
  }
  return true;
}

// RFC 6455 client frame: FIN + opcode, MASK bit set, 4-byte masking key.
bool send_frame(int fd, int opcode, const uint8_t *data, size_t len,
                uint32_t &mask_state) {
  std::string hdr;
  hdr += char(0x80 | opcode);
  if (len < 126) {
    hdr += char(0x80 | (int)len);
  } else if (len < 65536) {
    hdr += char(0x80 | 126);
    hdr += char(len >> 8);
    hdr += char(len & 0xFF);
  } else {
    hdr += char(0x80 | 127);
    for (int i = 7; i >= 0; i--) hdr += char((uint64_t)len >> (8 * i));
  }
  // xorshift mask key (deterministic is fine: masking exists to defeat
  // proxy cache poisoning, not for secrecy)
  mask_state ^= mask_state << 13;
  mask_state ^= mask_state >> 17;
  mask_state ^= mask_state << 5;
  uint8_t key[4];
  memcpy(key, &mask_state, 4);
  hdr.append((const char *)key, 4);
  if (!send_all(fd, hdr.data(), hdr.size())) return false;
  std::vector<uint8_t> masked(len);
  for (size_t i = 0; i < len; i++) masked[i] = data[i] ^ key[i & 3];
  return send_all(fd, (const char *)masked.data(), len);
}

// read exactly n bytes
bool recv_all(int fd, uint8_t *p, size_t n) {
  while (n) {
    ssize_t r = recv(fd, p, n, 0);
    if (r <= 0) return false;
    p += r;
    n -= (size_t)r;
  }
  return true;
}

// one server frame (server frames are unmasked); handles ping inline.
// returns opcode, payload in out; -1 on error/close.
int recv_frame(int fd, std::string &out, uint32_t &mask_state) {
  for (;;) {
    uint8_t h[2];
    if (!recv_all(fd, h, 2)) return -1;
    int opcode = h[0] & 0x0F;
    uint64_t len = h[1] & 0x7F;
    if (len == 126) {
      uint8_t e[2];
      if (!recv_all(fd, e, 2)) return -1;
      len = ((uint64_t)e[0] << 8) | e[1];
    } else if (len == 127) {
      uint8_t e[8];
      if (!recv_all(fd, e, 8)) return -1;
      len = 0;
      for (int i = 0; i < 8; i++) len = (len << 8) | e[i];
    }
    std::vector<uint8_t> payload(len);
    if (len && !recv_all(fd, payload.data(), len)) return -1;
    if (opcode == 0x9) {  // ping -> pong
      send_frame(fd, 0xA, payload.data(), payload.size(), mask_state);
      continue;
    }
    if (opcode == 0x8) return -1;  // close
    out.assign((const char *)payload.data(), len);
    return opcode;
  }
}

bool handshake(int fd, const char *host, int port) {
  char req[512];
  snprintf(req, sizeof req,
           "GET / HTTP/1.1\r\n"
           "Host: %s:%d\r\n"
           "Upgrade: websocket\r\n"
           "Connection: Upgrade\r\n"
           "Sec-WebSocket-Key: MDEyMzQ1Njc4OWFiY2RlZg==\r\n"
           "Sec-WebSocket-Version: 13\r\n\r\n",
           host, port);
  if (!send_all(fd, req, strlen(req))) return false;
  std::string resp;
  char c;
  while (resp.find("\r\n\r\n") == std::string::npos) {
    if (recv(fd, &c, 1, 0) <= 0) return false;
    resp += c;
    if (resp.size() > 8192) return false;
  }
  return resp.find(" 101 ") != std::string::npos;
}

}  // namespace

extern "C" {

// Streams PCM16 over the protocol; calls on_result(json, userdata) for
// every server message.  Returns number of results, or <0 on error.
typedef void (*fta_ws_result_cb)(const char *json, void *userdata);

int fta_ws_client_run(const char *host, int port, const char *mode,
                      const uint8_t *pcm, int64_t pcm_len, int chunk_ms,
                      int audio_fs, fta_ws_result_cb cb, void *userdata) {
  int fd = dial(host, port);
  if (fd < 0) return -1;
  if (!handshake(fd, host, port)) {
    close(fd);
    return -2;
  }
  uint32_t mask_state = 0x9E3779B9u;
  char cfg[512];
  snprintf(cfg, sizeof cfg,
           "{\"mode\": \"%s\", \"wav_name\": \"fta\", \"is_speaking\": "
           "true, \"chunk_size\": [5, 10, 5], \"audio_fs\": %d, "
           "\"wav_format\": \"pcm\"}",
           mode, audio_fs);
  if (!send_frame(fd, 0x1, (const uint8_t *)cfg, strlen(cfg), mask_state)) {
    close(fd);
    return -3;
  }
  const int64_t chunk = (int64_t)audio_fs * chunk_ms / 1000 * 2;
  int results = 0;
  bool is_stream = strcmp(mode, "offline") != 0;
  for (int64_t off = 0; off < pcm_len; off += chunk) {
    int64_t n = pcm_len - off < chunk ? pcm_len - off : chunk;
    if (!send_frame(fd, 0x2, pcm + off, (size_t)n, mask_state)) {
      close(fd);
      return -3;
    }
    if (is_stream) {  // online/2pass: a partial may arrive per chunk
      // non-blocking-ish: rely on the server answering every chunk is
      // NOT part of the protocol, so only drain when data is ready
      struct timeval tv = {0, 1000};
      fd_set rf;
      FD_ZERO(&rf);
      FD_SET(fd, &rf);
      while (select(fd + 1, &rf, nullptr, nullptr, &tv) > 0) {
        std::string msg;
        if (recv_frame(fd, msg, mask_state) < 0) break;
        if (cb) cb(msg.c_str(), userdata);
        results++;
        FD_ZERO(&rf);
        FD_SET(fd, &rf);
        tv = {0, 0};
      }
    }
  }
  const char *fin = "{\"is_speaking\": false}";
  if (!send_frame(fd, 0x1, (const uint8_t *)fin, strlen(fin), mask_state)) {
    close(fd);
    return -3;
  }
  // final message(s): wait for is_final:true
  for (;;) {
    std::string msg;
    if (recv_frame(fd, msg, mask_state) < 0) break;
    if (cb) cb(msg.c_str(), userdata);
    results++;
    if (msg.find("\"is_final\": true") != std::string::npos ||
        msg.find("\"is_final\":true") != std::string::npos)
      break;
  }
  close(fd);
  return results;
}

}  // extern "C"

#ifdef FTA_WS_CLIENT_MAIN
static void print_cb(const char *json, void *) { printf("%s\n", json); }

int main(int argc, char **argv) {
  if (argc < 4) {
    fprintf(stderr,
            "usage: %s <host> <port> <pcm16-file> [chunk_ms] [mode]\n",
            argv[0]);
    return 2;
  }
  FILE *f = fopen(argv[3], "rb");
  if (!f) {
    perror("open");
    return 2;
  }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> pcm(n);
  if (fread(pcm.data(), 1, n, f) != (size_t)n) {
    fclose(f);
    return 2;
  }
  fclose(f);
  int chunk_ms = argc > 4 ? atoi(argv[4]) : 600;
  const char *mode = argc > 5 ? argv[5] : "offline";
  int rc = fta_ws_client_run(argv[1], atoi(argv[2]), mode, pcm.data(), n,
                             chunk_ms, 16000, print_cb, nullptr);
  return rc >= 0 ? 0 : 1;
}
#endif
