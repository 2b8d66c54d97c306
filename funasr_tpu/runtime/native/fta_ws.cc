// fta_ws: native WebSocket server transport (epoll + RFC6455).
//
// TPU-native equivalent of the reference's C++ websocket servers
// (runtime/websocket/bin/websocket-server-2pass.cpp built on
// asio/websocketpp): this library owns the sockets, the HTTP upgrade
// handshake, frame parsing/masking, fragmentation, ping/pong and close
// handling — the network layer stays native while the device loop (the
// jitted JAX programs) runs in the embedding Python process, which pumps
// events via fta_ws_poll()/fta_ws_next_event() and replies with
// fta_ws_send_*().
//
// C ABI only (bound via ctypes, no pybind11 in this environment).

#include <arpa/inet.h>
#include <errno.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <stdint.h>
#include <string.h>
#include <sys/epoll.h>
#include <sys/socket.h>
#include <unistd.h>

#include <deque>
#include <map>
#include <string>
#include <vector>

namespace {

// ------------------------------------------------------------------ SHA-1
// (RFC 3174; needed only for the Sec-WebSocket-Accept digest)
struct Sha1 {
  uint32_t h[5] = {0x67452301u, 0xEFCDAB89u, 0x98BADCFEu, 0x10325476u,
                   0xC3D2E1F0u};
  static uint32_t rol(uint32_t v, int s) { return (v << s) | (v >> (32 - s)); }
  void block(const uint8_t* p) {
    uint32_t w[80];
    for (int i = 0; i < 16; i++)
      w[i] = (uint32_t(p[4 * i]) << 24) | (uint32_t(p[4 * i + 1]) << 16) |
             (uint32_t(p[4 * i + 2]) << 8) | uint32_t(p[4 * i + 3]);
    for (int i = 16; i < 80; i++)
      w[i] = rol(w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16], 1);
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4];
    for (int i = 0; i < 80; i++) {
      uint32_t f, k;
      if (i < 20) { f = (b & c) | (~b & d); k = 0x5A827999u; }
      else if (i < 40) { f = b ^ c ^ d; k = 0x6ED9EBA1u; }
      else if (i < 60) { f = (b & c) | (b & d) | (c & d); k = 0x8F1BBCDCu; }
      else { f = b ^ c ^ d; k = 0xCA62C1D6u; }
      uint32_t t = rol(a, 5) + f + e + k + w[i];
      e = d; d = c; c = rol(b, 30); b = a; a = t;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d; h[4] += e;
  }
  void digest(const std::string& msg, uint8_t out[20]) {
    std::vector<uint8_t> m(msg.begin(), msg.end());
    uint64_t bits = uint64_t(m.size()) * 8;
    m.push_back(0x80);
    while (m.size() % 64 != 56) m.push_back(0);
    for (int i = 7; i >= 0; i--) m.push_back(uint8_t(bits >> (8 * i)));
    for (size_t i = 0; i < m.size(); i += 64) block(&m[i]);
    for (int i = 0; i < 5; i++) {
      out[4 * i] = uint8_t(h[i] >> 24);
      out[4 * i + 1] = uint8_t(h[i] >> 16);
      out[4 * i + 2] = uint8_t(h[i] >> 8);
      out[4 * i + 3] = uint8_t(h[i]);
    }
  }
};

std::string base64(const uint8_t* data, size_t n) {
  static const char* tab =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  std::string out;
  for (size_t i = 0; i < n; i += 3) {
    uint32_t v = uint32_t(data[i]) << 16;
    if (i + 1 < n) v |= uint32_t(data[i + 1]) << 8;
    if (i + 2 < n) v |= uint32_t(data[i + 2]);
    out += tab[(v >> 18) & 63];
    out += tab[(v >> 12) & 63];
    out += (i + 1 < n) ? tab[(v >> 6) & 63] : '=';
    out += (i + 2 < n) ? tab[v & 63] : '=';
  }
  return out;
}

constexpr const char* kGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11";
constexpr size_t kMaxMessage = 64u << 20;  // 64 MB (long audio uploads)

enum EvType { EV_OPEN = 1, EV_TEXT = 2, EV_BINARY = 3, EV_CLOSE = 4 };

struct Event {
  int64_t conn;
  int type;
  std::string payload;
};

struct Conn {
  int fd = -1;
  bool handshaken = false;
  std::string inbuf;         // raw bytes not yet parsed
  std::string outbuf;        // bytes pending write
  std::string fragments;     // fragmented-message accumulator
  int frag_opcode = 0;
  bool closing = false;
};

struct Server {
  int listen_fd = -1;
  int epfd = -1;
  int port = 0;
  int64_t next_id = 1;
  std::map<int64_t, Conn> conns;     // id -> conn
  std::map<int, int64_t> by_fd;      // fd -> id
  std::deque<Event> events;
  std::string last_payload;          // storage handed to ctypes caller

  void drop(int64_t id, bool emit_close) {
    auto it = conns.find(id);
    if (it == conns.end()) return;
    if (it->second.fd >= 0) {
      epoll_ctl(epfd, EPOLL_CTL_DEL, it->second.fd, nullptr);
      ::close(it->second.fd);
      by_fd.erase(it->second.fd);
    }
    conns.erase(it);
    if (emit_close) events.push_back({id, EV_CLOSE, std::string()});
  }

  void want_write(Conn& c, bool on) {
    epoll_event ev{};
    ev.events = EPOLLIN | (on ? EPOLLOUT : 0u);
    ev.data.fd = c.fd;
    epoll_ctl(epfd, EPOLL_CTL_MOD, c.fd, &ev);
  }

  bool flush(int64_t id) {
    auto it = conns.find(id);
    if (it == conns.end()) return false;
    Conn& c = it->second;
    while (!c.outbuf.empty()) {
      ssize_t n = ::send(c.fd, c.outbuf.data(), c.outbuf.size(),
                         MSG_NOSIGNAL);
      if (n > 0) {
        c.outbuf.erase(0, size_t(n));
      } else if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
        want_write(c, true);
        return true;
      } else {
        drop(id, true);
        return false;
      }
    }
    want_write(c, false);
    if (c.closing) drop(id, false);
    return true;
  }

  void enqueue_frame(Conn& c, int opcode, const char* data, size_t len) {
    std::string hdr;
    hdr += char(0x80 | opcode);  // FIN + opcode, no mask (server->client)
    if (len < 126) {
      hdr += char(len);
    } else if (len <= 0xFFFF) {
      hdr += char(126);
      hdr += char(len >> 8);
      hdr += char(len & 0xFF);
    } else {
      hdr += char(127);
      for (int i = 7; i >= 0; i--) hdr += char((uint64_t(len) >> (8 * i)) & 0xFF);
    }
    c.outbuf += hdr;
    c.outbuf.append(data, len);
  }

  // parse as many complete frames as possible from c.inbuf
  // returns false if the connection must be dropped
  bool parse_frames(int64_t id, Conn& c) {
    for (;;) {
      const uint8_t* p = reinterpret_cast<const uint8_t*>(c.inbuf.data());
      size_t avail = c.inbuf.size();
      if (avail < 2) return true;
      bool fin = p[0] & 0x80;
      int opcode = p[0] & 0x0F;
      bool masked = p[1] & 0x80;
      uint64_t len = p[1] & 0x7F;
      size_t off = 2;
      if (len == 126) {
        if (avail < 4) return true;
        len = (uint64_t(p[2]) << 8) | p[3];
        off = 4;
      } else if (len == 127) {
        if (avail < 10) return true;
        len = 0;
        for (int i = 0; i < 8; i++) len = (len << 8) | p[2 + i];
        off = 10;
      }
      if (len > kMaxMessage) return false;
      uint8_t mask[4] = {0, 0, 0, 0};
      if (masked) {
        if (avail < off + 4) return true;
        memcpy(mask, p + off, 4);
        off += 4;
      }
      if (avail < off + len) return true;
      std::string payload(c.inbuf.data() + off, len);
      if (masked)
        for (size_t i = 0; i < len; i++) payload[i] ^= char(mask[i & 3]);
      c.inbuf.erase(0, off + len);

      switch (opcode) {
        case 0x0:  // continuation
          c.fragments += payload;
          if (c.fragments.size() > kMaxMessage) return false;
          if (fin) {
            events.push_back({id, c.frag_opcode == 0x1 ? EV_TEXT : EV_BINARY,
                              std::move(c.fragments)});
            c.fragments.clear();
            c.frag_opcode = 0;
          }
          break;
        case 0x1:
        case 0x2:
          if (fin) {
            events.push_back({id, opcode == 0x1 ? EV_TEXT : EV_BINARY,
                              std::move(payload)});
          } else {
            c.frag_opcode = opcode;
            c.fragments = std::move(payload);
          }
          break;
        case 0x8:  // close: echo and tear down after flush
          enqueue_frame(c, 0x8, payload.data(),
                        payload.size() >= 2 ? 2 : 0);
          c.closing = true;
          events.push_back({id, EV_CLOSE, std::string()});
          flush(id);
          return true;
        case 0x9:  // ping -> pong
          enqueue_frame(c, 0xA, payload.data(), payload.size());
          break;
        case 0xA:  // pong: ignore
          break;
        default:
          return false;
      }
    }
  }

  bool handshake(int64_t id, Conn& c) {
    size_t end = c.inbuf.find("\r\n\r\n");
    if (end == std::string::npos)
      return c.inbuf.size() < 16384;  // wait for more (bounded)
    std::string req = c.inbuf.substr(0, end + 4);
    c.inbuf.erase(0, end + 4);
    // extract Sec-WebSocket-Key (case-insensitive header match)
    std::string low;
    low.reserve(req.size());
    for (char ch : req) low += char(tolower(ch));
    size_t kpos = low.find("sec-websocket-key:");
    if (kpos == std::string::npos) return false;
    size_t vbeg = req.find(':', kpos) + 1;
    size_t vend = req.find("\r\n", vbeg);
    std::string key = req.substr(vbeg, vend - vbeg);
    size_t a = key.find_first_not_of(" \t");
    size_t b = key.find_last_not_of(" \t");
    if (a == std::string::npos) return false;  // empty key: reject, don't
    key = key.substr(a, b - a + 1);            // throw across the C ABI

    uint8_t digest[20];
    Sha1().digest(key + kGuid, digest);
    std::string accept = base64(digest, 20);
    std::string resp =
        "HTTP/1.1 101 Switching Protocols\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        "Sec-WebSocket-Accept: " + accept + "\r\n\r\n";
    c.outbuf += resp;
    c.handshaken = true;
    events.push_back({id, EV_OPEN, std::string()});
    flush(id);
    return true;
  }

  void read_conn(int64_t id) {
    auto it = conns.find(id);
    if (it == conns.end()) return;
    Conn& c = it->second;
    char buf[65536];
    for (;;) {
      ssize_t n = ::recv(c.fd, buf, sizeof(buf), 0);
      if (n > 0) {
        c.inbuf.append(buf, size_t(n));
        if (c.inbuf.size() > kMaxMessage + 16384) { drop(id, true); return; }
      } else if (n == 0) {
        drop(id, true);
        return;
      } else if (errno == EAGAIN || errno == EWOULDBLOCK) {
        break;
      } else {
        drop(id, true);
        return;
      }
    }
    if (!c.handshaken) {
      if (!handshake(id, c)) { drop(id, true); return; }
      if (!c.handshaken) return;  // still waiting for full request
    }
    if (!parse_frames(id, c)) {
      drop(id, true);
      return;
    }
    // control-frame replies (pong/close echo) queued during parsing
    auto it2 = conns.find(id);
    if (it2 != conns.end() && !it2->second.outbuf.empty()) flush(id);
  }

  void accept_all() {
    for (;;) {
      int fd = ::accept(listen_fd, nullptr, nullptr);
      if (fd < 0) return;
      int fl = fcntl(fd, F_GETFL, 0);
      fcntl(fd, F_SETFL, fl | O_NONBLOCK);
      int one = 1;
      setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
      int64_t id = next_id++;
      Conn c;
      c.fd = fd;
      conns[id] = std::move(c);
      by_fd[fd] = id;
      epoll_event ev{};
      ev.events = EPOLLIN;
      ev.data.fd = fd;
      epoll_ctl(epfd, EPOLL_CTL_ADD, fd, &ev);
    }
  }
};

}  // namespace

extern "C" {

void* fta_ws_create(const char* host, int port) {
  int fd = ::socket(AF_INET, SOCK_STREAM | SOCK_NONBLOCK, 0);
  if (fd < 0) return nullptr;
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(uint16_t(port));
  addr.sin_addr.s_addr =
      (host && *host) ? inet_addr(host) : htonl(INADDR_ANY);
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0 ||
      listen(fd, 128) < 0) {
    ::close(fd);
    return nullptr;
  }
  socklen_t alen = sizeof(addr);
  getsockname(fd, reinterpret_cast<sockaddr*>(&addr), &alen);

  Server* s = new Server();
  s->listen_fd = fd;
  s->port = ntohs(addr.sin_port);
  s->epfd = epoll_create1(0);
  epoll_event ev{};
  ev.events = EPOLLIN;
  ev.data.fd = fd;
  epoll_ctl(s->epfd, EPOLL_CTL_ADD, fd, &ev);
  return s;
}

int fta_ws_port(void* h) { return static_cast<Server*>(h)->port; }

// Pump the event loop once; returns the number of queued app events.
int fta_ws_poll(void* h, int timeout_ms) {
  Server* s = static_cast<Server*>(h);
  if (!s->events.empty()) timeout_ms = 0;
  epoll_event evs[64];
  int n = epoll_wait(s->epfd, evs, 64, timeout_ms);
  for (int i = 0; i < n; i++) {
    int fd = evs[i].data.fd;
    if (fd == s->listen_fd) {
      s->accept_all();
      continue;
    }
    auto it = s->by_fd.find(fd);
    if (it == s->by_fd.end()) continue;
    int64_t id = it->second;
    if (evs[i].events & (EPOLLHUP | EPOLLERR)) {
      s->drop(id, true);
      continue;
    }
    if (evs[i].events & EPOLLOUT) s->flush(id);
    if (evs[i].events & EPOLLIN) s->read_conn(id);
  }
  return int(s->events.size());
}

// Pop one event. Returns payload length (>=0) or -1 when the queue is
// empty; the returned pointer stays valid until the next call.
const char* fta_ws_next_event(void* h, long long* conn, int* type,
                              int* len) {
  Server* s = static_cast<Server*>(h);
  if (s->events.empty()) {
    *len = -1;
    return nullptr;
  }
  Event& e = s->events.front();
  *conn = e.conn;
  *type = e.type;
  s->last_payload = std::move(e.payload);
  s->events.pop_front();
  *len = int(s->last_payload.size());
  return s->last_payload.data();
}

int fta_ws_send_text(void* h, long long conn, const char* data, int len) {
  Server* s = static_cast<Server*>(h);
  auto it = s->conns.find(conn);
  if (it == s->conns.end() || !it->second.handshaken) return -1;
  s->enqueue_frame(it->second, 0x1, data, size_t(len));
  return s->flush(conn) ? 0 : -1;
}

int fta_ws_send_binary(void* h, long long conn, const char* data, int len) {
  Server* s = static_cast<Server*>(h);
  auto it = s->conns.find(conn);
  if (it == s->conns.end() || !it->second.handshaken) return -1;
  s->enqueue_frame(it->second, 0x2, data, size_t(len));
  return s->flush(conn) ? 0 : -1;
}

void fta_ws_close(void* h, long long conn) {
  Server* s = static_cast<Server*>(h);
  auto it = s->conns.find(conn);
  if (it == s->conns.end()) return;
  s->enqueue_frame(it->second, 0x8, "\x03\xe8", 2);  // 1000 normal
  it->second.closing = true;
  s->flush(conn);
}

void fta_ws_destroy(void* h) {
  Server* s = static_cast<Server*>(h);
  for (auto& kv : s->conns)
    if (kv.second.fd >= 0) ::close(kv.second.fd);
  if (s->listen_fd >= 0) ::close(s->listen_fd);
  if (s->epfd >= 0) ::close(s->epfd);
  delete s;
}

}  // extern "C"
