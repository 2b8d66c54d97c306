/* funasr_tpu native audio runtime.
 *
 * Host-side byte-level hot path for serving: RIFF/WAVE decode, PCM
 * conversion, windowed-sinc resampling, and a streaming sample queue with a
 * global timeline.  TPU-native counterpart of the reference runtime's
 * runtime/onnxruntime/src/audio.cpp + src/resample.cpp (behavior, not a
 * translation: the reference couples these to its frame/decoder queues; here
 * the queue feeds fixed-size chunks to jitted device programs).
 */
#include "fta_audio.h"

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

inline uint32_t rd_u32(const uint8_t *p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
inline uint16_t rd_u16(const uint8_t *p) {
  return (uint16_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8));
}

}  // namespace

extern "C" {

void fta_pcm16_to_float(const int16_t *pcm, int64_t n, float *out) {
  constexpr float k = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = (float)pcm[i] * k;
}

int fta_wav_decode(const uint8_t *bytes, size_t len, float **out_samples,
                   int64_t *out_n, int32_t *out_rate) {
  if (len < 44 || memcmp(bytes, "RIFF", 4) != 0 ||
      memcmp(bytes + 8, "WAVE", 4) != 0)
    return 1;
  size_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t *data = nullptr;
  size_t data_len = 0;
  /* RIFF chunk walk: tolerate extra chunks (LIST, fact, bext...). */
  while (pos + 8 <= len) {
    const uint8_t *hdr = bytes + pos;
    uint32_t csz = rd_u32(hdr + 4);
    const uint8_t *body = hdr + 8;
    size_t avail = len - pos - 8;
    if (csz > avail) csz = (uint32_t)avail; /* truncated file: clamp */
    if (memcmp(hdr, "fmt ", 4) == 0 && csz >= 16) {
      fmt = rd_u16(body);
      channels = rd_u16(body + 2);
      rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (fmt == 0xFFFE && csz >= 40) /* WAVE_FORMAT_EXTENSIBLE */
        fmt = rd_u16(body + 24);
    } else if (memcmp(hdr, "data", 4) == 0) {
      data = body;
      data_len = csz;
    }
    pos += 8 + csz + (csz & 1); /* chunks are word-aligned */
  }
  if (!data || !channels || !rate) return 2;
  const bool is_float = (fmt == 3);
  if (!is_float && fmt != 1) return 3; /* PCM or IEEE float only */

  int64_t bytes_per = bits / 8;
  if (bytes_per == 0) return 3;
  int64_t n_frames = (int64_t)(data_len / (bytes_per * channels));
  float *out = (float *)malloc(sizeof(float) * (size_t)(n_frames ? n_frames : 1));
  if (!out) return 4;
  const float inv_ch = 1.0f / (float)channels;
  for (int64_t i = 0; i < n_frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < channels; ++c) {
      const uint8_t *s = data + (i * channels + c) * bytes_per;
      float v;
      if (is_float && bits == 32) {
        float f;
        memcpy(&f, s, 4);
        v = f;
      } else if (is_float && bits == 64) {
        double f;
        memcpy(&f, s, 8);
        v = (float)f;
      } else if (bits == 16) {
        v = (float)(int16_t)rd_u16(s) * (1.0f / 32768.0f);
      } else if (bits == 32) {
        v = (float)(int32_t)rd_u32(s) * (1.0f / 2147483648.0f);
      } else if (bits == 24) {
        int32_t u = (int32_t)((uint32_t)s[0] | ((uint32_t)s[1] << 8) |
                              ((uint32_t)s[2] << 16));
        if (u & 0x800000) u |= ~0xFFFFFF;
        v = (float)u * (1.0f / 8388608.0f);
      } else if (bits == 8) {
        v = ((float)s[0] - 128.0f) * (1.0f / 128.0f);
      } else {
        free(out);
        return 3;
      }
      acc += v;
    }
    out[i] = acc * inv_ch;
  }
  *out_samples = out;
  *out_n = n_frames;
  *out_rate = (int32_t)rate;
  return 0;
}

int64_t fta_resample_out_len(int64_t n, int32_t rate_in, int32_t rate_out) {
  if (rate_in <= 0 || rate_out <= 0) return -1;
  if (rate_in == rate_out) return n;
  return (int64_t)llround((double)n * rate_out / rate_in);
}

/* Windowed-sinc resampler (kaldi LinearResample semantics: lowpass cutoff
 * 0.99 * Nyquist of the lower rate, Hann window, num_zeros = 6). */
int64_t fta_resample(const float *x, int64_t n, int32_t rate_in,
                     int32_t rate_out, float **out) {
  int64_t n_out = fta_resample_out_len(n, rate_in, rate_out);
  if (n_out < 0) return -1;
  float *y = (float *)malloc(sizeof(float) * (size_t)(n_out ? n_out : 1));
  if (!y) return -1;
  if (rate_in == rate_out) {
    memcpy(y, x, sizeof(float) * (size_t)n);
    *out = y;
    return n_out;
  }
  const int num_zeros = 6;
  const double cutoff = 0.99 * 0.5 * (rate_in < rate_out ? rate_in : rate_out);
  const double window_width = num_zeros / (2.0 * cutoff); /* seconds */
  const double dt_in = 1.0 / rate_in;
  const double gain = 2.0 * cutoff / rate_in;
  for (int64_t j = 0; j < n_out; ++j) {
    const double t = (double)j / rate_out;
    int64_t i_lo = (int64_t)ceil((t - window_width) * rate_in);
    int64_t i_hi = (int64_t)floor((t + window_width) * rate_in);
    if (i_lo < 0) i_lo = 0;
    if (i_hi >= n) i_hi = n - 1;
    double acc = 0.0;
    for (int64_t i = i_lo; i <= i_hi; ++i) {
      const double dt = i * dt_in - t;
      /* Hann-windowed sinc, unity DC gain after * gain */
      double s;
      if (fabs(dt) < 1e-12) {
        s = 1.0;
      } else {
        const double a = 2.0 * cutoff * dt;
        s = sin(M_PI * a) / (M_PI * a);
      }
      const double w = 0.5 * (1.0 + cos(M_PI * dt / window_width));
      acc += (double)x[i] * s * w;
    }
    y[j] = (float)(acc * gain);
  }
  *out = y;
  return n_out;
}

/* ---- streaming queue ------------------------------------------------- */

struct fta_queue {
  std::vector<float> buf;
  size_t head = 0; /* index of first unpopped sample in buf */
  int64_t consumed = 0;
  int32_t rate = 16000;
};

fta_queue *fta_queue_new(int32_t rate) {
  fta_queue *q = new (std::nothrow) fta_queue();
  if (q) q->rate = rate > 0 ? rate : 16000;
  return q;
}

void fta_queue_free(fta_queue *q) { delete q; }

int fta_queue_push(fta_queue *q, const float *samples, int64_t n) {
  if (!q || n < 0) return -1;
  /* compact when the dead prefix dominates */
  if (q->head > 65536 && q->head * 2 > q->buf.size()) {
    q->buf.erase(q->buf.begin(), q->buf.begin() + (ptrdiff_t)q->head);
    q->head = 0;
  }
  q->buf.insert(q->buf.end(), samples, samples + n);
  return 0;
}

int fta_queue_push_pcm16(fta_queue *q, const uint8_t *bytes, size_t len) {
  if (!q) return -1;
  /* same dead-prefix compaction as fta_queue_push: streaming sessions feed
     exclusively through this path, so without it the buffer grows without
     bound (~230 MB/h of 16 kHz audio) */
  if (q->head > 65536 && q->head * 2 > q->buf.size()) {
    q->buf.erase(q->buf.begin(), q->buf.begin() + (ptrdiff_t)q->head);
    q->head = 0;
  }
  int64_t n = (int64_t)(len / 2);
  size_t old = q->buf.size();
  q->buf.resize(old + (size_t)n);
  constexpr float k = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) {
    int16_t v = (int16_t)((uint16_t)bytes[2 * i] |
                          ((uint16_t)bytes[2 * i + 1] << 8));
    q->buf[old + (size_t)i] = (float)v * k;
  }
  return 0;
}

int64_t fta_queue_available(const fta_queue *q) {
  return q ? (int64_t)(q->buf.size() - q->head) : 0;
}

int64_t fta_queue_pop(fta_queue *q, float *out, int64_t n) {
  if (!q || n <= 0) return 0;
  int64_t avail = fta_queue_available(q);
  int64_t take = n < avail ? n : avail;
  memcpy(out, q->buf.data() + q->head, sizeof(float) * (size_t)take);
  q->head += (size_t)take;
  q->consumed += take;
  return take;
}

double fta_queue_consumed_ms(const fta_queue *q) {
  if (!q) return 0.0;
  return 1000.0 * (double)q->consumed / (double)q->rate;
}

void fta_free(void *p) { free(p); }

}  /* extern "C" */

/* ---------------------------------------------------------------- mp3
 * MP3 decode via the system libmpg123 (dlopen'd at first use — the
 * reference closes the same gap by linking ffmpeg into its C++ runtime,
 * runtime/onnxruntime/src/audio.cpp).  Returns interleaved float mono
 * (channels averaged) and the sample rate.  -1: no libmpg123; -2: decode
 * error; 0: ok. */

#include <dlfcn.h>

namespace {

typedef void mpg123_handle_t;

struct Mpg123Api {
  int (*init)(void);
  mpg123_handle_t *(*make)(const char *, int *);
  void (*del)(mpg123_handle_t *);
  int (*open_feed)(mpg123_handle_t *);
  int (*feed)(mpg123_handle_t *, const unsigned char *, size_t);
  int (*read)(mpg123_handle_t *, unsigned char *, size_t, size_t *);
  int (*getformat)(mpg123_handle_t *, long *, int *, int *);
  int (*format_none)(mpg123_handle_t *);
  int (*format)(mpg123_handle_t *, long, int, int);
  bool ok = false;
};

Mpg123Api *mpg123_api() {
  static Mpg123Api api;
  static bool tried = false;
  if (tried) return api.ok ? &api : nullptr;
  tried = true;
  void *h = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_GLOBAL);
  if (!h) h = dlopen("libmpg123.so", RTLD_NOW | RTLD_GLOBAL);
  if (!h) return nullptr;
  api.init = (int (*)(void))dlsym(h, "mpg123_init");
  api.make = (mpg123_handle_t * (*)(const char *, int *))
      dlsym(h, "mpg123_new");
  api.del = (void (*)(mpg123_handle_t *))dlsym(h, "mpg123_delete");
  api.open_feed = (int (*)(mpg123_handle_t *))dlsym(h, "mpg123_open_feed");
  api.feed = (int (*)(mpg123_handle_t *, const unsigned char *, size_t))
      dlsym(h, "mpg123_feed");
  api.read = (int (*)(mpg123_handle_t *, unsigned char *, size_t, size_t *))
      dlsym(h, "mpg123_read");
  api.getformat = (int (*)(mpg123_handle_t *, long *, int *, int *))
      dlsym(h, "mpg123_getformat");
  api.format_none = (int (*)(mpg123_handle_t *))
      dlsym(h, "mpg123_format_none");
  api.format = (int (*)(mpg123_handle_t *, long, int, int))
      dlsym(h, "mpg123_format");
  if (!api.init || !api.make || !api.del || !api.open_feed || !api.feed ||
      !api.read || !api.getformat || !api.format_none || !api.format)
    return nullptr;
  if (api.init() != 0) return nullptr;
  api.ok = true;
  return &api;
}

constexpr int kMpgOk = 0;
constexpr int kMpgNeedMore = -10;
constexpr int kMpgNewFormat = -11;
constexpr int kMpgDone = -12;
constexpr int kEncSigned16 = 0xD0; /* MPG123_ENC_SIGNED_16 */

}  // namespace

extern "C" {

int fta_mp3_available(void) { return mpg123_api() != nullptr; }

int fta_mp3_decode(const uint8_t *bytes, size_t len, float **out_samples,
                   int64_t *out_n, int32_t *out_rate) {
  Mpg123Api *api = mpg123_api();
  if (!api) return -1;
  int err = 0;
  mpg123_handle_t *mh = api->make(nullptr, &err);
  if (!mh) return -2;
  if (api->open_feed(mh) != kMpgOk) { api->del(mh); return -2; }
  if (api->feed(mh, bytes, len) != kMpgOk) { api->del(mh); return -2; }

  std::vector<float> mono;
  long rate = 0;
  int channels = 1, enc = 0;
  std::vector<unsigned char> buf(65536);
  bool saw_format = false;
  for (;;) {
    size_t got = 0;
    int rc = api->read(mh, buf.data(), buf.size(), &got);
    if (rc == kMpgNewFormat) {
      api->getformat(mh, &rate, &channels, &enc);
      /* lock the output to s16 at the stream rate */
      api->format_none(mh);
      api->format(mh, rate, channels, kEncSigned16);
      saw_format = true;
      continue;
    }
    if (got > 0) {
      const int16_t *pcm = (const int16_t *)buf.data();
      size_t frames = got / 2 / (channels > 0 ? channels : 1);
      size_t base = mono.size();
      mono.resize(base + frames);
      for (size_t i = 0; i < frames; i++) {
        float acc = 0.f;
        for (int c = 0; c < channels; c++) acc += pcm[i * channels + c];
        mono[base + i] = acc / (32768.0f * channels);
      }
    }
    if (rc == kMpgDone || rc == kMpgNeedMore) break;
    if (rc != kMpgOk && got == 0) break;
  }
  api->del(mh);
  if (!saw_format || mono.empty()) return -2;
  float *out = (float *)malloc(mono.size() * sizeof(float));
  if (!out) return -2;
  memcpy(out, mono.data(), mono.size() * sizeof(float));
  *out_samples = out;
  *out_n = (int64_t)mono.size();
  *out_rate = (int32_t)rate;
  return 0;
}

}  /* extern "C" */
