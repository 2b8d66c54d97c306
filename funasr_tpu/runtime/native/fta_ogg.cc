/* Ogg container decode: .opus / .ogg(vorbis) -> mono float PCM.
 *
 * Role: the reference decodes container formats through ffmpeg
 * (funasr/utils/load_utils.py:28-48 fallback; runtime/onnxruntime
 * src/audio.cpp links ffmpeg).  No ffmpeg binary exists in this image, so
 * — following the FLAC/mp3 playbook in this directory — the container
 * layer is implemented here and the codec layer rides the SYSTEM codec
 * libraries, dlopen'd at first use:
 *
 * - Ogg page/packet demuxer (RFC 3533): written here, first logical
 *   stream, packets reassembled across lacing/page boundaries.  CRCs are
 *   not verified (hostile input cannot do worse than a failed decode).
 * - Opus (RFC 7845 Ogg mapping): system libopus via its fully OPAQUE
 *   decoder API (no struct layouts needed): decode at 48 kHz, pre-skip
 *   honored, channels averaged to mono.
 * - Vorbis: system libvorbisfile via ov_open_callbacks over an in-memory
 *   datasource; OggVorbis_File is caller-allocated so a zeroed
 *   over-allocation stands in for the (absent) headers; vorbis_info is
 *   read at its frozen-ABI offsets (version:int@0, channels:int@4,
 *   rate:long@8 — unchanged since libvorbis 1.0).
 *
 * Return codes: 0 ok; -1 codec library unavailable; -2 container parse
 * failure; -3 codec decode failure.  Output buffer is malloc'd; free with
 * fta_free_samples (fta_audio.cc).
 */

#include <dlfcn.h>
#include <stdint.h>
#include <string.h>

#include <cstdlib>
#include <vector>

namespace {

static uint32_t le32(const uint8_t *p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static uint16_t le16(const uint8_t *p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

/* ------------------------------------------------------------- Ogg demux */
static bool ogg_packets(const uint8_t *p, size_t len,
                        std::vector<std::vector<uint8_t>> &pkts) {
  size_t off = 0;
  std::vector<uint8_t> cur;
  uint32_t serial0 = 0;
  bool have_serial = false;
  while (off + 27 <= len) {
    if (memcmp(p + off, "OggS", 4) != 0) {
      off++; /* resync scan */
      continue;
    }
    if (p[off + 4] != 0) return false; /* stream structure version */
    uint8_t nsegs = p[off + 26];
    if (off + 27 + (size_t)nsegs > len) break;
    uint32_t serial = le32(p + off + 14);
    const uint8_t *lace = p + off + 27;
    size_t body = off + 27 + nsegs;
    size_t total = 0;
    for (int i = 0; i < nsegs; i++) total += lace[i];
    if (body + total > len) break;
    if (!have_serial) {
      serial0 = serial;
      have_serial = true;
    }
    if (serial == serial0) { /* first logical stream only */
      size_t pos = body;
      for (int i = 0; i < nsegs; i++) {
        cur.insert(cur.end(), p + pos, p + pos + lace[i]);
        pos += lace[i];
        if (lace[i] < 255) {
          pkts.push_back(cur);
          cur.clear();
        }
      }
    }
    off = body + total;
  }
  return !pkts.empty();
}

/* ------------------------------------------------------------------ opus */
typedef void OpusDecoderT;

struct OpusApi {
  OpusDecoderT *(*create)(int32_t, int, int *);
  int (*decode_float)(OpusDecoderT *, const unsigned char *, int32_t,
                      float *, int, int);
  void (*destroy)(OpusDecoderT *);
  bool ok = false;
};

static OpusApi *opus_api() {
  static OpusApi api;
  static bool tried = false;
  if (tried) return api.ok ? &api : nullptr;
  tried = true;
  void *h = dlopen("libopus.so.0", RTLD_NOW | RTLD_GLOBAL);
  if (!h) h = dlopen("libopus.so", RTLD_NOW | RTLD_GLOBAL);
  if (!h) return nullptr;
  api.create = (OpusDecoderT * (*)(int32_t, int, int *))
      dlsym(h, "opus_decoder_create");
  api.decode_float =
      (int (*)(OpusDecoderT *, const unsigned char *, int32_t, float *, int,
               int))dlsym(h, "opus_decode_float");
  api.destroy = (void (*)(OpusDecoderT *))dlsym(h, "opus_decoder_destroy");
  if (!api.create || !api.decode_float || !api.destroy) return nullptr;
  api.ok = true;
  return &api;
}

static int decode_opus(const std::vector<std::vector<uint8_t>> &pkts,
                       float **out, int64_t *n, int32_t *rate) {
  OpusApi *api = opus_api();
  if (!api) return -1;
  const std::vector<uint8_t> &head = pkts[0];
  if (head.size() < 19) return -2;
  int channels = head[9];
  if (channels < 1 || channels > 8) return -2;
  int preskip = le16(head.data() + 10);
  int err = 0;
  OpusDecoderT *dec = api->create(48000, channels, &err);
  if (!dec || err != 0) return -3;
  std::vector<float> pcm((size_t)5760 * channels);
  std::vector<float> mono;
  size_t i = 1;
  if (i < pkts.size() && pkts[i].size() >= 8 &&
      memcmp(pkts[i].data(), "OpusTags", 8) == 0)
    i++;
  for (; i < pkts.size(); i++) {
    if (pkts[i].empty()) continue;
    int got = api->decode_float(dec, pkts[i].data(), (int32_t)pkts[i].size(),
                                pcm.data(), 5760, 0);
    if (got < 0) { api->destroy(dec); return -3; }
    for (int s = 0; s < got; s++) {
      float acc = 0.f;
      for (int c = 0; c < channels; c++) acc += pcm[(size_t)s * channels + c];
      mono.push_back(acc / channels);
    }
  }
  api->destroy(dec);
  if ((size_t)preskip < mono.size())
    mono.erase(mono.begin(), mono.begin() + preskip);
  else
    mono.clear();
  *n = (int64_t)mono.size();
  *rate = 48000;
  *out = (float *)malloc(mono.size() * sizeof(float));
  if (!*out) return -3;
  memcpy(*out, mono.data(), mono.size() * sizeof(float));
  return 0;
}

/* ---------------------------------------------------------------- vorbis */
struct MemSrc {
  const uint8_t *p;
  size_t len;
  size_t pos;
};

static size_t vf_read(void *ptr, size_t size, size_t nmemb, void *src_) {
  MemSrc *src = (MemSrc *)src_;
  size_t want = size * nmemb;
  size_t have = src->len - src->pos;
  if (want > have) want = have;
  memcpy(ptr, src->p + src->pos, want);
  src->pos += want;
  return size ? want / size : 0;
}
static int vf_seek(void *src_, int64_t off, int whence) {
  MemSrc *src = (MemSrc *)src_;
  int64_t base = whence == 1 ? (int64_t)src->pos
                 : whence == 2 ? (int64_t)src->len
                               : 0;
  int64_t target = base + off;
  if (target < 0 || target > (int64_t)src->len) return -1;
  src->pos = (size_t)target;
  return 0;
}
static long vf_tell(void *src_) { return (long)((MemSrc *)src_)->pos; }

struct OvCallbacks {
  size_t (*read)(void *, size_t, size_t, void *);
  int (*seek)(void *, int64_t, int);
  int (*close)(void *);
  long (*tell)(void *);
};

struct VorbisApi {
  int (*open_cb)(void *, void *, const char *, long, OvCallbacks);
  void *(*info)(void *, int);
  long (*read_float)(void *, float ***, int, int *);
  int (*clear)(void *);
  bool ok = false;
};

static VorbisApi *vorbis_api() {
  static VorbisApi api;
  static bool tried = false;
  if (tried) return api.ok ? &api : nullptr;
  tried = true;
  /* libvorbisfile depends on libvorbis/libogg; load them global first */
  dlopen("libogg.so.0", RTLD_NOW | RTLD_GLOBAL);
  dlopen("libvorbis.so.0", RTLD_NOW | RTLD_GLOBAL);
  void *h = dlopen("libvorbisfile.so.3", RTLD_NOW | RTLD_GLOBAL);
  if (!h) h = dlopen("libvorbisfile.so", RTLD_NOW | RTLD_GLOBAL);
  if (!h) return nullptr;
  api.open_cb = (int (*)(void *, void *, const char *, long, OvCallbacks))
      dlsym(h, "ov_open_callbacks");
  api.info = (void *(*)(void *, int))dlsym(h, "ov_info");
  api.read_float = (long (*)(void *, float ***, int, int *))
      dlsym(h, "ov_read_float");
  api.clear = (int (*)(void *))dlsym(h, "ov_clear");
  if (!api.open_cb || !api.info || !api.read_float || !api.clear)
    return nullptr;
  api.ok = true;
  return &api;
}

static int decode_vorbis(const uint8_t *bytes, size_t len, float **out,
                         int64_t *n, int32_t *rate) {
  VorbisApi *api = vorbis_api();
  if (!api) return -1;
  MemSrc src{bytes, len, 0};
  /* OggVorbis_File is caller-allocated (~944 bytes on LP64); a zeroed
     over-allocation is ABI-safe because only the library touches it */
  std::vector<uint8_t> vf(4096, 0);
  OvCallbacks cbs{vf_read, vf_seek, nullptr, vf_tell};
  if (api->open_cb(&src, vf.data(), nullptr, 0, cbs) != 0) return -3;
  uint8_t *vi = (uint8_t *)api->info(vf.data(), -1);
  if (!vi) { api->clear(vf.data()); return -3; }
  int channels = *(int *)(vi + 4);       /* vorbis_info.channels */
  long vrate = *(long *)(vi + 8);        /* vorbis_info.rate */
  if (channels < 1 || channels > 8 || vrate < 8000 || vrate > 192000) {
    api->clear(vf.data());
    return -3;
  }
  std::vector<float> mono;
  for (;;) {
    float **pcm = nullptr;
    int bitstream = 0;
    long got = api->read_float(vf.data(), &pcm, 4096, &bitstream);
    if (got == 0) break;
    if (got < 0) { api->clear(vf.data()); return -3; }
    for (long s = 0; s < got; s++) {
      float acc = 0.f;
      for (int c = 0; c < channels; c++) acc += pcm[c][s];
      mono.push_back(acc / channels);
    }
  }
  api->clear(vf.data());
  *n = (int64_t)mono.size();
  *rate = (int32_t)vrate;
  *out = (float *)malloc(mono.size() * sizeof(float));
  if (!*out) return -3;
  memcpy(*out, mono.data(), mono.size() * sizeof(float));
  return 0;
}

}  // namespace

extern "C" {

int fta_ogg_opus_available(void) { return opus_api() != nullptr; }
int fta_ogg_vorbis_available(void) { return vorbis_api() != nullptr; }

int fta_ogg_decode(const uint8_t *bytes, size_t len, float **out_samples,
                   int64_t *out_n, int32_t *out_rate) {
  if (len < 27 || !out_samples || !out_n || !out_rate) return -2;
  std::vector<std::vector<uint8_t>> pkts;
  if (!ogg_packets(bytes, len, pkts)) return -2;
  const std::vector<uint8_t> &first = pkts[0];
  if (first.size() >= 8 && memcmp(first.data(), "OpusHead", 8) == 0)
    return decode_opus(pkts, out_samples, out_n, out_rate);
  if (first.size() >= 7 && first[0] == 1 &&
      memcmp(first.data() + 1, "vorbis", 6) == 0)
    return decode_vorbis(bytes, len, out_samples, out_n, out_rate);
  return -2;
}

}  /* extern "C" */
