/* Native FLAC decoder (subset-complete) for the audio runtime.
 *
 * The reference handles flac via ffmpeg (funasr/utils/load_utils.py:28);
 * this image has no ffmpeg/libFLAC, so — like the mp3 path closed with
 * dlopen'd libmpg123 — flac is closed with a self-contained decoder:
 * STREAMINFO parsing, frame headers (all block-size/sample-rate/sample-
 * size codes, UTF-8 frame numbers), subframes CONSTANT / VERBATIM /
 * FIXED(0-4) / LPC(1-32) with wasted bits, Rice/Rice2 residual
 * partitions (incl. escape partitions), and left-side / right-side /
 * mid-side stereo decorrelation.  Output is mono float32 (channel
 * average), matching fta_mp3_decode's contract.
 *
 * CRCs are not verified (decode-oriented; the md5 in STREAMINFO is
 * likewise ignored), matching the tolerant posture of the wav reader.
 */

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t *data;
  size_t len;
  size_t pos = 0;   /* byte position */
  int bit = 0;      /* bit position within byte (0 = MSB) */
  bool fail = false;

  BitReader(const uint8_t *d, size_t n) : data(d), len(n) {}

  bool eof() const { return pos >= len; }

  uint32_t bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) {
      if (pos >= len) { fail = true; return 0; }
      v = (v << 1) | ((data[pos] >> (7 - bit)) & 1u);
      if (++bit == 8) { bit = 0; pos++; }
    }
    return v;
  }

  uint64_t bits64(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; i++) {
      if (pos >= len) { fail = true; return 0; }
      v = (v << 1) | ((data[pos] >> (7 - bit)) & 1u);
      if (++bit == 8) { bit = 0; pos++; }
    }
    return v;
  }

  int64_t sbits(int n) {
    uint64_t v = bits64(n);
    if (n == 0) return 0;
    if (v & (1ull << (n - 1))) return (int64_t)(v - (1ull << n));
    return (int64_t)v;
  }

  uint32_t unary() {  /* count of 0 bits before the terminating 1 */
    uint32_t q = 0;
    for (;;) {
      if (pos >= len) { fail = true; return 0; }
      if ((data[pos] >> (7 - bit)) & 1u) {
        if (++bit == 8) { bit = 0; pos++; }
        return q;
      }
      q++;
      if (++bit == 8) { bit = 0; pos++; }
    }
  }

  void align() { if (bit) { bit = 0; pos++; } }
};

/* UTF-8-style coded number in frame headers (up to 36 bits) */
uint64_t read_utf8(BitReader &br) {
  uint32_t b0 = br.bits(8);
  if (b0 < 0x80) return b0;
  int n = 0;
  uint64_t v = 0;
  if ((b0 & 0xE0) == 0xC0) { n = 1; v = b0 & 0x1F; }
  else if ((b0 & 0xF0) == 0xE0) { n = 2; v = b0 & 0x0F; }
  else if ((b0 & 0xF8) == 0xF0) { n = 3; v = b0 & 0x07; }
  else if ((b0 & 0xFC) == 0xF8) { n = 4; v = b0 & 0x03; }
  else if ((b0 & 0xFE) == 0xFC) { n = 5; v = b0 & 0x01; }
  else if (b0 == 0xFE) { n = 6; v = 0; }
  else { br.fail = true; return 0; }
  for (int i = 0; i < n; i++) v = (v << 6) | (br.bits(8) & 0x3F);
  return v;
}

bool read_residual(BitReader &br, int order, int blocksize,
                   std::vector<int64_t> &res) {
  uint32_t method = br.bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 15 : 31;
  uint32_t porder = br.bits(4);
  uint32_t nparts = 1u << porder;
  if (blocksize % nparts) return false;
  int idx = order;
  for (uint32_t p = 0; p < nparts; p++) {
    int count = (int)(blocksize >> porder) - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = br.bits(plen);
    if (param == escape) {
      uint32_t raw = br.bits(5);
      for (int i = 0; i < count; i++) res[idx++] = br.sbits((int)raw);
    } else {
      for (int i = 0; i < count; i++) {
        uint64_t q = br.unary();
        uint64_t v = (q << param) | br.bits64((int)param);
        res[idx++] = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
      }
    }
    if (br.fail) return false;
  }
  return true;
}

bool decode_subframe(BitReader &br, int blocksize, int bps,
                     std::vector<int64_t> &out) {
  if (br.bits(1) != 0) return false;  /* mandatory zero pad bit */
  uint32_t type = br.bits(6);
  int wasted = 0;
  if (br.bits(1)) wasted = (int)br.unary() + 1;
  /* hostile-input guard: wasted >= bps would make sbits() width <= 0 and
     the final `out[i] <<= wasted` a UB shift (server-reachable input) */
  if (wasted >= bps || wasted >= 64) return false;
  bps -= wasted;
  out.assign(blocksize, 0);

  if (type == 0) {                               /* CONSTANT */
    int64_t v = br.sbits(bps);
    for (int i = 0; i < blocksize; i++) out[i] = v;
  } else if (type == 1) {                        /* VERBATIM */
    for (int i = 0; i < blocksize; i++) out[i] = br.sbits(bps);
  } else if (type >= 8 && type <= 12) {          /* FIXED 0-4 */
    int order = (int)type - 8;
    for (int i = 0; i < order; i++) out[i] = br.sbits(bps);
    if (!read_residual(br, order, blocksize, out)) return false;
    for (int i = order; i < blocksize; i++) {
      switch (order) {
        case 0: break;
        case 1: out[i] += out[i - 1]; break;
        case 2: out[i] += 2 * out[i - 1] - out[i - 2]; break;
        case 3: out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
                break;
        case 4: out[i] += 4 * out[i - 1] - 6 * out[i - 2]
                          + 4 * out[i - 3] - out[i - 4]; break;
      }
    }
  } else if (type >= 32) {                       /* LPC 1-32 */
    int order = (int)type - 31;
    for (int i = 0; i < order; i++) out[i] = br.sbits(bps);
    uint32_t prec = br.bits(4);
    if (prec == 15) return false;
    prec += 1;
    int shift = (int)br.sbits(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; i++) coef[i] = br.sbits((int)prec);
    if (!read_residual(br, order, blocksize, out)) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t acc = 0;
      for (int j = 0; j < order; j++) acc += coef[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (br.fail) return false;
  if (wasted)
    for (int i = 0; i < blocksize; i++) out[i] <<= wasted;
  return true;
}

}  // namespace

extern "C" {

/* FLAC bytes -> malloc'd mono float32.  Returns 0 on success, negative
 * on parse failure.  Caller frees with fta_free. */
int fta_flac_decode(const uint8_t *bytes, size_t len, float **out_samples,
                    int64_t *out_n, int32_t *out_rate) {
  if (len < 42 || memcmp(bytes, "fLaC", 4) != 0) return -2;
  BitReader br(bytes, len);
  br.pos = 4;

  /* ---- metadata blocks; STREAMINFO is mandatory and first */
  uint32_t sample_rate = 0;
  int channels = 0, bps = 0;
  uint64_t total = 0;
  bool last = false, have_info = false;
  while (!last) {
    last = br.bits(1);
    uint32_t btype = br.bits(7);
    uint32_t blen = br.bits(24);
    if (br.fail) return -2;
    if (btype == 0 && blen >= 34) {
      br.bits(16); br.bits(16);          /* min/max blocksize */
      br.bits(24); br.bits(24);          /* min/max framesize */
      sample_rate = br.bits(20);
      channels = (int)br.bits(3) + 1;
      bps = (int)br.bits(5) + 1;
      total = br.bits64(36);
      br.pos += 16;                       /* md5 */
      have_info = true;
      if (blen > 34) br.pos += blen - 34;
    } else {
      br.pos += blen;
    }
    if (br.pos > br.len) return -2;
  }
  if (!have_info || sample_rate == 0 || channels < 1 || channels > 8)
    return -2;

  std::vector<double> mono;
  if (total) mono.reserve((size_t)total);
  std::vector<std::vector<int64_t>> ch(channels);

  /* ---- frames */
  while (!br.eof() && !br.fail) {
    if (br.len - br.pos < 4) break;
    uint32_t sync = br.bits(14);
    if (br.fail) break;
    if (sync != 0x3FFE) return -3;
    br.bits(1);                           /* reserved */
    br.bits(1);                           /* blocking strategy */
    uint32_t bs_code = br.bits(4);
    uint32_t sr_code = br.bits(4);
    uint32_t ch_asgn = br.bits(4);
    uint32_t ss_code = br.bits(3);
    br.bits(1);                           /* reserved */
    read_utf8(br);                        /* frame/sample number */

    int blocksize;
    switch (bs_code) {
      case 0: return -3;
      case 1: blocksize = 192; break;
      case 6: blocksize = (int)br.bits(8) + 1; break;
      case 7: blocksize = (int)br.bits(16) + 1; break;
      default:
        blocksize = bs_code <= 5 ? 576 << (bs_code - 2)
                                 : 256 << (bs_code - 8);
    }
    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);
    else if (sr_code == 15) return -3;

    int fbps = bps;
    switch (ss_code) {
      case 0: fbps = bps; break;
      case 1: fbps = 8; break;
      case 2: fbps = 12; break;
      case 4: fbps = 16; break;
      case 5: fbps = 20; break;
      case 6: fbps = 24; break;
      case 7: fbps = 32; break;
      default: return -3;
    }
    br.bits(8);                           /* header CRC-8 */
    if (br.fail) break;

    int nch;
    if (ch_asgn >= 8 && ch_asgn <= 10) nch = 2;
    else if (ch_asgn > 10) return -3;
    else nch = (int)ch_asgn + 1;
    if (nch != channels) return -3;

    for (int c = 0; c < nch; c++) {
      int cbps = fbps;
      /* the SIDE channel carries one extra bit */
      if ((ch_asgn == 8 && c == 1) || (ch_asgn == 9 && c == 0) ||
          (ch_asgn == 10 && c == 1))
        cbps += 1;
      if (!decode_subframe(br, blocksize, cbps, ch[c])) return -3;
    }
    br.align();
    br.bits(16);                          /* frame CRC-16 */
    if (br.fail) break;

    /* stereo decorrelation */
    if (ch_asgn == 8) {                   /* left/side */
      for (int i = 0; i < blocksize; i++)
        ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ch_asgn == 9) {            /* right/side: ch0=side,ch1=right */
      for (int i = 0; i < blocksize; i++)
        ch[0][i] = ch[1][i] + ch[0][i];
    } else if (ch_asgn == 10) {           /* mid/side */
      for (int i = 0; i < blocksize; i++) {
        int64_t side = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    double scale = 1.0 / ((double)((uint64_t)1 << (fbps - 1)) * nch);
    for (int i = 0; i < blocksize; i++) {
      double acc = 0.0;
      for (int c = 0; c < nch; c++) acc += (double)ch[c][i];
      mono.push_back(acc * scale);
    }
    if (total && mono.size() >= total) break;
  }

  if (mono.empty()) return -3;
  if (total && mono.size() > total) mono.resize((size_t)total);
  float *out = (float *)malloc(mono.size() * sizeof(float));
  if (!out) return -2;
  for (size_t i = 0; i < mono.size(); i++) out[i] = (float)mono[i];
  *out_samples = out;
  *out_n = (int64_t)mono.size();
  *out_rate = (int32_t)sample_rate;
  return 0;
}

}  /* extern "C" */
