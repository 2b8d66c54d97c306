// Native VAD endpoint state machine (reference implements this natively for
// its serving runtime: runtime/onnxruntime/src/e2e-vad.h).  Semantics match
// funasr_tpu/models/fsmn_vad/model.py VadStateMachine exactly (which is the
// reference-parity implementation): a sliding majority-vote window over
// per-10ms frame states derived from silence posteriors + decibels, with
// lookback/lookahead extension and max-segment splitting.  The FSMN scorer
// stays on the TPU; this is the host-side per-frame control flow, where C++
// removes the Python interpreter from the long-audio serving path.
//
// C ABI (bound via ctypes, see funasr_tpu/runtime/native_vad.py):
//   fta_vad_create(opts double[16]) -> handle
//   fta_vad_feed(handle, sil_probs, decibels, n, is_final)
//   fta_vad_pop(handle, streaming, out, cap) -> n_segments (pairs in out)
//   fta_vad_destroy(handle)

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr int SIL = 0;
constexpr int SPEECH = 1;
constexpr int NOT_DETECTED = 0;
constexpr int IN_SEGMENT = 1;
constexpr int END_DETECTED = 2;

struct Options {
  int detect_mode = 1;
  int max_end_silence_time = 800;
  int max_start_silence_time = 3000;
  int window_size_ms = 200;
  int sil_to_speech_time_thres = 150;
  int speech_to_sil_time_thres = 150;
  double speech_2_noise_ratio = 1.0;
  int do_extend = 1;
  int lookback_time_start_point = 200;
  int lookahead_time_end_point = 100;
  int max_single_segment_time = 60000;
  int noise_frame_num_used_for_snr = 100;
  double decibel_thres = -100.0;
  double snr_thres = -100.0;
  double speech_noise_thres = 0.6;
  int frame_in_ms = 10;
};

struct Segment {
  int64_t start_ms;
  int64_t end_ms;
  bool has_start;
  bool has_end;
};

class Window {
 public:
  void init(int window_ms, int s2sp_ms, int sp2s_ms, int frame_ms) {
    win_size_ = window_ms / frame_ms;
    sil2speech_cnt_ = s2sp_ms / frame_ms;
    speech2sil_cnt_ = sp2s_ms / frame_ms;
    reset();
  }
  void reset() {
    win_.assign(win_size_, 0);
    pos_ = 0;
    win_sum_ = 0;
    pre_state_ = SIL;
  }
  int win_size() const { return win_size_; }
  // 0=sil2sil 1=sil2speech 2=speech2sil 3=speech2speech
  int detect(int frame_state) {
    win_sum_ += frame_state - win_[pos_];
    win_[pos_] = frame_state;
    pos_ = (pos_ + 1) % win_size_;
    if (pre_state_ == SIL && win_sum_ >= sil2speech_cnt_) {
      pre_state_ = SPEECH;
      return 1;
    }
    if (pre_state_ == SPEECH && win_sum_ <= speech2sil_cnt_) {
      pre_state_ = SIL;
      return 2;
    }
    return pre_state_ == SIL ? 0 : 3;
  }

 private:
  std::vector<int> win_;
  int win_size_ = 20;
  int sil2speech_cnt_ = 15;
  int speech2sil_cnt_ = 15;
  int pos_ = 0;
  int win_sum_ = 0;
  int pre_state_ = SIL;
};

class Vad {
 public:
  explicit Vad(const Options& o) : o_(o) {
    window_.init(o.window_size_ms, o.sil_to_speech_time_thres,
                 o.speech_to_sil_time_thres, o.frame_in_ms);
  }

  void feed(const double* sil_probs, const double* decibels, int n,
            bool is_final) {
    for (int j = 0; j < n; ++j) {
      int t = frm_cnt_++;
      int fs = frame_state(sil_probs[j], decibels[j]);
      // reference quirk (GetFrameState, model.py:500): sub-threshold
      // frames advance the window twice; mirrored by the Python machine
      if (decibels[j] < o_.decibel_thres)
        detect_one_frame(fs, t, false);
      detect_one_frame(fs, t, is_final && j == n - 1);
    }
  }

  int pop(bool streaming, int64_t* out, int cap) {
    int n = 0;
    for (size_t i = out_offset_; i < segments_.size();) {
      Segment& seg = segments_[i];
      if (streaming) {
        if (!seg.has_start) break;
        if (!next_seg_ && !seg.has_end) break;
        int64_t start = next_seg_ ? seg.start_ms : -1;
        if (seg.has_end) {
          if (n >= cap) break;
          out[2 * n] = start;
          out[2 * n + 1] = seg.end_ms;
          ++n;
          next_seg_ = true;
          ++out_offset_;
          ++i;
        } else {
          if (n >= cap) break;
          out[2 * n] = start;
          out[2 * n + 1] = -1;
          ++n;
          next_seg_ = false;
          ++i;
        }
      } else {
        if (!(seg.has_start && seg.has_end)) break;
        if (n >= cap) break;
        out[2 * n] = seg.start_ms;
        out[2 * n + 1] = seg.end_ms;
        ++n;
        ++out_offset_;
        ++i;
      }
    }
    return n;
  }

 private:
  int latency_frames() const {
    int lat = window_.win_size();
    if (o_.do_extend) lat += o_.lookback_time_start_point / o_.frame_in_ms;
    return lat;
  }

  int frame_state(double sil_prob, double cur_db) {
    if (cur_db < o_.decibel_thres) return SIL;
    double p = sil_prob;
    if (p < 1e-10) p = 1e-10;
    if (p > 1.0 - 1e-10) p = 1.0 - 1e-10;
    double noise_prob = std::log(p) * o_.speech_2_noise_ratio;
    double speech_prob = std::log(1.0 - p);
    if (std::exp(speech_prob) >= std::exp(noise_prob) + o_.speech_noise_thres) {
      double cur_snr = cur_db - noise_average_decibel_;
      if (cur_snr >= o_.snr_thres) return SPEECH;
      return SIL;
    }
    if (noise_average_decibel_ < -99.9) {
      noise_average_decibel_ = cur_db;
    } else {
      double nn = o_.noise_frame_num_used_for_snr;
      noise_average_decibel_ =
          (cur_db + noise_average_decibel_ * (nn - 1.0)) / nn;
    }
    return SIL;
  }

  void seg_append_frame(int frame) {
    latest_confirmed_speech_ = frame;
    segments_.back().end_ms =
        static_cast<int64_t>(frame + 1) * o_.frame_in_ms;
    data_buf_start_frame_ = frame + 1;
  }

  void on_voice_start(int start_frame, bool fake) {
    if (confirmed_start_ == -1) confirmed_start_ = start_frame;
    if (!fake && machine_ == NOT_DETECTED) {
      Segment seg;
      seg.start_ms = static_cast<int64_t>(start_frame) * o_.frame_in_ms;
      seg.end_ms = static_cast<int64_t>(start_frame + 1) * o_.frame_in_ms;
      seg.has_start = true;
      seg.has_end = false;
      segments_.push_back(seg);
      data_buf_start_frame_ = start_frame + 1;
    }
  }

  void on_voice_end(int end_frame, bool fake) {
    for (int t = latest_confirmed_speech_ + 1; t < end_frame; ++t)
      seg_append_frame(t);
    if (!fake && !segments_.empty()) {
      seg_append_frame(end_frame);
      segments_.back().has_end = true;
    }
    ++number_end_detected_;
  }

  void reset_detection() {
    continuous_silence_ = 0;
    latest_confirmed_speech_ = 0;
    confirmed_start_ = -1;
    machine_ = NOT_DETECTED;
    window_.reset();
  }

  void end_and_close(int t, bool is_last) {
    (void)is_last;
    on_voice_end(t, false);
    machine_ = END_DETECTED;
  }

  void detect_one_frame(int frame_state, int t, bool is_final_frame) {
    int change = window_.detect(frame_state);
    int max_seg_frames = o_.max_single_segment_time / o_.frame_in_ms;
    if (change == 1) {  // sil2speech
      continuous_silence_ = 0;
      if (machine_ == NOT_DETECTED) {
        int start = data_buf_start_frame_;
        int lb = t - latency_frames();
        if (lb > start) start = lb;
        on_voice_start(start, false);
        machine_ = IN_SEGMENT;
        for (int tt = start + 1; tt <= t; ++tt) seg_append_frame(tt);
      } else if (machine_ == IN_SEGMENT) {
        for (int tt = latest_confirmed_speech_ + 1; tt < t; ++tt)
          seg_append_frame(tt);
        if (t - confirmed_start_ + 1 > max_seg_frames) {
          end_and_close(t, false);
        } else if (!is_final_frame) {
          seg_append_frame(t);
        } else {
          end_and_close(t, true);
        }
      }
    } else if (change == 2 || change == 3) {  // speech2sil / speech2speech
      continuous_silence_ = 0;
      if (machine_ == IN_SEGMENT) {
        if (t - confirmed_start_ + 1 > max_seg_frames) {
          end_and_close(t, false);
        } else if (!is_final_frame) {
          seg_append_frame(t);
        } else {
          end_and_close(t, true);
        }
      }
    } else {  // sil2sil
      ++continuous_silence_;
      if (machine_ == NOT_DETECTED) {
        bool single = o_.detect_mode == 0;
        if ((single && continuous_silence_ * o_.frame_in_ms >
                           o_.max_start_silence_time) ||
            (is_final_frame && number_end_detected_ == 0)) {
          on_voice_start(0, true);
          on_voice_end(0, true);
          machine_ = END_DETECTED;
        } else if (t >= latency_frames()) {
          int lcs = t - latency_frames();
          if (lcs > data_buf_start_frame_) data_buf_start_frame_ = lcs;
        }
      } else if (machine_ == IN_SEGMENT) {
        int max_end_sil =
            o_.max_end_silence_time - o_.speech_to_sil_time_thres;
        if (continuous_silence_ * o_.frame_in_ms >= max_end_sil) {
          int lookback = max_end_sil / o_.frame_in_ms;
          if (o_.do_extend) {
            lookback -= o_.lookahead_time_end_point / o_.frame_in_ms;
            lookback -= 1;
            if (lookback < 0) lookback = 0;
          }
          end_and_close(t - lookback, false);
        } else if (t - confirmed_start_ + 1 > max_seg_frames) {
          end_and_close(t, false);
        } else if (o_.do_extend && !is_final_frame) {
          if (continuous_silence_ <=
              o_.lookahead_time_end_point / o_.frame_in_ms)
            seg_append_frame(t);
        } else if (is_final_frame) {
          end_and_close(t, true);
        }
      }
    }

    if (machine_ == END_DETECTED && o_.detect_mode == 1) reset_detection();
  }

  Options o_;
  Window window_;
  std::vector<Segment> segments_;
  int frm_cnt_ = 0;
  int machine_ = NOT_DETECTED;
  int confirmed_start_ = -1;
  int latest_confirmed_speech_ = 0;
  int continuous_silence_ = 0;
  int data_buf_start_frame_ = 0;
  double noise_average_decibel_ = -100.0;
  int number_end_detected_ = 0;
  bool next_seg_ = true;
  size_t out_offset_ = 0;
};

}  // namespace

extern "C" {

void* fta_vad_create(const double* opts) {
  Options o;
  o.detect_mode = static_cast<int>(opts[0]);
  o.max_end_silence_time = static_cast<int>(opts[1]);
  o.max_start_silence_time = static_cast<int>(opts[2]);
  o.window_size_ms = static_cast<int>(opts[3]);
  o.sil_to_speech_time_thres = static_cast<int>(opts[4]);
  o.speech_to_sil_time_thres = static_cast<int>(opts[5]);
  o.speech_2_noise_ratio = opts[6];
  o.do_extend = static_cast<int>(opts[7]);
  o.lookback_time_start_point = static_cast<int>(opts[8]);
  o.lookahead_time_end_point = static_cast<int>(opts[9]);
  o.max_single_segment_time = static_cast<int>(opts[10]);
  o.noise_frame_num_used_for_snr = static_cast<int>(opts[11]);
  o.decibel_thres = opts[12];
  o.snr_thres = opts[13];
  o.speech_noise_thres = opts[14];
  o.frame_in_ms = static_cast<int>(opts[15]);
  return new Vad(o);
}

void fta_vad_feed(void* h, const double* sil_probs, const double* decibels,
                  int n, int is_final) {
  static_cast<Vad*>(h)->feed(sil_probs, decibels, n, is_final != 0);
}

int fta_vad_pop(void* h, int streaming, int64_t* out, int cap) {
  return static_cast<Vad*>(h)->pop(streaming != 0, out, cap);
}

void fta_vad_destroy(void* h) { delete static_cast<Vad*>(h); }

}  // extern "C"
