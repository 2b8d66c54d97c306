/* funasr_tpu native audio runtime — C API.
 *
 * TPU-native equivalent of the reference C++ runtime's audio layer
 * (runtime/onnxruntime/src/audio.cpp class Audio, src/resample.cpp):
 * RIFF/WAVE + raw PCM parsing, windowed-sinc resampling to the model rate,
 * and a streaming sample queue that tracks the global millisecond timeline
 * for 2-pass serving.  The compute path (fbank, encoder, decode) lives on
 * the TPU; this library owns the host-side byte-level hot path so the
 * Python serving loop never touches per-sample data.
 *
 * Build: `make` in this directory -> libfta_audio.so; bound via ctypes in
 * funasr_tpu/runtime/native_audio.py.
 */
#ifndef FTA_AUDIO_H
#define FTA_AUDIO_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- WAV / PCM decode ---------------------------------------------- */

/* Parse a RIFF/WAVE byte buffer.  Supports PCM 8/16/24/32-bit and IEEE
 * float32, any channel count (averaged to mono).  On success fills
 * *out_samples (malloc'd float32 mono in [-1,1]; caller frees via
 * fta_free), *out_n, *out_rate and returns 0.  Returns nonzero on parse
 * error. */
int fta_wav_decode(const uint8_t *bytes, size_t len, float **out_samples,
                   int64_t *out_n, int32_t *out_rate);

/* Convert raw little-endian PCM16 to float32 mono in [-1,1]. */
void fta_pcm16_to_float(const int16_t *pcm, int64_t n, float *out);

/* ---- Resampling ----------------------------------------------------- */

/* Windowed-sinc (Hann) resampler, kaldi LinearResample-style: cutoff =
 * 0.99 * 0.5 * min(rate_in, rate_out), num_zeros = 6.  Returns the number
 * of output samples written to *out (malloc'd, caller frees via fta_free),
 * or -1 on error. */
int64_t fta_resample(const float *x, int64_t n, int32_t rate_in,
                     int32_t rate_out, float **out);

/* Number of output samples fta_resample will produce. */
int64_t fta_resample_out_len(int64_t n, int32_t rate_in, int32_t rate_out);

/* ---- Streaming sample queue ----------------------------------------- */

/* A growable FIFO of float32 samples at a fixed rate with a global sample
 * counter, mirroring the reference frame queue's ms timeline
 * (runtime/onnxruntime/include/audio.h:44). */
typedef struct fta_queue fta_queue;

fta_queue *fta_queue_new(int32_t rate);
void fta_queue_free(fta_queue *q);

/* Append float32 samples. Returns 0, or -1 on allocation failure. */
int fta_queue_push(fta_queue *q, const float *samples, int64_t n);

/* Append raw PCM16 bytes (little-endian), converting to float. */
int fta_queue_push_pcm16(fta_queue *q, const uint8_t *bytes, size_t len);

/* Pop up to n samples into out. Returns the number popped. */
int64_t fta_queue_pop(fta_queue *q, float *out, int64_t n);

/* Samples currently buffered. */
int64_t fta_queue_available(const fta_queue *q);

/* Global timeline: milliseconds of audio consumed by pops so far. */
double fta_queue_consumed_ms(const fta_queue *q);

void fta_free(void *p);

#ifdef __cplusplus
}
#endif
#endif /* FTA_AUDIO_H */
