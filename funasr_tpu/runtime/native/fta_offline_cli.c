/* fta_offline_cli.c — sample C application embedding the framework via the
 * consolidated C API (libfta_api.so), the role of the reference's
 * funasr-onnx-offline demo (runtime/onnxruntime/bin/funasr-onnx-offline.cpp):
 * no Python in sight from the caller's perspective.
 *
 *   fta-offline-cli '<json AutoModel config>' audio.wav [fs]
 *
 * Prints the transcript JSON to stdout. */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

extern long FtaOfflineInit(const char* json_cfg);
extern char* FtaInferBuffer(long handle, const char* buf, int n_len,
                            int sampling_rate, const char* wav_format,
                            int input_finished, const char* json_kwargs);
extern void FtaFreeResult(char* result);
extern void FtaUninit(long handle);

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s '<json config>' <audio file> [fs]\n", argv[0]);
    return 2;
  }
  const char* cfg = argv[1];
  const char* path = argv[2];
  int fs = argc > 3 ? atoi(argv[3]) : 16000;

  FILE* f = fopen(path, "rb");
  if (!f) {
    fprintf(stderr, "cannot open %s\n", path);
    return 1;
  }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = (char*)malloc(n);
  if (fread(buf, 1, n, f) != (size_t)n) {
    fprintf(stderr, "short read on %s\n", path);
    return 1;
  }
  fclose(f);

  const char* dot = strrchr(path, '.');
  const char* fmt = dot ? dot + 1 : "pcm";

  long h = FtaOfflineInit(cfg);
  if (h < 0) {
    fprintf(stderr, "FtaOfflineInit failed\n");
    return 1;
  }
  char* res = FtaInferBuffer(h, buf, (int)n, fs, fmt, 1, NULL);
  printf("%s\n", res);
  int err = strstr(res, "\"error\"") != NULL;
  FtaFreeResult(res);
  FtaUninit(h);
  free(buf);
  return err;
}
