// fta_api.cc — consolidated handle-based C API for the funasr_tpu runtime.
//
// The reference runtime ships a handle-based C ABI so C/C++/Java/C#/Go
// applications can embed its engines directly
// (/root/reference/runtime/onnxruntime/include/funasrruntime.h:60
//  FunASRInit/FunASRInferBuffer/FunASRUninit, :99 FunOfflineInit,
//  :80 FsmnVadInit, :93 CTTransformerInfer).  In this framework the TPU
// compute path is JAX, so this library embeds CPython: a C application
// links libfta_api.so, calls FtaOfflineInit(json) and gets transcripts
// back as JSON strings — it never touches Python itself.
//
// Threading: every entry point takes the GIL via PyGILState_Ensure, so the
// ABI is safe to call from any thread (the reference API is thread-safe per
// handle the same way).  When loaded INTO an existing Python process (e.g.
// via ctypes for testing) the already-running interpreter is reused and
// Py_Initialize is skipped.
//
// Result strings are malloc'd; callers free them with FtaFreeResult.
//
// Build: make -C funasr_tpu/runtime/native libfta_api.so

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdlib>
#include <cstring>
#include <mutex>

#define FTA_API extern "C" __attribute__((visibility("default")))

namespace {

std::once_flag g_init_once;
bool g_we_initialized = false;

void ensure_interpreter() {
  std::call_once(g_init_once, [] {
    if (!Py_IsInitialized()) {
      // isolate from argv, keep env (JAX_PLATFORMS etc. must pass through)
      Py_InitializeEx(0);
      g_we_initialized = true;
      // release the GIL acquired by Py_Initialize so that the
      // PyGILState_Ensure below (possibly on another thread) can take it
      PyEval_SaveThread();
    }
  });
}

// RAII GIL hold.
struct Gil {
  PyGILState_STATE st;
  Gil() { st = PyGILState_Ensure(); }
  ~Gil() { PyGILState_Release(st); }
};

PyObject* bridge() {
  static PyObject* mod = nullptr;  // borrowed forever once imported
  if (!mod) {
    mod = PyImport_ImportModule("funasr_tpu.runtime.capi_bridge");
    if (!mod) PyErr_Print();
  }
  return mod;
}

// Copy a Python str into a malloc'd C string (caller frees).
char* steal_to_cstr(PyObject* s) {
  if (!s) {
    PyErr_Print();
    return strdup("{\"error\": \"internal python error\"}");
  }
  const char* utf8 = PyUnicode_AsUTF8(s);
  if (!utf8) {
    // clear the pending exception: a leftover error indicator would make
    // every subsequent CallMethod raise SystemError
    PyErr_Print();
  }
  char* out = strdup(utf8 ? utf8 : "{\"error\": \"non-utf8 result\"}");
  Py_DECREF(s);
  return out;
}

long call_init(const char* fn, const char* json_cfg) {
  ensure_interpreter();
  Gil gil;
  PyObject* mod = bridge();
  if (!mod) return -1;
  PyObject* r = PyObject_CallMethod(mod, fn, "s", json_cfg ? json_cfg : "");
  if (!r) {
    PyErr_Print();
    return -1;
  }
  long h = PyLong_AsLong(r);
  Py_DECREF(r);
  return h;
}

}  // namespace

// ------------------------------------------------------------------ ASR
// json_cfg: AutoModel kwargs, e.g. {"model": "<dir|name|inline dict>",
// "vad_model": ..., "punc_model": ..., "quantize": true}
FTA_API long FtaOfflineInit(const char* json_cfg) {
  return call_init("init", json_cfg);
}

// Streaming session sharing an offline handle (FunASROnlineInit).
// json_cfg: {"chunk_size": [0,10,5], "streaming_config": {...}}
FTA_API long FtaOnlineInit(long asr_handle, const char* json_cfg) {
  ensure_interpreter();
  Gil gil;
  PyObject* mod = bridge();
  if (!mod) return -1;
  PyObject* r = PyObject_CallMethod(mod, "online_init", "ls",
                                    asr_handle, json_cfg ? json_cfg : "");
  if (!r) {
    PyErr_Print();
    return -1;
  }
  long h = PyLong_AsLong(r);
  Py_DECREF(r);
  return h;
}

// 2pass session sharing an offline handle (FunTpassInit): online partials
// per chunk, offline re-decode at input_finished (mode "2pass-offline").
FTA_API long FtaTpassInit(long asr_handle, const char* json_cfg) {
  ensure_interpreter();
  Gil gil;
  PyObject* mod = bridge();
  if (!mod) return -1;
  PyObject* r = PyObject_CallMethod(mod, "tpass_init", "ls", asr_handle,
                                    json_cfg ? json_cfg : "");
  if (!r) {
    PyErr_Print();
    return -1;
  }
  long h = PyLong_AsLong(r);
  Py_DECREF(r);
  return h;
}

// FunASRInferBuffer / FunOfflineInferBuffer.  buf: PCM16LE bytes when
// wav_format=="pcm", else full file bytes ("wav", "mp3", ...).  Returns a
// malloc'd JSON string {"text": ...} — free with FtaFreeResult.
FTA_API char* FtaInferBuffer(long handle, const char* buf, int n_len,
                             int sampling_rate, const char* wav_format,
                             int input_finished, const char* json_kwargs) {
  ensure_interpreter();
  Gil gil;
  PyObject* mod = bridge();
  if (!mod) return strdup("{\"error\": \"bridge import failed\"}");
  PyObject* r = PyObject_CallMethod(
      mod, "infer", "ly#isis", handle, buf, (Py_ssize_t)n_len,
      sampling_rate, wav_format ? wav_format : "pcm", input_finished,
      json_kwargs ? json_kwargs : "");
  return steal_to_cstr(r);
}

// ------------------------------------------------------------------ VAD
FTA_API long FtaVadInit(const char* json_cfg) {
  return call_init("vad_init", json_cfg);
}

// Returns {"segments": [[beg_ms, end_ms], ...]} for the PCM16 buffer.
FTA_API char* FtaVadInferBuffer(long handle, const char* buf, int n_len,
                                int sampling_rate, int input_finished) {
  ensure_interpreter();
  Gil gil;
  PyObject* mod = bridge();
  if (!mod) return strdup("{\"error\": \"bridge import failed\"}");
  PyObject* r = PyObject_CallMethod(mod, "vad_infer", "ly#ii", handle, buf,
                                    (Py_ssize_t)n_len, sampling_rate,
                                    input_finished);
  return steal_to_cstr(r);
}

// ----------------------------------------------------------------- Punc
FTA_API long FtaPuncInit(const char* json_cfg) {
  return call_init("punc_init", json_cfg);
}

// CTTransformerInfer: punctuate a transcript; returns {"text": ...}.
FTA_API char* FtaPuncInfer(long handle, const char* text) {
  ensure_interpreter();
  Gil gil;
  PyObject* mod = bridge();
  if (!mod) return strdup("{\"error\": \"bridge import failed\"}");
  PyObject* r =
      PyObject_CallMethod(mod, "punc_infer", "ls", handle, text ? text : "");
  return steal_to_cstr(r);
}

// ---------------------------------------------------------------- common
FTA_API void FtaFreeResult(char* result) { free(result); }

FTA_API void FtaUninit(long handle) {
  if (!Py_IsInitialized()) return;
  Gil gil;
  PyObject* mod = bridge();
  if (!mod) return;
  PyObject* r = PyObject_CallMethod(mod, "uninit", "l", handle);
  if (!r)
    PyErr_Print();
  else
    Py_DECREF(r);
}
