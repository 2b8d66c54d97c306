"""END-TO-END streaming latency through the websocket server (real chip).

Measures what a client actually sees — not device compute alone: a real
websocket client sends 600 ms PCM chunks (chunk_size [0,10,5], the
reference real-time config, paraformer_streaming/model.py:435) to the
asyncio server running the flagship-shaped ParaformerStreaming (online
path) and the flagship offline AutoModel (the 2pass sentence-end
correction); per-chunk wall latency = send -> partial-result receive,
including PCM parse, online fbank/LFR/CMVN frontend, host<->TPU dispatch,
the jitted chunk step, detokenization and the JSON reply.  The final
2pass-offline correction latency is measured at utterance end.

Reference behavior matched: runtime/websocket/bin/websocket-server-2pass.cpp
+ runtime/docs/websocket_protocol.md (mode "2pass": per-chunk
"2pass-online" partials, "2pass-offline" correction on is_speaking=false).

Prints ONE JSON line; also writes BENCH_STREAMING_E2E.json.
"""

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

# persistent cache only on the accelerator: XLA:CPU AOT entries pin
# host machine features and SIGILL after a sandbox host migration
# (observed r5 — a stale cache segfaulted CPU compiles suite-wide)
if "cpu" not in (os.environ.get("JAX_PLATFORMS") or ""):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

CHUNK_MS = 600          # chunk_size [0,10,5] -> 10 x 60 ms frames
FS = 16000
N_WARM = 6
N_MEAS = 50
PORT = 10199

VOCAB = ["<blank>", "<s>", "</s>", "<unk>"] + [f"tok{i}" for i in range(8400)]

FLAGSHIP_CFG = dict(
    model="Paraformer",
    vocab_size=len(VOCAB),
    tokenizer_conf={"token_list": VOCAB},
    frontend_conf=dict(n_mels=80, lfr_m=7, lfr_n=6),
    input_size=560,
    encoder_conf=dict(output_size=512, attention_heads=4, linear_units=2048,
                      num_blocks=50, dropout_rate=0.0, kernel_size=11,
                      sanm_shfit=0),
    decoder_conf=dict(attention_heads=4, linear_units=2048, num_blocks=16,
                      att_layer_num=16, kernel_size=11, sanm_shfit=0,
                      dropout_rate=0.0),
    predictor_conf=dict(idim=512, threshold=1.0, l_order=1, r_order=1,
                        tail_threshold=0.45),
)


def _build_models():
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.frontends.streaming import StreamingFrontend
    from funasr_tpu.models.paraformer_streaming.model import (
        ParaformerStreaming,
    )
    from __graft_entry__ import _flagship

    am = AutoModel(model=FLAGSHIP_CFG, quantize=True)

    model = _flagship(dtype=jnp.bfloat16)
    T0 = 60
    params = jax.jit(
        lambda k, x, l: model.init({"params": k}, x, l, max_tokens=16,
                                   method=model.greedy_decode)
    )(jax.random.PRNGKey(0), jnp.zeros((1, T0, 560)), jnp.array([T0]))
    sm = ParaformerStreaming(
        params, input_size=560, d_model=512, n_head=4, enc_kernel=11,
        dec_kernel=11, n_enc_layers=50, n_dec_layers=16,
        chunk_size=(0, 10, 5), frontend=StreamingFrontend(n_mels=80,
                                                          lfr_m=7, lfr_n=6))
    return am, sm


async def _run_client(port, chunks, final_sync):
    import websockets

    lat_chunks = []
    async with websockets.connect(f"ws://127.0.0.1:{port}",
                                  max_size=None) as ws:
        await ws.send(json.dumps({
            "mode": "2pass", "wav_name": "bench", "is_speaking": True,
            "chunk_size": [0, 10, 5], "audio_fs": FS, "wav_format": "pcm",
        }))
        for i, pcm in enumerate(chunks):
            t0 = time.perf_counter()
            await ws.send(pcm)
            # the server answers every chunk with a 2pass-online partial
            msg = json.loads(await ws.recv())
            dt = time.perf_counter() - t0
            assert msg["mode"] == "2pass-online", msg
            lat_chunks.append(dt)
        t0 = time.perf_counter()
        await ws.send(json.dumps({"is_speaking": False}))
        final_lat = None
        while True:
            msg = json.loads(await ws.recv())
            if msg["mode"] == "2pass-offline":
                final_lat = time.perf_counter() - t0
                break
    final_sync.append(final_lat)
    return lat_chunks


def main():
    from funasr_tpu.ops import quant
    from funasr_tpu.runtime.websocket_server import AsrWebSocketServer

    quant.enable(os.environ.get("FUNASR_TPU_INT8", "1") == "1")

    t_build = time.time()
    am, sm = _build_models()
    build_s = time.time() - t_build

    server = AsrWebSocketServer(am, streaming_model=sm, host="127.0.0.1",
                                port=PORT, max_batch=1)

    # per-chunk partials must go out every chunk even when the random
    # model emits no tokens: patch empty-text suppression off for the
    # latency measurement (the reference server also replies per chunk)
    orig_on_binary = server.on_binary

    def on_binary(sess, payload):
        out = orig_on_binary(sess, payload)
        if not out and sess.mode in ("online", "2pass"):
            out = [json.dumps({"mode": "2pass-online",
                               "wav_name": sess.wav_name, "text": "",
                               "is_final": False})]
        return out

    server.on_binary = on_binary

    rng = np.random.default_rng(0)
    n = int(FS * CHUNK_MS / 1000)
    chunks = []
    for _ in range(N_WARM + N_MEAS):
        wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(n) / FS)
               + 0.02 * rng.standard_normal(n))
        chunks.append((np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes())

    warm_offline_s = 0.0  # utterance 1 below warms the offline bucket

    async def run():
        import websockets

        async with websockets.serve(server.handle, "127.0.0.1", PORT,
                                    max_size=None):
            # utterance 1 (same chunk count -> same offline bucket) warms
            # the online program AND the final-correction program;
            # utterance 2 is measured
            sync0: list = []
            await _run_client(PORT, chunks, sync0)
            final_sync = []
            lats = await _run_client(PORT, chunks, final_sync)
            return lats, final_sync[0]

    t0 = time.time()
    lats, final_lat = asyncio.run(run())
    total_s = time.time() - t0

    meas = np.array(lats[N_WARM:])
    p50 = float(np.percentile(meas, 50) * 1000)
    p90 = float(np.percentile(meas, 90) * 1000)
    p99 = float(np.percentile(meas, 99) * 1000)
    out = {
        "metric": "streaming_e2e_chunk_latency_p50_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(CHUNK_MS / p50, 2),  # realtime headroom x
        "detail": {
            "chunk_ms": CHUNK_MS,
            "p50_ms": round(p50, 2), "p90_ms": round(p90, 2),
            "p99_ms": round(p99, 2),
            "final_2pass_offline_ms": round(final_lat * 1000, 1),
            "chunks_measured": int(meas.size),
            "warmup_chunks": N_WARM,
            "path": "ws client -> asyncio server -> pcm parse -> online "
                    "fbank/LFR/CMVN -> jitted chunk step (50-layer enc + "
                    "online CIF + 16-layer dec) -> detok -> json",
            "model": "paraformer-large-arch streaming [0,10,5]",
            "offline_correction": "flagship AutoModel (int8 serving path)",
            "build_s": round(build_s, 1),
            "offline_warm_s": round(warm_offline_s, 1),
            "wall_s": round(total_s, 1),
        },
    }
    print(json.dumps(out))
    with open("BENCH_STREAMING_E2E.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
