"""Deploy tooling (deploy_tools/*.sh — the reference's one-click
runtime/deploy_tools scripts, rebuilt without the docker wrapper): build
native libs, start the warmed websocket server, serve a live client."""

import asyncio
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest
import yaml

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

VOCAB = ["<blank>", "<s>", "</s>"] + list("我们今天去公园玩吧好的")

CFG = dict(
    model="Paraformer",
    tokenizer="CharTokenizer",
    tokenizer_conf=dict(token_list=VOCAB, split_with_space=True),
    frontend_conf=dict(n_mels=20, lfr_m=3, lfr_n=2),
    input_size=60,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_deploy_offline_script_serves(tmp_path):
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "config.yaml").write_text(
        yaml.safe_dump(CFG, allow_unicode=True))

    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    proc = subprocess.Popen(
        ["bash", os.path.join(REPO, "deploy_tools",
                              "funasr-tpu-deploy-offline.sh"),
         "--model", str(model_dir), "--host", "127.0.0.1",
         "--port", str(port), "--warmup-seconds", "1"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        deadline = time.time() + 420
        up = False
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"server exited rc={proc.returncode}:\n"
                    + proc.stdout.read()[-3000:])
            try:
                with socket.create_connection(("127.0.0.1", port),
                                              timeout=1):
                    up = True
                    break
            except OSError:
                time.sleep(2)
        assert up, "server never opened its port"

        async def ask():
            import websockets

            pcm = (0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)
                   * 32767).astype("<i2").tobytes()
            async with websockets.connect(f"ws://127.0.0.1:{port}",
                                          open_timeout=60) as ws:
                await ws.send(json.dumps({
                    "mode": "offline", "wav_name": "t", "is_speaking": True,
                    "audio_fs": 16000, "wav_format": "pcm"}))
                await ws.send(pcm)
                await ws.send(json.dumps({"is_speaking": False}))
                return json.loads(await asyncio.wait_for(ws.recv(), 120))

        msg = asyncio.run(ask())
        assert msg["mode"] == "offline" and "text" in msg
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_deploy_scripts_usage():
    for name in ("funasr-tpu-deploy-offline.sh",
                 "funasr-tpu-deploy-2pass.sh"):
        r = subprocess.run(
            ["bash", os.path.join(REPO, "deploy_tools", name)],
            capture_output=True, text=True)
        assert r.returncode == 2
        assert "usage:" in r.stderr
