"""scripts/serve.py smoke: batch JSONL mode + the HTTP JSON API.

Runs the real CLI in subprocesses (tiny model, CPU) like a deployment
would: batch predictions land as JSONL with pixel-space shapes; the HTTP
server answers /healthz, /predict and /generate with compiled-once
programs.
"""
import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SERVE = os.path.join(REPO, "scripts", "serve.py")


def _env():
    env = dict(os.environ)
    env["TSUE_PLATFORM"] = env["JAX_PLATFORMS"] = "cpu"
    return env


def test_batch_mode_writes_jsonl(tmp_path):
    out = str(tmp_path / "preds.jsonl")
    r = subprocess.run(
        [sys.executable, SERVE, "--tiny", "--preset", "train_18_30",
         "--synthetic-tracks", "6", "--serve-batch-size", "4",
         "--candidates", "2", "--out", out],
        capture_output=True, text=True, cwd=REPO, env=_env(), timeout=1200)
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr[-4000:]}"
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert meta["mode"] == "predict" and meta["results"] > 0
    with open(out) as f:
        recs = [json.loads(ln) for ln in f if ln.strip()]
    assert len(recs) == meta["results"]
    rec = recs[0]
    pred = np.asarray(rec["pred_pixel_xy"])
    cands = np.asarray(rec["candidates_pixel_xy"])
    assert pred.shape[0] == 2 and cands.shape[0] == 2   # (2,T) / (K,2,T)
    assert cands.shape[1] == 2
    assert np.isfinite(pred).all() and np.isfinite(cands).all()
    # pixel-space outputs: denormalized, not [0,1]
    assert np.abs(pred).max() > 2.0


@pytest.fixture(scope="module")
def http_server():
    proc = subprocess.Popen(
        [sys.executable, SERVE, "--tiny", "--preset", "train_18_30",
         "--serve-batch-size", "4", "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=_env())
    port = None
    deadline = time.time() + 900
    while time.time() < deadline:
        line = proc.stdout.readline()
        if line.startswith("SERVING port="):
            port = int(line.strip().split("=")[1])
            break
        if proc.poll() is not None:
            raise RuntimeError(
                f"server died: {proc.stderr.read()[-4000:]}")
    assert port, "server never reported readiness"
    yield port
    proc.terminate()
    proc.wait(timeout=30)


def _post(port, path, payload, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _track():
    from tsue_tpu.data.schema import make_synthetic_tracks
    t = dict(make_synthetic_tracks(num_tracks=1, vision_dim=512)[0])
    t["raw_trajectory"] = np.asarray(t["raw_trajectory"]).tolist()
    t["vision_embeddings"] = np.asarray(t["vision_embeddings"]).tolist()
    return t


def test_http_healthz(http_server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{http_server}/healthz", timeout=60) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok" and body["batch_size"] == 4


def test_http_predict(http_server):
    body = _post(http_server, "/predict", {"tracks": [_track()]})
    assert body["results"], "no windows produced from the posted track"
    rec = body["results"][0]
    pred = np.asarray(rec["pred_pixel_xy"])
    assert pred.shape[0] == 2 and np.isfinite(pred).all()


def test_http_generate(http_server):
    body = _post(http_server, "/generate",
                 {"tracks": [_track()], "max_new_tokens": 8})
    assert body["results"]
    assert isinstance(body["results"][0]["context"], str)


def test_http_unknown_path_is_404(http_server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{http_server}/nope", data=b"{}",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
