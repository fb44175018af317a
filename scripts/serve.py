"""Serving CLI (beyond the reference): trajectory prediction + context
generation over the precompiled `tsue_tpu.serve.Predictor`.

Batch mode (default) — tracks in (pickle / synthetic fixture),
predictions out as JSONL:

    python scripts/serve.py --ckpt runs/train_18_30/ckpt/best \
        --preset train_18_30 --data all_data.pkl --out preds.jsonl \
        --candidates 10

HTTP mode — a localhost JSON API with the programs compiled once at
startup (every request is a fixed-shape device call, no retracing):

    python scripts/serve.py --ckpt ... --port 8000
    # GET  /healthz            -> {"status": "ok", ...}
    # POST /predict            {"tracks": [{track dict}]} ->
    #                          {"results": [{track_id, past_pixel_xy,
    #                            pred_pixel_xy[, candidates_pixel_xy]}]}
    # POST /generate           {"tracks": [...], "max_new_tokens": N} ->
    #                          {"results": [{track_id, context} |
    #                            {track_id, error}]}
    #                          (N clamped to --max-new-tokens and served
    #                           by trimming the single program compiled
    #                           at that cap — client values never compile)
    #
    # Tracks that produce no result row (all windows filtered) are listed
    # in "dropped_track_ids"; generation serves tracks WITHOUT
    # context_str (the context is the output) and returns explicit
    # per-track error records for ones the model cannot condition.

Track dicts use the all_data.pkl schema (SURVEY §2.1 D1):
raw_trajectory (N,2), vision_embeddings (N,vision_dim), context_str,
lane_roi, track_id — arrays as nested JSON lists over HTTP.

Without --ckpt the predictor serves the deterministic random init
(demo/smoke).  --quantize-decode serves generation with int8
weight-only decode; --speculative uses prompt-lookup speculative greedy
decoding (exact greedy output, fewer forwards on templated paragraphs).
--model-parallel N serves multi-chip: weights TP-sharded over a
(data, model) mesh, request batches over data (parallel/serve_tp.py;
composes with --quantize-decode, --quantize-kv, --speculative,
--batcher continuous and --fused-head).
"""
import json

from _common import apply_overrides, base_parser, finish


def _build_predictor(args, cfg):
    import jax
    from tsue_tpu.serve import Predictor
    from tsue_tpu.train.checkpoint import import_mllm, restore_merge
    from tsue_tpu.models.tsue import TrajectoryModel
    import __graft_entry__ as ge

    d = cfg.data
    model = TrajectoryModel(cfg.model, d.seq_len, d.out_len)
    batch = ge._make_batch(cfg, 1)
    vs = jax.jit(lambda b: model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        b, False))(batch)
    params = vs["params"]
    if args.mllm_ckpt:
        params = import_mllm(params, args.mllm_ckpt)
    if args.ckpt:
        params = restore_merge(args.ckpt, params)
    from tsue_tpu.data import get_tokenizer
    mesh = None
    if args.model_parallel:
        from tsue_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(model_parallel=args.model_parallel)
    return Predictor(cfg, params, batch_size=args.serve_batch_size,
                     num_candidates=args.candidates,
                     tokenizer=get_tokenizer(args.tokenizer),
                     quantize_decode=args.quantize_decode,
                     fused_head=args.fused_head,
                     quantize_kv=args.quantize_kv,
                     mesh=mesh, fsdp=args.fsdp)


def _jsonable(rec):
    import numpy as np
    return {k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in rec.items()}


def _load_tracks(args, cfg):
    from tsue_tpu.data.schema import load_tracks, make_synthetic_tracks
    if args.data:
        return load_tracks(args.data)
    return make_synthetic_tracks(num_tracks=args.synthetic_tracks,
                                 vision_dim=cfg.data.vision_dim,
                                 seed=cfg.data.split_seed)


def _track_id(t):
    """Same track-id coercion the ingest paths use (schema D1: track_id
    with id fallback, -1 when unparseable)."""
    tid = t.get("track_id", t.get("id", -1))
    try:
        return int(tid)
    except (TypeError, ValueError):
        return -1


def _coerce_tracks(raw):
    """JSON track dicts -> numpy-backed dicts (HTTP request bodies)."""
    import numpy as np
    out = []
    for t in raw:
        t = dict(t)
        for k in ("raw_trajectory", "vision_embeddings"):
            if k in t:
                t[k] = np.asarray(t[k], np.float32)
        out.append(t)
    return out


def _serve_http(args, predictor):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    import threading

    lock = threading.Lock()          # device calls serialized per process

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):    # quiet access log
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "model": predictor.cfg.name,
                                  "batch_size": predictor.batch_size,
                                  "candidates": predictor.num_candidates})
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                tracks = _coerce_tracks(req.get("tracks", []))
                with lock:
                    if self.path == "/predict":
                        res = predictor.predict(tracks)
                    elif self.path == "/generate":
                        # clamp to the startup cap and decode THROUGH the
                        # one program compiled at that cap (compile_cap),
                        # trimming the rows: a client-sent value must
                        # never trigger an XLA compile inside the request
                        # handler (minutes at 1B scale, under the lock)
                        mnt = max(1, min(int(req.get("max_new_tokens",
                                              args.max_new_tokens)),
                                         args.max_new_tokens))
                        if args.batcher == "continuous":
                            res = predictor.generate_context_batched(
                                tracks, max_new_tokens=mnt,
                                compile_cap=args.max_new_tokens,
                                speculative=args.speculative)
                        else:
                            res = predictor.generate_context(
                                tracks, max_new_tokens=mnt,
                                speculative=args.speculative,
                                compile_cap=args.max_new_tokens)
                    else:
                        self._reply(404,
                                    {"error": f"unknown path {self.path}"})
                        return
                payload = {"results": [_jsonable(r) for r in res]}
                # tracks that produced no result row (e.g. /predict
                # windows all filtered out) are reported, never silent.
                # Count occurrences per id: two request tracks sharing an
                # id (or several unparseable ids coercing to -1) must not
                # mask a genuinely dropped track whose id also appears in
                # a served result
                from collections import Counter
                got = Counter(r.get("track_id") for r in res)
                dropped = []
                for t in (_track_id(x) for x in tracks):
                    if got[t] > 0:
                        got[t] -= 1
                    else:
                        dropped.append(t)
                if dropped:
                    payload["dropped_track_ids"] = dropped
                self._reply(200, payload)
            except Exception as e:                      # noqa: BLE001
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    srv = ThreadingHTTPServer(("127.0.0.1", args.port), Handler)
    # the test (and any supervisor) syncs on this line
    print(f"SERVING port={srv.server_address[1]}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()


def main():
    p = base_parser(__doc__)
    p.add_argument("--preset", default="train_18_30")
    p.add_argument("--ckpt", default=None, help="trained checkpoint dir "
                   "(deterministic random init when absent — smoke/demo)")
    p.add_argument("--mllm-ckpt", default=None,
                   help="stage-1 MLLM artifact (frozen-regime checkpoints "
                        "omit the frozen subtree)")
    p.add_argument("--candidates", type=int, default=0,
                   help="K MC-dropout candidates per prediction (0 = off)")
    p.add_argument("--serve-batch-size", type=int, default=16,
                   help="fixed compiled batch size")
    p.add_argument("--quantize-decode", action="store_true")
    p.add_argument("--quantize-kv", action="store_true",
                   help="int8 KV caches for every generation path "
                        "(ops/kv_quant.py; composes with the other two)")
    p.add_argument("--fused-head", action="store_true",
                   help="decode /generate through the fused LM-head+top-k "
                        "kernel (ops/lmhead_topk.py; static batcher, "
                        "composes with --quantize-decode)")
    p.add_argument("--speculative", action="store_true",
                   help="prompt-lookup speculative greedy decoding for "
                        "/generate and --generate; composes with "
                        "--batcher continuous (window mode, bitwise the "
                        "plain pool's output)")
    p.add_argument("--batcher", default="static",
                   choices=("static", "continuous"),
                   help="generation scheduling: static batches or the "
                        "continuous slot-pool batcher (serve_batching.py)")
    p.add_argument("--model-parallel", type=int, default=0,
                   help="serve generation over all visible chips via a "
                        "(data, model) mesh with this TP degree "
                        "(parallel/serve_tp.py); 0 = single-chip.  "
                        "model_parallel must divide the device count; "
                        "composes with --quantize-decode, "
                        "--quantize-kv, --speculative, --batcher "
                        "continuous and --fused-head")
    p.add_argument("--fsdp", action="store_true",
                   help="with --model-parallel: additionally ZeRO-shard "
                        "big replicated params over the data axis "
                        "(capacity over latency)")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--generate", action="store_true",
                   help="batch mode: generate context text instead of "
                        "trajectories")
    p.add_argument("--out", default=None, help="batch mode: output JSONL "
                   "path (default stdout)")
    p.add_argument("--port", type=int, default=None,
                   help="start the HTTP API on 127.0.0.1:PORT instead of "
                        "batch mode")
    args = p.parse_args()
    if args.fsdp and not args.model_parallel:
        p.error("--fsdp requires --model-parallel")

    from tsue_tpu.config import get_preset
    cfg = apply_overrides(get_preset(args.preset), args)
    predictor = _build_predictor(args, cfg)

    if args.port is not None:
        predictor.warmup()
        if cfg.model.use_llm:
            # compile /generate's program now — first-request XLA compiles
            # take minutes at 1B scale (the module docstring's "compiled
            # once at startup" contract)
            predictor.prepare_generation(
                args.max_new_tokens, speculative=args.speculative,
                batched=(args.batcher == "continuous"))
        _serve_http(args, predictor)
        return

    tracks = _load_tracks(args, cfg)
    if args.generate:
        if args.batcher == "continuous":
            results = predictor.generate_context_batched(
                tracks, max_new_tokens=args.max_new_tokens,
                speculative=args.speculative)
        else:
            results = predictor.generate_context(
                tracks, max_new_tokens=args.max_new_tokens,
                speculative=args.speculative)
    else:
        results = predictor.predict(tracks)
    lines = [json.dumps(_jsonable(r)) for r in results]
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
    else:
        for ln in lines:
            print(ln)
    finish({"results": len(results), "out": args.out,
            "mode": "generate" if args.generate else "predict"})


if __name__ == "__main__":
    main()
