"""Opt-in perf tool: serving burst behaviour with pre-encoded payloads.

Round-3 burst numbers were polluted by the CLIENT: on this 1-core host the
test client's base64/JSON encode ran under the same GIL as the server, so
``mean_batch`` measured client scheduling, not the server (VERDICT r3,
serving weak #5). Here every request body is encoded ONCE before the clock
starts; the timed region contains only socket I/O (``--mode http``) or
nothing but ``MicroBatcher.submit`` (``--mode inproc``, which bypasses the
HTTP stack entirely and gives the micro-batcher+device upper bound).

Usage (real chip, flagship artifact shape):
    python tests/perf_serve_burst.py --burst 16 --rounds 5 \
        [--mode http inproc] [--image 480 640] -- \
        --task 3 --txt_model_name bernice --img_model_name vit \
        --fusion_name attention --random_init

Everything after ``--`` is a ``cli.serve`` flag set (the server under
test); without it a random-init base mm_late service is built. Reports
per-round wall ms, windows, mean_batch (requests per device dispatch) and
request-latency p50/p95. BASELINE.md quotes the result.

Not collected by pytest (perf_ prefix).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import statistics
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def parse_burst_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--burst", type=int, default=16,
                    help="concurrent requests per round")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--mode", nargs="+", default=["inproc", "http"],
                    choices=["inproc", "http"])
    ap.add_argument("--image", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="attach a random HxW JPEG to every request "
                         "(text-only otherwise)")
    argv = sys.argv[1:]
    serve_argv = []
    if "--" in argv:
        cut = argv.index("--")
        argv, serve_argv = argv[:cut], argv[cut + 1:]
    return ap.parse_args(argv), serve_argv


def _snapshot(batcher):
    s = batcher.snapshot()
    return s["requests"], s["windows"], s["dispatch_seconds"]


def _round_stats(batcher, before, latencies, wall):
    req0, win0, disp0 = before
    req1, win1, disp1 = _snapshot(batcher)
    req, win = req1 - req0, win1 - win0
    lat = sorted(latencies)
    p50 = lat[len(lat) // 2]
    p95 = lat[min(len(lat) - 1, int(len(lat) * 0.95))]
    return {"wall_ms": round(wall * 1e3, 1),
            "requests": req, "windows": win,
            "mean_batch": round(req / max(win, 1), 2),
            "dispatch_ms": round((disp1 - disp0) * 1e3, 1),
            "p50_ms": round(p50 * 1e3, 1), "p95_ms": round(p95 * 1e3, 1)}


def _run_burst(n, fire):
    """Spray ``n`` concurrent calls of ``fire(i)`` released by one barrier;
    return (wall_seconds, per-request latencies). ``fire`` must do no
    encode/decode work — payloads are prepared before the barrier."""
    barrier = threading.Barrier(n + 1)
    latencies = [0.0] * n
    errs = []

    def worker(i):
        barrier.wait()
        t0 = time.perf_counter()
        try:
            fire(i)
        except Exception as e:  # pragma: no cover - surfaced in the report
            errs.append(repr(e))
        latencies[i] = time.perf_counter() - t0

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errs:
        print(f"# {len(errs)} request errors: {errs[:3]}", file=sys.stderr)
    return wall, latencies


def main():
    burst, serve_argv = parse_burst_args()

    import numpy as np
    from PIL import Image

    import bench as B
    B.enable_compile_cache()

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    if not serve_argv:
        serve_argv = ["--task", "3", "--txt_model_name", "bert",
                      "--img_model_name", "vit", "--fusion_name",
                      "attention", "--random_init"]
    args = serve.parse_args(serve_argv)

    pil_img = None
    body = {"text": "burst benchmark tweet: pre-encoded once, outside "
                    "the timed region"}
    if burst.image is not None:
        h, w = burst.image
        arr = np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
        pil_img = Image.fromarray(arr)
        buf = io.BytesIO()
        pil_img.save(buf, format="JPEG")
        body["image_b64"] = base64.b64encode(buf.getvalue()).decode()
    body_bytes = json.dumps(body).encode()  # encoded ONCE, before any clock

    print(f"# building service: {' '.join(serve_argv)}", file=sys.stderr)
    predict, meta = serve.build_service(args)
    serve.warm_service(args, predict)
    batcher = serve.MicroBatcher(predict, args.max_batch,
                                 args.batch_window_ms)
    print(f"# max_batch={args.max_batch} window={args.batch_window_ms}ms "
          f"burst={burst.burst}", file=sys.stderr)

    results = {}
    if "inproc" in burst.mode:
        def fire_inproc(i):
            batcher.submit(body["text"], pil_img)

        # one throwaway burst so dispatcher-thread warmup isn't in round 1
        _run_burst(burst.burst, fire_inproc)
        rounds = []
        for r in range(burst.rounds):
            before = _snapshot(batcher)
            wall, lats = _run_burst(burst.burst, fire_inproc)
            rounds.append(_round_stats(batcher, before, lats, wall))
            print(f"# inproc round {r}: {rounds[-1]}", file=sys.stderr)
        results["inproc"] = rounds

    if "http" in burst.mode:
        import urllib.request

        args.port = 0
        server = serve.make_server(args, batcher, meta)
        port = server.server_address[1]
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()
        url = f"http://127.0.0.1:{port}/classify"

        def fire_http(i):
            req = urllib.request.Request(
                url, data=body_bytes,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as resp:
                resp.read()

        _run_burst(burst.burst, fire_http)  # connection/thread warmup
        rounds = []
        for r in range(burst.rounds):
            before = _snapshot(batcher)
            wall, lats = _run_burst(burst.burst, fire_http)
            rounds.append(_round_stats(batcher, before, lats, wall))
            print(f"# http round {r}: {rounds[-1]}", file=sys.stderr)
        results["http"] = rounds
        server.shutdown()
        server.server_close()

    batcher.close()
    for mode, rounds in results.items():
        mb = [r["mean_batch"] for r in rounds]
        walls = [r["wall_ms"] for r in rounds]
        print(json.dumps({
            "mode": mode, "burst": burst.burst,
            "max_batch": args.max_batch,
            "window_ms": args.batch_window_ms,
            "mean_batch_med": statistics.median(mb),
            "mean_batch_min": min(mb), "mean_batch_max": max(mb),
            "wall_ms_med": statistics.median(walls),
            "p50_ms_med": statistics.median(r["p50_ms"] for r in rounds),
            "p95_ms_med": statistics.median(r["p95_ms"] for r in rounds),
        }))


if __name__ == "__main__":
    main()
