"""Serving endpoint (cli/serve.py): HTTP classify over a trained artifact —
micro-batched fixed-shape dispatch, empty-image text-only flow, artifact
name-contract loading. The reference has no serving path (its closest flow
is --load_saved_model + CSV dumps, reference run_mm_late.py:155-185)."""

import base64
import io
import json
import os
import sys
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/classify",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve
    from socialmedia_textimage_classification_auxlosses_tpu.core import config as C
    from socialmedia_textimage_classification_auxlosses_tpu.train.checkpoint import (
        save_params,
    )

    tmp = tmp_path_factory.mktemp("serve")
    args = serve.parse_args([
        "--task", "3", "--txt_model_name", "bert", "--img_model_name", "vit",
        "--fusion_name", "attention", "--arch", "tiny", "--max_batch", "4",
        "--batch_window_ms", "40",
    ])

    # create an artifact under the run_mm_late naming contract — in a
    # SANDBOXED results dir (never the user's real one) — then load it
    # through the default (non --model_path) derivation
    from socialmedia_textimage_classification_auxlosses_tpu.cli._build import (
        build_mm_late_setup,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.cli._common import (
        artifact_stem, results_dir_for,
    )

    cfg = C.serving_config(args)
    setup = build_mm_late_setup(args, cfg)
    prior_dir = C.results_dir_mm_late
    C.results_dir_mm_late = str(tmp) + "/mm_late/"
    path = (results_dir_for(C.results_dir_mm_late, False)
            + artifact_stem(args, cfg, "mm_late") + "net.pth")
    save_params(path, setup.params)

    predict_batch, meta = serve.build_service(args)
    batcher = serve.MicroBatcher(predict_batch, args.max_batch,
                                 args.batch_window_ms)
    args.port = 0  # ephemeral
    server = serve.make_server(args, batcher, meta)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield {"port": port, "predict": predict_batch, "meta": meta,
           "setup": setup, "cfg": cfg}
    server.shutdown()
    batcher.close()
    server.server_close()
    C.results_dir_mm_late = prior_dir


def test_healthz_and_classify_text_only(service):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{service['port']}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["num_labels"] == 3 and health["task"] == 3
    assert {"requests", "windows", "errors", "mean_batch",
            "mean_dispatch_ms"} <= set(health)

    res = _post(service["port"], {"text": "loving the game tonight!"})
    assert res["prediction"] in (0, 1, 2)
    assert len(res["probs"]) == 3
    np.testing.assert_allclose(sum(res["probs"]), 1.0, rtol=1e-4)
    assert res["class"] == service["cfg"].classes[res["prediction"]]


def test_metrics_prometheus_exposition(service):
    """GET /metrics: Prometheus 0.0.4 text with the traffic counters and
    the per-window dispatch-latency histogram, consistent after traffic."""
    _post(service["port"], {"text": "metrics probe"})
    with urllib.request.urlopen(
            f"http://127.0.0.1:{service['port']}/metrics", timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    metrics = {}
    for line in body.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, value = line.rsplit(" ", 1)
        metrics[name] = float(value)
    assert metrics["smtc_serving_requests_total"] >= 1
    assert metrics["smtc_serving_errors_total"] >= 0
    windows = metrics["smtc_serving_windows_total"]
    assert windows >= 1
    # histogram: buckets cumulative, +Inf == count == windows served
    buckets = [(k, v) for k, v in metrics.items()
               if k.startswith("smtc_serving_dispatch_seconds_bucket")]
    cums = [v for _, v in buckets]
    assert cums == sorted(cums)
    assert metrics['smtc_serving_dispatch_seconds_bucket{le="+Inf"}'] \
        == metrics["smtc_serving_dispatch_seconds_count"] == windows
    assert metrics["smtc_serving_dispatch_seconds_sum"] >= 0
    assert 'smtc_serving_info{model="bert-vit-attention",task="3"} 1' in body


def test_microbatcher_drain_waits_for_inflight():
    """Graceful shutdown: drain() only reports done once every submitted
    request has its answer (SIGTERM path in serve.main)."""
    import time

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    release = threading.Event()

    def slow_predict(reqs):
        release.wait(10)
        return [{"prediction": 0, "class": None, "probs": [1.0]}
                for _ in reqs]

    b = serve.MicroBatcher(slow_predict, max_batch=2, window_ms=1.0)
    try:
        assert b.drain(timeout=0.05)  # idle server drains immediately
        got = {}
        t = threading.Thread(
            target=lambda: got.update(r=b.submit("x", None, timeout=30)))
        t.start()
        time.sleep(0.15)  # request now sits inside the slow dispatch
        assert not b.drain(timeout=0.2)
        release.set()
        assert b.drain(timeout=10.0)
        t.join(timeout=5)
        assert got["r"]["prediction"] == 0
    finally:
        release.set()
        b.close()


def test_classify_with_image_matches_direct(service):
    from PIL import Image

    rng = np.random.RandomState(7)
    img = Image.fromarray(rng.randint(0, 255, (64, 48, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    res = _post(service["port"], {"text": "a photo", "image_b64": b64})
    direct = service["predict"]([("a photo", img)])[0]
    np.testing.assert_allclose(res["probs"], direct["probs"], rtol=1e-4,
                               atol=1e-5)


def test_concurrent_requests_one_window_match_sequential(service):
    """Micro-batched concurrent requests give the same per-request answers
    as isolated dispatches (padding rows don't leak)."""
    texts = [f"tweet number {i}" for i in range(3)]
    solo = [_post(service["port"], {"text": t}) for t in texts]

    results = [None] * 3

    def call(i):
        results[i] = _post(service["port"], {"text": texts[i]})

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for got, ref in zip(results, solo):
        np.testing.assert_allclose(got["probs"], ref["probs"], rtol=1e-4,
                                   atol=1e-6)


def test_vilt_service_direct():
    """Early-fusion (ViLT) serving: fixed-shape predict over text+image."""
    from PIL import Image

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    args = serve.parse_args([
        "--task", "3", "--model", "vilt", "--arch", "tiny",
        "--max_batch", "2", "--random_init",
    ])
    predict_batch, meta = serve.build_service(args)
    assert meta["model"] == "vilt"
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (50, 60, 3), np.uint8))
    out = predict_batch([("tweet with photo", img), ("text only", None)])
    assert len(out) == 2
    for res in out:
        assert len(res["probs"]) == 3
        np.testing.assert_allclose(sum(res["probs"]), 1.0, rtol=1e-3)


def test_lxmert_service_runs_detector_per_request():
    """Raw image + text -> NATIVE FRCNN ROI features -> LXMERT classify:
    the end-to-end flow the reference needs its external torch detector
    stack for (reference mm_early.py:10-12, obj_features.py:142-173)."""
    from PIL import Image

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    args = serve.parse_args([
        "--task", "3", "--model", "lxmert", "--arch", "tiny",
        "--frcnn_arch", "tiny", "--max_batch", "2", "--random_init",
    ])
    predict_batch, meta = serve.build_service(args)
    rng = np.random.RandomState(1)
    img = Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
    out = predict_batch([("what objects are here", img)])
    assert len(out) == 1 and len(out[0]["probs"]) == 3
    # image changes the answer vs text-only (ROI features flow through)
    out2 = predict_batch([("what objects are here", None)])
    assert not np.allclose(out[0]["probs"], out2[0]["probs"])


def test_response_carries_request_timing():
    """Every response reports queue vs dispatch milliseconds so clients
    can tell batching delay from model time (request-level tracing)."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    args = serve.parse_args([
        "--task", "3", "--txt_model_name", "bert", "--img_model_name",
        "vit", "--fusion_name", "concat", "--arch", "tiny",
        "--max_batch", "2", "--batch_window_ms", "5", "--random_init",
    ])
    predict, _ = serve.build_service(args)
    batcher = serve.MicroBatcher(predict, 2, 5.0)
    try:
        out = batcher.submit("trace me", None)
        t = out["timing_ms"]
        assert t["dispatch"] > 0
        assert 0 <= t["queue"] < 60_000
    finally:
        batcher.close()


def test_lxmert_service_device_ingest():
    """--frcnn_ingest device routes request images through the on-device
    resize; results must stay close to the PIL default (the quantified
    resize-quantization delta, tests/test_frcnn_ingest.py)."""
    from PIL import Image

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    base = ["--task", "3", "--model", "lxmert", "--arch", "tiny",
            "--frcnn_arch", "tiny", "--max_batch", "2", "--random_init"]
    rng = np.random.RandomState(1)
    img = Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
    cache = {}  # share ONE detector so only the ingest path differs
    p_pil, _ = serve.build_service(serve.parse_args(base),
                                   detector_cache=cache)
    p_dev, _ = serve.build_service(
        serve.parse_args(base + ["--frcnn_ingest", "device"]),
        detector_cache=cache)
    a = p_pil([("what objects are here", img)])[0]["probs"]
    b = p_dev([("what objects are here", img)])[0]["probs"]
    np.testing.assert_allclose(a, b, atol=0.05)


def test_mmbt_service_direct():
    from PIL import Image

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    args = serve.parse_args([
        "--task", "3", "--model", "mmbt", "--arch", "tiny",
        "--max_batch", "2", "--random_init",
    ])
    predict_batch, meta = serve.build_service(args)
    assert meta["model"] == "mmbt"
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (50, 60, 3), np.uint8))
    out = predict_batch([("text with photo", img), ("only text", None)])
    assert len(out) == 2 and all(len(r["probs"]) == 3 for r in out)


def test_internal_failure_is_500_and_batcher_survives():
    """A prediction failure returns 500 (not 400), reports a generic
    message, counts in stats, and the dispatcher keeps serving."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    calls = {"n": 0}

    def flaky_predict(requests):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ValueError("secret internal detail")
        return [{"prediction": 0, "class": None, "probs": [1.0]}
                for _ in requests]

    batcher = serve.MicroBatcher(flaky_predict, max_batch=2, window_ms=1)
    try:
        with pytest.raises(RuntimeError, match="internal prediction"):
            batcher.submit("boom", None)
        assert batcher.stats()["errors"] == 1
        res = batcher.submit("fine", None)
        assert res["prediction"] == 0
        assert batcher.stats()["requests"] == 1
    finally:
        batcher.close()
    with pytest.raises(RuntimeError, match="not running"):
        batcher.submit("after close", None)


def test_bad_request_is_400_not_crash(service):
    req = urllib.request.Request(
        f"http://127.0.0.1:{service['port']}/classify",
        data=b"{not json", headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # server still alive
    res = _post(service["port"], {"text": "still up?"})
    assert "prediction" in res


def test_image_path_refused_without_image_root(service):
    """image_path names a server-side file: with no --image_root the request
    is rejected as a 400 (never opened), closing the arbitrary-file-read
    hole while image_b64 stays the normal transport."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{service['port']}/classify",
        data=json.dumps({"text": "x", "image_path": "/etc/hostname"}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert b"image_root" in e.read()


def test_decode_image_path_confinement(tmp_path):
    """--image_root confines image_path: inside resolves, traversal and
    non-regular files are refused."""
    from PIL import Image

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    root = tmp_path / "imgs"
    root.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(root / "ok.png")
    (tmp_path / "outside.png").write_bytes(b"x")

    img = serve._decode_image({"image_path": "ok.png"}, str(root))
    assert img.size == (8, 8)
    with pytest.raises(ValueError, match="escapes"):
        serve._decode_image({"image_path": "../outside.png"}, str(root))
    with pytest.raises(ValueError, match="regular file"):
        serve._decode_image({"image_path": "missing.png"}, str(root))
    with pytest.raises(ValueError, match="disabled"):
        serve._decode_image({"image_path": "ok.png"}, None)


def test_detector_warm_pads():
    """warm_service must cover exactly the pad sizes predict_batch can
    request: powers of two below max_batch, plus max_batch (the pow2 cap)."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    assert serve.detector_warm_pads(16) == [1, 2, 4, 8, 16]
    assert serve.detector_warm_pads(12) == [1, 2, 4, 8, 12]
    assert serve.detector_warm_pads(1) == [1]
    assert serve.detector_warm_pads(2) == [1, 2]


def test_warm_service_covers_all_detector_shapes(monkeypatch):
    """After warm_service, no live request window can trigger a detector
    compile: every (canvas orientation, pad size) shape predict_batch can
    request is already in the jit cache — the 'no retrace ever' serving
    contract extended to --model lxmert (full-geometry detector compiles
    are 2-3 min and must never land inside a request window)."""
    from PIL import Image

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    made = {}
    orig = serve._make_detector

    def spy(a, cache=None):
        made["det"] = orig(a, cache)
        return made["det"]

    monkeypatch.setattr(serve, "_make_detector", spy)
    args = serve.parse_args([
        "--task", "3", "--model", "lxmert", "--arch", "tiny",
        "--frcnn_arch", "tiny", "--max_batch", "2", "--random_init",
    ])
    predict_batch, _ = serve.build_service(args)
    serve.warm_service(args, predict_batch)
    det = made["det"]
    warmed = det._fused._cache_size()
    assert warmed >= 2  # landscape + portrait at least

    rng = np.random.RandomState(3)
    land = Image.fromarray(rng.randint(0, 255, (60, 90, 3), np.uint8))
    port = Image.fromarray(rng.randint(0, 255, (90, 60, 3), np.uint8))
    for window in ([("a", land)], [("a", land), ("b", land)],
                   [("a", port)], [("a", port), ("b", land)]):
        predict_batch(window)
    assert det._fused._cache_size() == warmed


def test_native_decoder_service(tmp_path):
    """--img_decoder native: request images decode+resize in C++
    (in-memory for image_b64), land as pre-resized arrays, and produce
    predictions matching the PIL decode path within the documented
    decoder bounds (tests/test_native_imgdec.py)."""
    import base64 as b64mod
    import io as iomod

    import numpy as np
    from PIL import Image

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve
    from socialmedia_textimage_classification_auxlosses_tpu.data.native import (
        imgdec_available,
    )

    if not imgdec_available():
        pytest.skip("native imgdec toolchain unavailable")

    args = serve.parse_args([
        "--task", "3", "--txt_model_name", "bert", "--img_model_name", "vit",
        "--fusion_name", "attention", "--arch", "tiny", "--max_batch", "2",
        "--random_init", "--img_decoder", "native",
    ])
    predict_batch, meta = serve.build_service(args)
    assert meta["native_size"] is not None

    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 255, (300, 400, 3), np.uint8))
    buf = iomod.BytesIO()
    img.save(buf, "JPEG")
    raw = buf.getvalue()
    payload = {"image_b64": b64mod.b64encode(raw).decode()}

    native = serve._decode_image(payload, None, meta["native_size"])
    assert isinstance(native, np.ndarray)
    assert native.shape == (meta["native_size"],) * 2 + (3,)
    pil = serve._decode_image(payload, None, None)
    assert not isinstance(pil, np.ndarray)

    out_native = predict_batch([("a photo", native)])[0]
    out_pil = predict_batch([("a photo", pil)])[0]
    np.testing.assert_allclose(out_native["probs"], out_pil["probs"],
                               atol=0.05)

    # garbage bytes fall back to PIL, which raises -> the handler's 400 path
    with pytest.raises(Exception):
        serve._decode_image({"image_b64": b64mod.b64encode(b"junk").decode()},
                            None, meta["native_size"])


def test_prometheus_label_escaping():
    """ADVICE r3: backslash, double quote, and newline in label values must
    be escaped per the text exposition format, not deleted."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    b = serve.MicroBatcher(lambda reqs: [{}] * len(reqs), 2, 1.0)
    try:
        body = b.prometheus_text({"model": 'we"ird\\mo\ndel', "task": 3})
    finally:
        b.close()
    line = [l for l in body.splitlines()
            if l.startswith("smtc_serving_info")][0]
    expected = ('smtc_serving_info{model="we\\"ird\\\\mo\\ndel",'
                'task="3"} 1')
    assert line == expected
    assert "\n" not in line  # the newline rode through escaped


def test_drain_covers_full_handler_span():
    """ADVICE r3: drain() must wait for handler threads still parsing the
    request (pre-submit) or writing the response (post-submit), not only
    for the submit() window."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    b = serve.MicroBatcher(lambda reqs: [{}] * len(reqs), 2, 1.0)
    try:
        assert b.drain(timeout=0.05)
        b.handler_started()       # handler accepted, still pre-submit
        assert not b.drain(timeout=0.1)
        b.handler_finished()      # response written
        assert b.drain(timeout=1.0)
    finally:
        b.close()


def test_stats_and_scrape_are_lock_consistent(service):
    """A scrape's histogram count must equal windows_total within the same
    snapshot, even while traffic flows."""
    import concurrent.futures as cf

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    done = threading.Event()
    results = []

    def traffic():
        while not done.is_set():
            _post(service["port"], {"text": "scrape race probe"})

    with cf.ThreadPoolExecutor(2) as ex:
        fut = ex.submit(traffic)
        try:
            for _ in range(10):
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{service['port']}/metrics",
                        timeout=30) as r:
                    body = r.read().decode()
                m = {}
                for line in body.splitlines():
                    if not line.startswith("#") and line.strip():
                        k, v = line.rsplit(" ", 1)
                        m[k] = float(v)
                results.append(
                    m["smtc_serving_dispatch_seconds_count"]
                    == m["smtc_serving_windows_total"])
        finally:
            done.set()
            fut.result(timeout=60)
    assert all(results), results


def test_parse_model_spec():
    """--extra_model NAME:KEY=VALUE,... parsing: type coercion to the
    primary flag's type, loud rejection of unknown keys / bad names."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    base = serve.parse_args(["--task", "3", "--arch", "tiny"])
    name, margs = serve.parse_model_spec(
        base, "early:model=vilt,max_batch=4,batch_window_ms=20,"
              "random_init=true,seed=7")
    assert name == "early"
    assert margs.model == "vilt" and margs.max_batch == 4
    assert margs.batch_window_ms == 20.0 and margs.random_init is True
    assert margs.seed == 7
    # the base namespace is untouched
    assert base.model == "mm_late" and base.max_batch == 16
    # the spec's namespace never recurses into more extra models
    assert margs.extra_model == []

    with pytest.raises(SystemExit):
        serve.parse_model_spec(base, "x:no_such_flag=1")
    with pytest.raises(SystemExit):
        serve.parse_model_spec(base, ":model=vilt")  # empty name
    with pytest.raises(SystemExit):
        serve.parse_model_spec(base, "a/b:model=vilt")  # route-unsafe
    with pytest.raises(SystemExit):
        serve.parse_model_spec(base, "x:port=1")  # server plumbing key
    # None-default flags coerce from the DECLARED type, not the runtime
    # value (image_size default None used to come through as a string)
    _, m2 = serve.parse_model_spec(base, "cnn:image_size=288")
    assert m2.image_size == 288 and isinstance(m2.image_size, int)
    with pytest.raises(SystemExit):  # declared choices are enforced
        serve.parse_model_spec(base, "x:model=nosuch")
    with pytest.raises(SystemExit):  # non-numeric int value fails loudly
        serve.parse_model_spec(base, "x:max_batch=many")
    with pytest.raises(SystemExit):  # "default" is the primary's label
        serve.parse_model_spec(base, "default:model=vilt")


def test_multi_model_endpoint():
    """One process, several models: /classify stays the primary,
    /classify/<name> routes extras, /healthz reports per-model stats, and
    /metrics labels every series by model while staying scrape-consistent."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    args = serve.parse_args([
        "--task", "3", "--txt_model_name", "bert", "--img_model_name",
        "vit", "--fusion_name", "attention", "--arch", "tiny",
        "--max_batch", "2", "--batch_window_ms", "20", "--random_init",
        "--extra_model", "alt:fusion_name=concat,seed=31",
    ])
    predict, meta = serve.build_service(args)
    batcher = serve.MicroBatcher(predict, 2, 20.0)
    name, margs = serve.parse_model_spec(args, args.extra_model[0])
    predict2, meta2 = serve.build_service(margs)
    extra = {name: (serve.MicroBatcher(predict2, 2, 20.0), meta2)}
    args.port = 0
    server = serve.make_server(args, batcher, meta, extra)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        r1 = _post(port, {"text": "route to the primary"})
        assert len(r1["probs"]) == 3

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify/alt",
            data=json.dumps({"text": "route to the primary"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            r2 = json.loads(r.read())
        # different fusion + seed -> different distribution for same text
        assert not np.allclose(r1["probs"], r2["probs"])

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify/nope",
            data=b"{}", headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 404

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["models"]["alt"]["requests"] == 1
        assert health["requests"] == 1  # primary's counters stay top-level

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
            body = r.read().decode()
        assert ('smtc_serving_requests_total{model="default"} 1' in body)
        assert ('smtc_serving_requests_total{model="alt"} 1' in body)
        assert ('smtc_serving_info{model="alt",'
                'artifact="bert-vit-concat",task="3"} 1') in body
        # HELP/TYPE headers appear once per metric, not per model
        assert body.count("# TYPE smtc_serving_requests_total") == 1
    finally:
        server.shutdown()
        batcher.close()
        extra["alt"][0].close()
        server.server_close()


def test_shared_detector_across_models():
    """Two lxmert services with the same (frcnn_arch, ckpt, init) share ONE
    detector through the multi-model detector cache."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    args = serve.parse_args([
        "--task", "3", "--model", "lxmert", "--arch", "tiny",
        "--frcnn_arch", "tiny", "--max_batch", "2", "--random_init",
    ])
    cache = {}
    p1, _ = serve.build_service(args, detector_cache=cache)
    assert len(cache) == 1
    _, margs = serve.parse_model_spec(args, "second:seed=31")
    p2, _ = serve.build_service(margs, detector_cache=cache)
    assert len(cache) == 1  # second build reused the first detector
    from PIL import Image
    img = Image.fromarray(
        np.random.RandomState(2).randint(0, 255, (64, 80, 3), np.uint8))
    out1 = p1([("shared detector", img)])
    out2 = p2([("shared detector", img)])
    assert len(out1[0]["probs"]) == 3 and len(out2[0]["probs"]) == 3


def test_workers_reuseport_smoke(tmp_path):
    """--workers N (SO_REUSEPORT multi-process serving, VERDICT r4 item 3):
    the supervisor spawns N full service processes on ONE port, requests
    round-trip, and SIGTERM tears the whole tree down cleanly."""
    import re
    import signal
    import socket
    import subprocess
    import time as _time

    from fixtures import make_task_fixture

    make_task_fixture(tmp_path / "data", task=3)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               SMTC_DATA_PATH=str(tmp_path / "data") + os.sep,
               SMTC_RESULTS_PATH=str(tmp_path / "results") + os.sep)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    with socket.socket() as s:  # free port (small race, fine for a test)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    proc = subprocess.Popen(
        [sys.executable, "-m",
         "socialmedia_textimage_classification_auxlosses_tpu.cli.serve",
         "--task", "3", "--txt_model_name", "bert", "--img_model_name",
         "vit", "--fusion_name", "attention", "--arch", "tiny",
         "--random_init", "--dtype", "float32", "--attn_impl", "jnp",
         "--max_batch", "2", "--batch_window_ms", "10",
         "--workers", "2", "--port", str(port)],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    try:
        deadline = _time.monotonic() + 420
        pids = set()
        up = False
        while _time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                    h = json.loads(r.read())
                    pids.add(h["pid"])
                    up = True
                    break
            except Exception:
                _time.sleep(2.0)
        assert up, "no worker came up within the deadline"
        # several fresh connections: the kernel may balance across workers
        for _ in range(12):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
                pids.add(json.loads(r.read())["pid"])
        res = _post(port, {"text": "multi-process smoke"})
        assert "probs" in res and len(res["probs"]) == 3
        assert pids and proc.pid not in pids  # workers, not the supervisor
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
        assert rc == 0, rc
        err = proc.stderr.read()
        worker_pids = {int(m) for m in re.findall(r"worker \d+/2 pid=(\d+)",
                                                  err)}
        assert len(worker_pids) == 2, err[-2000:]
        assert pids <= worker_pids
        for wp in worker_pids:  # both workers reaped with the supervisor
            assert not os.path.exists(f"/proc/{wp}")
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
