"""StableHLO export of the serving graph (cli/export.py).

The artifact must be self-contained (weights as module constants),
deserialize without any framework code, and reproduce the live jitted
predict to within a few ULP (recompile may reorder fusions). Reference has no deployment story; the contract here
is export.py's own docs."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from socialmedia_textimage_classification_auxlosses_tpu.cli import export

    out = str(tmp_path_factory.mktemp("exp") / "tiny.stablehlo")
    export.main([
        "--out", out, "--check",
        "--task", "3", "--txt_model_name", "bert", "--img_model_name",
        "vit", "--fusion_name", "attention", "--arch", "tiny",
        "--max_batch", "2", "--random_init", "--seed", "11",
    ])
    return out


def test_artifact_written_with_sidecar(exported):
    assert os.path.getsize(exported) > 1000
    sidecar = json.load(open(exported + ".json"))
    assert sidecar["num_labels"] == 3
    assert sidecar["max_batch"] == 2
    assert set(sidecar["inputs"]) >= {"ids", "mask", "pixel_values"}
    assert sidecar["inputs"]["pixel_values"]["dtype"] == "uint8"


def test_deserialized_module_runs_standalone(exported):
    """Consume the artifact the way a serving fleet would: jax.export only,
    no framework imports, inputs built from the sidecar contract."""
    from jax import export as jexport

    exp = jexport.deserialize(bytearray(open(exported, "rb").read()))
    sidecar = json.load(open(exported + ".json"))
    rng = np.random.RandomState(0)
    batch = {}
    for name, spec in sidecar["inputs"].items():
        shape, dtype = spec["shape"], np.dtype(spec["dtype"])
        if dtype == np.uint8:
            batch[name] = rng.randint(0, 255, shape, np.uint8)
        else:
            # token ids/mask: keep small so any vocab bound holds
            batch[name] = rng.randint(0, 2, shape).astype(dtype)
    probs = np.asarray(exp.call(batch))
    assert probs.shape == (sidecar["max_batch"], sidecar["num_labels"])
    kind = sidecar["output"]
    if "sigmoid" not in kind or "softmax" in kind:
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_export_matches_live_service(exported):
    """Same flags through serve.build_service: the deserialized module and
    the live service agree on a real (text, image) request."""
    from PIL import Image
    from jax import export as jexport

    from socialmedia_textimage_classification_auxlosses_tpu.cli import serve

    args = serve.parse_args([
        "--task", "3", "--txt_model_name", "bert", "--img_model_name",
        "vit", "--fusion_name", "attention", "--arch", "tiny",
        "--max_batch", "2", "--random_init", "--seed", "11",
    ])
    info = {}
    predict_batch, _ = serve.build_service(args, export_info=info)
    img = Image.fromarray(
        np.random.RandomState(3).randint(0, 255, (48, 64, 3), np.uint8))
    reqs = [("a tweet with a photo", img), ("text only", None)]
    live = predict_batch(reqs)

    exp = jexport.deserialize(bytearray(open(exported, "rb").read()))
    probs = np.asarray(exp.call(info["make_batch"](reqs)))
    for i, resp in enumerate(live):
        np.testing.assert_allclose(probs[i], resp["probs"], rtol=2e-6,
                                   atol=1e-7)


def test_multiplatform_export():
    """--platforms cpu lowering succeeds and runs on this host."""
    from socialmedia_textimage_classification_auxlosses_tpu.cli import (
        export, serve,
    )

    args = serve.parse_args([
        "--task", "6", "--txt_model_name", "bert", "--img_model_name",
        "vit", "--fusion_name", "concat", "--arch", "tiny",
        "--max_batch", "1", "--random_init",
    ])
    blob, sidecar, check, _ = export.export_service(args, platforms=["cpu"])
    assert sidecar["platforms"] == ["cpu"]
    check(blob)  # ULP-level round trip


def test_detector_export_matches_live(tmp_path):
    """--export_detector ships the fused FRCNN programs; the deserialized
    landscape module must reproduce the live fused detector on a real
    preprocessed canvas batch."""
    from jax import export as jexport

    from socialmedia_textimage_classification_auxlosses_tpu.cli import (
        export, serve,
    )
    from socialmedia_textimage_classification_auxlosses_tpu.models import (
        frcnn as FR,
    )

    out = str(tmp_path / "lx.stablehlo")
    export.main([
        "--out", out, "--export_detector", "--detector_batch", "2",
        "--task", "3", "--model", "lxmert", "--arch", "tiny",
        "--frcnn_arch", "tiny", "--max_batch", "2", "--random_init",
    ])
    dpath = out + ".detector.landscape.stablehlo"
    assert os.path.getsize(dpath) > 1000
    dmeta = json.load(open(dpath + ".json"))
    batch, ph, pw, _ = dmeta["canvas"]

    # live detector with the SAME weights (seeded random init)
    args = serve.parse_args([
        "--task", "3", "--model", "lxmert", "--arch", "tiny",
        "--frcnn_arch", "tiny", "--max_batch", "2", "--random_init",
    ])
    info = {}
    serve.build_service(args, export_info=info)
    det = info["detector"]

    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 255, (48, 80, 3), np.uint8) for _ in range(batch)]
    canv = np.zeros((batch, ph, pw, 3), np.uint8)
    sizes = np.ones((batch, 2), np.float32)
    for i, im in enumerate(imgs):
        c, hw1, _ = FR.preprocess_image(im, det.cfg)
        canv[i], sizes[i] = c, hw1
    live = det._fused(det.params, canv, sizes)

    exp = jexport.deserialize(bytearray(open(dpath, "rb").read()))
    back = exp.call(canv, sizes)
    for a, b in zip(live, back):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)
