"""Deployment bundle (.tppx) tests: export -> load -> serve parity.

The contract: a bundle written by ``deploy.save_bundle`` reproduces the
live estimator's people JSON bit-identically, loads without the flax
model being re-traced (fresh-subprocess proof), fails loudly on
corruption, and drops into the HTTP server via ``serve --program``.
"""

import json
import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

from tpupose.config import PoseConfig, InferenceConfig, ModelConfig
from tpupose.deploy import load_bundle, save_bundle
from tpupose.infer import PoseEstimator

BUCKET = (96, 96)


@pytest.fixture(scope="module")
def est():
    cfg = PoseConfig(
        model=ModelConfig(num_stages=1, compute_dtype="float32"),
        inference=InferenceConfig(
            scale_search=(0.5,), max_peaks=16, max_people=16
        ),
    )
    return PoseEstimator(cfg)


@pytest.fixture(scope="module")
def bundle(est, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("deploy") / "model.tppx")
    manifest = save_bundle(path, est, [BUCKET], max_batch=2)
    assert [tuple(b) for b in manifest["buckets"]] == [BUCKET]
    assert sorted(p["n"] for p in manifest["programs"]) == [1, 2]
    return path


def _batch(seed=0, n=2):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, *BUCKET, 3)).astype(np.uint8)


def test_bundle_roundtrip_bit_identical(est, bundle):
    dep = load_bundle(bundle)
    imgs = _batch()
    valid = np.asarray([[96, 96], [80, 64]], np.int32)
    live = est.process_batch(imgs, valid_hw=valid)
    packed = dep.process_batch(imgs, valid_hw=valid)
    assert json.dumps(live, sort_keys=True) == json.dumps(
        packed, sort_keys=True
    )
    # default valid_hw = full canvas must equal an explicit full mask
    full = np.asarray([[96, 96]] * 2, np.int32)
    assert json.dumps(dep.process_batch(imgs), sort_keys=True) == (
        json.dumps(dep.process_batch(imgs, valid_hw=full), sort_keys=True)
    )


def test_bundle_single_image_routes_through_buckets(est, bundle):
    dep = load_bundle(bundle)
    img = _batch(seed=3, n=1)[0][:80, :64]   # off-ladder shape
    out = dep.process(img, draw=True)
    assert isinstance(out["people"], list)
    assert out["canvas"].shape == img.shape
    # same people as the live estimator pushed through the same bucket
    from tpupose.buckets import to_bucket, unscale_people

    bh, bw = BUCKET
    canvas, vh, vw = to_bucket(img, bh, bw, 1.0)
    live = est.process_batch(
        canvas[None], valid_hw=np.asarray([[vh, vw]], np.int32)
    )[0]
    assert json.dumps(out["people"], sort_keys=True) == json.dumps(
        unscale_people(live, 1.0), sort_keys=True
    )


def test_bundle_bucketed_runner_dropin(est, bundle):
    """DeployedEstimator drops into buckets.BucketedRunner unchanged:
    it implements process_batch_async/_finish, and batch sizes between
    exported programs are padded up to the next exported power of two
    internally, so the runner's pad-to-batch_size behavior lands on an
    exported program (round-4 advisor, medium)."""
    from tpupose.buckets import BucketedRunner

    dep = load_bundle(bundle)
    rng = np.random.default_rng(11)
    # mixed off-ladder shapes; 3 images with batch_size=2 exercises a
    # full flush plus a padded remainder flush
    images = [
        rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        for h, w in [(96, 96), (80, 64), (50, 90)]
    ]
    packed = BucketedRunner(
        dep, buckets=dep.buckets, scales=dep.scales, batch_size=2
    ).process_many(images)
    live = BucketedRunner(
        est, buckets=dep.buckets, scales=dep.scales, batch_size=2
    ).process_many(images)
    assert json.dumps(packed, sort_keys=True) == json.dumps(
        live, sort_keys=True
    )


def test_bundle_pow2_padding_and_ceiling(est, tmp_path):
    """A bundle exported with --max-batch 5 carries batch-1/2/4/8
    programs; its serving ceiling is the exported pow2 top (8), and an
    odd submission (n=3) pads up to the n=4 program with padded rows
    dropped (round-4 advisor: ceiling compared against the raw arg)."""
    path = str(tmp_path / "five.tppx")
    manifest = save_bundle(path, est, [BUCKET], max_batch=5)
    assert sorted(p["n"] for p in manifest["programs"]) == [1, 2, 4, 8]
    dep = load_bundle(path)
    assert dep.max_batch == 8

    imgs = _batch(seed=9, n=3)
    live = est.process_batch(imgs)
    assert json.dumps(dep.process_batch(imgs), sort_keys=True) == (
        json.dumps(live, sort_keys=True)
    )
    # n=6 rides the n=8 program even though the raw --max-batch was 5
    imgs6 = _batch(seed=10, n=6)
    assert json.dumps(dep.process_batch(imgs6), sort_keys=True) == (
        json.dumps(est.process_batch(imgs6), sort_keys=True)
    )


def test_bundle_rejects_foreign_scales_and_shapes(bundle):
    dep = load_bundle(bundle)
    imgs = _batch()
    with pytest.raises(ValueError, match="compiled into the artifact"):
        dep.process_batch(imgs, scales=(1.0,))
    # exported ladder scales pass through fine
    dep.process_batch(imgs, scales=dep.scales)
    with pytest.raises(ValueError, match="no program"):
        dep.process_batch(np.zeros((4, 96, 96, 3), np.uint8))
    with pytest.raises(ValueError, match="no program"):
        dep.process_batch(np.zeros((1, 64, 96, 3), np.uint8))


def test_bundle_corruption_detected(bundle, tmp_path):
    bad = str(tmp_path / "bad.tppx")
    with zipfile.ZipFile(bundle) as zin, zipfile.ZipFile(bad, "w") as zout:
        for info in zin.infolist():
            data = zin.read(info.filename)
            if info.filename.startswith("programs/"):
                data = data[:100] + bytes([data[100] ^ 0xFF]) + data[101:]
            zout.writestr(info, data)
    with pytest.raises(ValueError, match="sha256 mismatch"):
        load_bundle(bad)

    worse = str(tmp_path / "worse.tppx")
    with zipfile.ZipFile(bundle) as zin, zipfile.ZipFile(worse, "w") as zout:
        for info in zin.infolist():
            data = zin.read(info.filename)
            if info.filename == "manifest.json":
                m = json.loads(data)
                m["format"] = "tppx-v999"
                data = json.dumps(m).encode()
            zout.writestr(info, data)
    with pytest.raises(ValueError, match="unsupported bundle format"):
        load_bundle(worse)


def test_bundle_fresh_process_no_model_code(est, bundle, tmp_path):
    """A fresh interpreter loads the bundle and reproduces the live
    output without ever constructing the flax model (the module is
    asserted absent from sys.modules after inference)."""
    imgs = _batch(seed=7)
    np.save(tmp_path / "imgs.npy", imgs)
    expected = json.dumps(est.process_batch(imgs), sort_keys=True)
    code = f"""
import json, sys
import numpy as np
from tpupose.deploy import load_bundle
dep = load_bundle({bundle!r})
imgs = np.load({str(tmp_path / 'imgs.npy')!r})
people = dep.process_batch(imgs)
assert "tpupose.models.openpose" not in sys.modules, "model code was imported"
print(json.dumps(people, sort_keys=True))
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == expected


def test_bundle_serves_http(bundle):
    import http.client

    from tpupose.serve import serve

    dep = load_bundle(bundle)
    srv = serve(dep, port=0, max_batch=2, buckets=dep.buckets,
                request_timeout_s=600.0)
    try:
        host, port = srv.server_address[:2]
        c = http.client.HTTPConnection(host, port, timeout=600)
        c.request("GET", "/healthz")
        r = c.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["pretrained"] is False
        import cv2

        img = _batch(seed=5, n=1)[0]
        ok, enc = cv2.imencode(".png", img)
        assert ok
        c.request("POST", "/pose", body=enc.tobytes())
        r = c.getresponse()
        assert r.status == 200
        assert isinstance(json.loads(r.read())["people"], list)
    finally:
        srv.shutdown()
        if srv.batcher is not None:
            srv.batcher.close()


def test_serve_main_rejects_conflicting_flags(bundle, tmp_path):
    from tpupose import serve as serve_mod

    rc = serve_mod.main(["--program", bundle, "--weights", "x.h5"])
    assert rc == 2
    rc = serve_mod.main(["--program", bundle, "--dp", "2"])
    assert rc == 2
    rc = serve_mod.main(["--program", bundle, "--buckets", "64x64"])
    assert rc == 2
    rc = serve_mod.main(["--program", bundle, "--max-batch", "16"])
    assert rc == 2
    rc = serve_mod.main(["--program", str(tmp_path / "missing.tppx")])
    assert rc == 2


def test_cli_export_program(tmp_path):
    from tpupose import cli

    out = str(tmp_path / "tiny.tppx")
    rc = cli.main([
        "export-program", "--output", out, "--buckets", "96x96",
        "--max-batch", "1", "--scales", "0.5", "--stages", "1",
    ])
    assert rc == 0
    dep = load_bundle(out)
    assert dep.buckets == ((96, 96),)
    people = dep.process_batch(_batch(seed=1, n=1))
    assert len(people) == 1
