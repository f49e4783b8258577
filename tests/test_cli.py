"""CLI surface tests (CPU-sized): argparse wiring, prepare, train/finetune
smoke runs on the synthetic feed with a reduced model, demo-image."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "tpupose.cli", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=cwd or REPO,
        timeout=900,
    )


def test_help():
    r = run_cli(["--help"])
    assert r.returncode == 0
    for cmd in ("demo-image", "demo-video", "prepare", "train", "finetune",
                "eval", "bench"):
        assert cmd in r.stdout


def test_train_synthetic_smoke(tmp_path):
    r = run_cli(
        [
            "train", "--dataset", "synthetic", "--max-steps", "2",
            "--batch-size", "2", "--boxsize", "64", "--stages", "1",
            "--workdir", str(tmp_path / "run"),
            "--val-dataset", "synthetic", "--val-every", "2",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["steps"] == 2
    assert np.isfinite(out["last_losses"]["total"])
    # checkpoint + CSV artifacts exist (reference artifact parity)
    assert os.path.exists(tmp_path / "run" / "training.csv")
    assert os.path.isdir(tmp_path / "run" / "checkpoints")
    # --val-dataset: held-out losses land in validation.csv
    val_lines = (
        (tmp_path / "run" / "validation.csv").read_text().strip().splitlines()
    )
    assert val_lines[0].startswith("step,")
    assert len(val_lines) >= 2


def test_finetune_resumes_from_checkpoint(tmp_path):
    wd = str(tmp_path / "run")
    common = ["--dataset", "synthetic", "--max-steps", "2", "--batch-size", "2",
              "--boxsize", "64", "--stages", "1", "--workdir", wd]
    r1 = run_cli(["finetune", *common])
    assert r1.returncode == 0, r1.stderr[-2000:]
    # second invocation restores step=2 and runs 2 more
    r2 = run_cli(["finetune", *common[:3], "4", *common[4:]])
    assert r2.returncode == 0, r2.stderr[-2000:]
    out = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out["steps"] == 2  # resumed from 2 -> 4


def test_demo_image(tmp_path):
    import cv2

    img_path = str(tmp_path / "in.png")
    out_path = str(tmp_path / "out.png")
    cv2.imwrite(
        img_path,
        np.random.default_rng(0).integers(0, 255, (96, 96, 3)).astype(np.uint8),
    )
    r = run_cli(
        ["demo-image", "--image", img_path, "--output", out_path,
         "--scales", "0.5", "--stages", "1"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    people = json.loads(r.stdout)
    assert isinstance(people, list)
    assert "untrained" in r.stderr
    assert os.path.exists(out_path)


def test_demo_image_from_trained_checkpoint(tmp_path):
    """train -> demo-image --checkpoint: the native Orbax checkpoint the
    trainer writes loads straight into the inference CLI (no .h5 round
    trip), and counts as pretrained."""
    import cv2

    wd = str(tmp_path / "run")
    r = run_cli(
        ["train", "--dataset", "synthetic", "--max-steps", "1",
         "--batch-size", "2", "--boxsize", "64", "--stages", "1",
         "--workdir", wd]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    img_path = str(tmp_path / "in.png")
    cv2.imwrite(
        img_path,
        np.random.default_rng(1).integers(0, 255, (96, 96, 3)).astype(np.uint8),
    )
    r = run_cli(
        ["demo-image", "--image", img_path, "--scales", "0.5",
         "--stages", "1", "--boxsize", "64",
         "--checkpoint", os.path.join(wd, "checkpoints")]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "untrained" not in r.stderr
    assert isinstance(json.loads(r.stdout), list)
    # a bogus dir is a clean error, not a silent random-init fallback
    r = run_cli(
        ["demo-image", "--image", img_path, "--stages", "1",
         "--checkpoint", str(tmp_path / "nope")]
    )
    assert r.returncode != 0
    assert "no checkpoint found" in r.stderr


def test_demo_image_missing_file():
    r = run_cli(["demo-image", "--image", "/nonexistent.png", "--stages", "1"])
    assert r.returncode == 2
    assert "cannot read" in r.stderr


def test_demo_image_config_ini_and_json(tmp_path):
    """--config (reference INI) + --json: the migration-surface flags."""
    import cv2

    img_path = str(tmp_path / "in.png")
    json_path = str(tmp_path / "people.json")
    ini_path = str(tmp_path / "config")
    cv2.imwrite(
        img_path,
        np.random.default_rng(1).integers(0, 255, (96, 96, 3)).astype(np.uint8),
    )
    # reference-format INI pinning a single 0.5 scale (keeps the run small)
    with open(ini_path, "w") as f:
        f.write("[param]\nscale_search = [0.5]\nthre1 = 0.1\nthre2 = 0.05\n"
                "[model1]\nboxsize = 368\nstride = 8\npadValue = 128\n")
    r = run_cli(
        ["demo-image", "--image", img_path, "--json", json_path,
         "--config", ini_path, "--stages", "1"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(json_path) as f:
        people = json.load(f)
    assert people == json.loads(r.stdout[r.stdout.index("["):])


def test_train_vgg19_npz_init(tmp_path):
    """--vgg19-npz overlays ImageNet convs onto a fresh init (from_vgg)."""
    npz = str(tmp_path / "vgg19.npz")
    rng = np.random.default_rng(2)
    np.savez(
        npz,
        conv1_1_kernel=rng.normal(size=(3, 3, 3, 64)).astype(np.float32),
        conv1_1_bias=rng.normal(size=(64,)).astype(np.float32),
    )
    r = run_cli(
        [
            "train", "--dataset", "synthetic", "--max-steps", "1",
            "--batch-size", "2", "--boxsize", "64", "--stages", "1",
            "--vgg19-npz", npz, "--workdir", str(tmp_path / "run"),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "not found" not in r.stderr
    assert "overlay: 2 arrays applied" in r.stdout

    # ADVICE r3: combining --vgg19-npz with a restored checkpoint must warn
    # (the overlay overwrites the restored VGG convs)
    r2 = run_cli(
        [
            "train", "--dataset", "synthetic", "--max-steps", "2",
            "--batch-size", "2", "--boxsize", "64", "--stages", "1",
            "--vgg19-npz", npz, "--workdir", str(tmp_path / "run"),
            "--checkpoint", str(tmp_path / "run" / "checkpoints"),
        ]
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "ON TOP" in r2.stderr


def test_train_vgg19_npz_no_match_warns(tmp_path):
    """ADVICE r3: a wrongly-keyed npz must not silently no-op."""
    npz = str(tmp_path / "bad.npz")
    np.savez(npz, totally_wrong_key=np.zeros((3, 3), np.float32))
    r = run_cli(
        [
            "train", "--dataset", "synthetic", "--max-steps", "1",
            "--batch-size", "2", "--boxsize", "64", "--stages", "1",
            "--vgg19-npz", npz, "--workdir", str(tmp_path / "run"),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "had no effect" in r.stderr


def test_walkthrough_example_runs_against_current_decode(tmp_path):
    """examples/walkthrough.py (the reference's demo.ipynb, SURVEY C20)
    must keep decoding its two-person scene through the CURRENT decode
    defaults — round-3 VERDICT weak #6 flagged it stale after the decode
    underneath changed; running it in CI pins it to the product path."""
    out = str(tmp_path / "panels")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples/walkthrough.py"),
         "--outdir", out],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "2 people decoded" in r.stdout
    for panel in ("0_input.png", "1_heatmap_nose.png", "2_paf_neck_rsho.png",
                  "3_peaks.png", "4_skeletons.png"):
        assert os.path.exists(os.path.join(out, panel)), panel
    # both skeletons assembled fully (18 parts each on the clean scene)
    assert r.stdout.count("18 parts") == 2


def _eval_dataset(path, image_ids, with_crowd):
    """3 records (two from the same image) with one GT person each;
    optionally a crowd ignore region at [0, 0, 50, 50]."""
    from tpupose.data import hdf5 as hdf5_io

    img = np.zeros((200, 200, 3), np.uint8)
    mask = np.full((200, 200), 255, np.uint8)
    joints = np.zeros((1, 18, 3), np.float64)  # v=0 internal: visible
    joints[0, :, 0] = np.linspace(100, 150, 18)
    joints[0, :, 1] = np.linspace(100, 150, 18)
    with hdf5_io.SampleWriter(path) as w:
        for iid in image_ids:
            w.add(
                img, mask, joints, (125.0, 125.0), 0.3,
                areas=np.asarray([2500.0]),
                image_id=iid,
                ignore_regions=(
                    [[0.0, 0.0, 50.0, 50.0, 2500.0]] if with_crowd else None
                ),
            )
    return joints


def _run_cmd_eval(monkeypatch, capsys, dataset, results_path, joints):
    """cmd_eval with a stubbed estimator: a high-score detection inside
    the crowd box + an exact-match detection on the GT person."""
    import argparse

    from tpupose import cli as cli_mod
    from tpupose import topology

    def person(xs, ys, score):
        return {
            "keypoints": {
                topology.PARTS[i]: {"x": float(x), "y": float(y),
                                    "score": 0.9}
                for i, (x, y) in enumerate(zip(xs, ys))
            },
            "score": score,
            "num_parts": 18,
        }

    people = [
        person(np.linspace(5, 45, 18), np.linspace(5, 45, 18), 10.0),
        person(joints[0, :, 0], joints[0, :, 1], 5.0),
    ]

    class Stub:
        def process(self, image):
            return {"people": people}

    monkeypatch.setattr(cli_mod, "_estimator", lambda args, cfg=None: Stub())
    args = argparse.Namespace(
        dataset=dataset, max_images=0, buckets=None, eval_batch=8,
        coco_results=results_path, annotations=None, images=None,
    )
    if isinstance(dataset, dict):  # annotations mode
        args.dataset = None
        args.annotations = dataset["annotations"]
        args.images = dataset["images"]
    assert cli_mod.cmd_eval(args) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_eval_crowd_ignore_reached_from_cli(tmp_path, monkeypatch, capsys):
    """Round-4 review finding: the crowd/ignore eval semantics must be
    reachable from `cli eval`, i.e. ignore regions stored on the records
    flow into coco_eval so a detection on a crowd is absorbed instead of
    counted as a false positive."""
    crowd_h5 = str(tmp_path / "crowd.h5")
    plain_h5 = str(tmp_path / "plain.h5")
    j = _eval_dataset(crowd_h5, [7, 7, 9], with_crowd=True)
    _eval_dataset(plain_h5, [7, 7, 9], with_crowd=False)

    res = _run_cmd_eval(monkeypatch, capsys, crowd_h5,
                        str(tmp_path / "r1.json"), j)
    # the higher-scored crowd detection matches-to-ignore -> perfect AP
    assert res["AP"] == pytest.approx(1.0)
    res = _run_cmd_eval(monkeypatch, capsys, plain_h5,
                        str(tmp_path / "r2.json"), j)
    # without the region it is a rank-1 false positive -> AP collapses
    assert res["AP"] == pytest.approx(0.5)


def test_eval_coco_results_use_real_image_ids(tmp_path, monkeypatch, capsys):
    """Round-4 review finding: --coco-results must export the ORIGINAL
    COCO image ids carried by the records (deduplicating per-main-person
    repeats of the same image) so the file loads against the real
    annotation set via COCO.loadRes."""
    h5 = str(tmp_path / "d.h5")
    j = _eval_dataset(h5, [7, 7, 9], with_crowd=True)
    out = str(tmp_path / "results.json")
    _run_cmd_eval(monkeypatch, capsys, h5, out, j)
    with open(out) as f:
        records = json.load(f)
    # 2 detections per unique image, record 2 (same image 7) deduplicated
    assert sorted({r["image_id"] for r in records}) == [7, 9]
    assert len(records) == 4
    assert all(len(r["keypoints"]) == 51 for r in records)


def _annotation_set(tmp_path, with_crowd):
    """COCO annotation JSON + image dir matching _eval_dataset's scene:
    one keypointed person per image (ids 7 and 9), crowd on both."""
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    for name in ("a.jpg", "b.jpg"):
        cv2.imwrite(str(img_dir / name), np.zeros((200, 200, 3), np.uint8))
    xs = np.linspace(100, 150, 17)
    kps = []
    for i in range(17):
        kps += [float(xs[i]), float(xs[i]), 2]
    anns = []
    for i, iid in enumerate((7, 9)):
        anns.append({"id": 100 + i, "image_id": iid, "iscrowd": 0,
                     "num_keypoints": 17, "area": 2500.0,
                     "bbox": [100, 100, 50, 50], "keypoints": kps})
        if with_crowd:
            anns.append({"id": 200 + i, "image_id": iid, "iscrowd": 1,
                         "num_keypoints": 0, "area": 2500.0,
                         "bbox": [0, 0, 50, 50], "keypoints": [0] * 51})
    ann = {"images": [{"id": 7, "file_name": "a.jpg", "height": 200,
                       "width": 200},
                      {"id": 9, "file_name": "b.jpg", "height": 200,
                       "width": 200}],
           "annotations": anns}
    path = tmp_path / f"ann_{with_crowd}.json"
    path.write_text(json.dumps(ann))
    return {"annotations": str(path), "images": str(img_dir)}


def test_eval_from_coco_annotations_directly(tmp_path, monkeypatch, capsys):
    """`cli eval --annotations ann.json --images dir` evaluates straight
    from the COCO annotation file (one pass per image, crowd/ignore GT
    included) — the reference-user workflow with no packing step."""
    # detections match the 17 COCO keypoints; the synthesised neck is
    # mid-shoulders, also on the diagonal -> exact GT match
    from tpupose.data.coco_prep import coco_joints_to_parts

    j = np.zeros((1, 18, 3))
    xs = np.linspace(100, 150, 17)
    kps = []
    for i in range(17):
        kps += [float(xs[i]), float(xs[i]), 2]
    j[0] = coco_joints_to_parts(kps)

    res = _run_cmd_eval(monkeypatch, capsys,
                        _annotation_set(tmp_path, with_crowd=True),
                        str(tmp_path / "r1.json"), j)
    assert res["AP"] == pytest.approx(1.0)  # crowd absorbs the rank-1 det
    res = _run_cmd_eval(monkeypatch, capsys,
                        _annotation_set(tmp_path, with_crowd=False),
                        str(tmp_path / "r2.json"), j)
    assert res["AP"] == pytest.approx(0.5)  # ...which is otherwise a FP
    with open(tmp_path / "r1.json") as f:
        records = json.load(f)
    assert sorted({r["image_id"] for r in records}) == [7, 9]


def test_eval_source_flag_validation():
    """--dataset/--annotations are mutually exclusive and one is
    required; --annotations needs --images."""
    r = run_cli(["eval"])
    assert r.returncode == 2
    assert "one of --dataset or --annotations" in r.stderr
    r = run_cli(["eval", "--dataset", "x.h5", "--annotations", "a.json"])
    assert r.returncode == 2
    assert "mutually exclusive" in r.stderr
    r = run_cli(["eval", "--annotations", "a.json"])
    assert r.returncode == 2
    assert "requires --images" in r.stderr
    r = run_cli(["eval", "--dataset", "x.h5", "--dp", "2"])
    assert r.returncode == 2
    assert "--dp requires --buckets" in r.stderr
    r = run_cli(["eval", "--dataset", "x.h5", "--dp", "99",
                 "--buckets", "default"])
    assert r.returncode == 2
    assert "exceeds" in r.stderr


def test_config_flag_error_paths(tmp_path):
    """ADVICE r3: missing/malformed --config exits cleanly with code 2."""
    r = run_cli(["demo-image", "--image", "x.png",
                 "--config", str(tmp_path / "nope.ini")])
    assert r.returncode == 2
    assert "error: cannot read" in r.stderr
    assert "Traceback" not in r.stderr
    bad = tmp_path / "bad.ini"
    bad.write_text("key_without_any_section = 1\n")
    r = run_cli(["demo-image", "--image", "x.png", "--config", str(bad)])
    assert r.returncode == 2
    assert "error: cannot parse" in r.stderr
    assert "Traceback" not in r.stderr


def _write_clip(path, n_frames=10, w=96, h=96, fps=25.0):
    """Synthesize a tiny mp4: a bright square drifting over noise."""
    import cv2

    rng = np.random.default_rng(7)
    bg = rng.integers(0, 120, (h, w, 3)).astype(np.uint8)
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened()
    for i in range(n_frames):
        frame = bg.copy()
        x = 8 + 5 * i
        cv2.rectangle(frame, (x, 20), (x + 16, 60), (255, 255, 255), -1)
        wr.write(frame)
    wr.release()


def test_demo_video_e2e(tmp_path):
    """demo-video end-to-end (round-4 VERDICT weak #6): the video IO
    loop, frames-in-flight pipelining and --track/--smooth wiring run
    against a real (1-stage) estimator on a synthetic clip; the overlay
    video comes back with one frame per input frame."""
    import cv2

    clip = str(tmp_path / "in.mp4")
    out = str(tmp_path / "out.mp4")
    _write_clip(clip, n_frames=6)
    r = run_cli(
        ["demo-video", "--input", clip, "--output", out,
         "--track", "--smooth", "0.5", "--max-frames", "6",
         "--stages", "1", "--boxsize", "64"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "6 frames" in r.stderr
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape[2] == 3
        n += 1
    cap.release()
    assert n == 6


def test_demo_video_tracking_stable_ids(tmp_path, monkeypatch):
    """demo-video --track assigns ONE stable id to a person drifting
    across frames. Drives cmd_demo_video in-process with a fake
    estimator emitting real decode tables (a person moving 3 px/frame),
    so the tracker/smoother/id-overlay wiring — not the CNN — is under
    test deterministically."""
    import cv2

    from tpupose import cli, topology

    clip = str(tmp_path / "in.mp4")
    out = str(tmp_path / "out.mp4")
    _write_clip(clip, n_frames=5)

    seen_ids = []

    class FakeEstimator:
        pretrained = True

        def __init__(self):
            self.calls = 0

        def process_async(self, image):
            i = self.calls
            self.calls += 1
            P = topology.NUM_PARTS
            return {
                "rows": np.arange(P, dtype=np.int32)[None, :],
                "score": np.asarray([12.0]),
                "cnt": np.asarray([P], np.int32),
                "valid": np.asarray([True]),
                "peak_xs": np.full(P, 20.0 + 3.0 * i),
                "peak_ys": np.linspace(10.0, 60.0, P),
                "peak_scores": np.full(P, 0.9),
            }

    fake = FakeEstimator()
    monkeypatch.setattr(cli, "_estimator", lambda args, cfg=None: fake)

    from tpupose.tracking import PoseTracker

    orig_update = PoseTracker.update

    def spying_update(self, people):
        people = orig_update(self, people)
        seen_ids.append([p["track_id"] for p in people])
        return people

    monkeypatch.setattr(PoseTracker, "update", spying_update)
    rc = cli.main(
        ["demo-video", "--input", clip, "--output", out,
         "--track", "--smooth", "0.5", "--max-frames", "5", "--stages", "1"]
    )
    assert rc == 0
    assert fake.calls == 5
    # every frame produced exactly one tracked person with the SAME id
    assert len(seen_ids) == 5
    assert all(len(ids) == 1 for ids in seen_ids), seen_ids
    assert len({ids[0] for ids in seen_ids}) == 1, seen_ids
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 5


def test_max_peaks_flag_rebuilds_tier_ladders():
    """--max-peaks raises the decode capacity and keeps the tier
    ladders consistent: tiers >= the new cap are dropped, and raising
    past 96 inserts 96 as a middle tier (docs/serving.md crowd
    envelope)."""
    import argparse

    from tpupose import cli as cli_mod

    def cfg_for(mp):
        ns = argparse.Namespace(
            config=None, scales=None, boxsize=None, stages=None,
            decode_groups=None, max_peaks=mp, weights=None,
            checkpoint=None)
        return cli_mod._config(ns)

    base = cfg_for(None)
    assert base.inference.max_peaks == 96

    crowd = cfg_for(128)
    assert crowd.inference.max_peaks == 128
    assert crowd.inference.pair_tiers == (8, 16, 32, 64, 96)
    assert all(t < 128 for t in crowd.inference.peak_compact_tiers)

    tight = cfg_for(32)
    assert tight.inference.max_peaks == 32
    assert tight.inference.pair_tiers == (8, 16)
    assert all(t < 32 for t in tight.inference.peak_compact_tiers)
