"""Stepwise decode walkthrough (the reference's demo.ipynb, SURVEY.md C20).

Visualises every decode stage on a synthetic two-person scene: input,
nose heatmap, a PAF channel pair, NMS peaks, accepted limb connections,
and the final skeletons. Writes one PNG panel per stage.

Run:  python examples/walkthrough.py --outdir /tmp/walkthrough
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def synthetic_person(cx, cy, size=120.0):
    from tpupose import topology

    rel = {
        "nose": (0.0, -0.95), "neck": (0.0, -0.65),
        "Rsho": (-0.30, -0.65), "Relb": (-0.42, -0.30), "Rwri": (-0.45, 0.05),
        "Lsho": (0.30, -0.65), "Lelb": (0.42, -0.30), "Lwri": (0.45, 0.05),
        "Rhip": (-0.18, 0.10), "Rkne": (-0.20, 0.55), "Rank": (-0.20, 0.95),
        "Lhip": (0.18, 0.10), "Lkne": (0.20, 0.55), "Lank": (0.20, 0.95),
        "Reye": (-0.08, -1.02), "Leye": (0.08, -1.02),
        "Rear": (-0.17, -0.98), "Lear": (0.17, -0.98),
    }
    out = np.zeros((18, 3))
    for name, (dx, dy) in rel.items():
        out[topology.PART_INDEX[name]] = (cx + dx * size, cy + dy * size * 0.5, 0.0)
    return out


def colorize(gray: np.ndarray) -> np.ndarray:
    import cv2

    g = np.clip(gray, 0, 1)
    return cv2.applyColorMap((g * 255).astype(np.uint8), cv2.COLORMAP_JET)


def main() -> int:
    import cv2

    from tpupose import topology
    from tpupose.config import DEFAULT
    from tpupose.decode import decode_maps, to_people
    from tpupose.decode.peaks import find_peaks
    from tpupose.reference_impl import gt_np
    from tpupose.utils.drawing import draw_people

    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="walkthrough_out")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    # --- scene: GT-derived maps stand in for network output ----------------
    joints = np.stack([synthetic_person(120.0, 200.0), synthetic_person(260.0, 180.0)])
    labels = gt_np.create_heatmaps_np(joints)
    heat = cv2.resize(labels[:, :, 38:], (368, 368), interpolation=cv2.INTER_CUBIC)
    paf = cv2.resize(labels[:, :, :38], (368, 368), interpolation=cv2.INTER_CUBIC)
    heat += np.random.default_rng(1).normal(size=heat.shape) * 1e-3
    heat = heat.astype(np.float32)
    paf = paf.astype(np.float32)

    image = np.full((368, 368, 3), 40, np.uint8)
    cv2.imwrite(f"{args.outdir}/0_input.png", image)

    # --- stage 1: heatmap channel ------------------------------------------
    cv2.imwrite(f"{args.outdir}/1_heatmap_nose.png", colorize(heat[:, :, 0]))

    # --- stage 2: PAF channel pair (neck->Rsho = limb 6 -> channels 12/13) --
    mag = np.sqrt(paf[:, :, 12] ** 2 + paf[:, :, 13] ** 2)
    cv2.imwrite(f"{args.outdir}/2_paf_neck_rsho.png", colorize(mag))

    # --- stage 3: NMS peaks --------------------------------------------------
    cfg = DEFAULT.inference
    pk = find_peaks(heat, max_peaks=cfg.max_peaks, sigma=cfg.peak_sigma,
                    thre1=cfg.thre1)
    canvas = image.copy()
    xs, ys, va = np.asarray(pk["xs"]), np.asarray(pk["ys"]), np.asarray(pk["valid"])
    for part in range(18):
        for i in np.nonzero(va[part])[0]:
            cv2.circle(canvas, (int(xs[part, i]), int(ys[part, i])), 4,
                       topology.DRAW_COLORS[part], -1)
    cv2.imwrite(f"{args.outdir}/3_peaks.png", canvas)

    # --- stage 4+5: connections + assembled skeletons -----------------------
    tables = decode_maps(heat, paf, cfg)
    people = to_people({k: np.asarray(v) for k, v in tables.items()})
    overlay = draw_people(image, people)
    cv2.imwrite(f"{args.outdir}/4_skeletons.png", overlay)

    print(f"{len(people)} people decoded; panels in {args.outdir}/")
    for i, p in enumerate(people):
        print(f"  person {i}: {p['num_parts']} parts, score {p['score']:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
