#!/usr/bin/env python
"""Stage-swap ablation on the LONG fixture's pre-blackout turn segment.

The 256-frame corridor fixture's drift excess concentrates in the first
S-curve (frames ~40-100, scripts/ablate_long_drift.py). This runs the
reference loop SKELETON (scripts/ablate_accuracy.py machinery) over the
150 pre-blackout frames with each engine stage independently swapped in
against the cv2 baseline — localizing which stage carries the
turn-onset heading bias.

Usage: python scripts/ablate_long_stages.py [run-letters, default all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np

import ablate_accuracy as aa  # sets up jax CPU platform on import
from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.eval import ate_rmse

_FIX = "/root/repo/.test_fixture_long.npz"
_FEAT_CACHE = "/root/repo/.ablate_long_feats.npz"


def _cfg_ref():
    return VOConfig(
        extractor_type="sift",
        max_keypoints=2048,
        sift_n_features=2048,
        sift_contrast_threshold=0.02,
        min_median_flow=3.0,
        max_reproj_err=2.0,
        pnp_reproj_err=2.0,
        min_depth=1.0,
        lowe_ratio=0.75,
        global_scale=1.2,
        image_size=(640, 360),
    )


def _features(u8, cfg):
    if os.path.exists(_FEAT_CACHE):
        d = np.load(_FEAT_CACHE, allow_pickle=True)
        fe_cv2 = list(zip(d["cv2_kps"], d["cv2_des"]))
        fe_tpu = list(zip(d["tpu_kps"], d["tpu_des"]))
        return fe_cv2, fe_tpu
    t0 = time.time()
    fe_cv2 = aa.cv2_features(u8, cfg)
    print(f"cv2 feats {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    fe_tpu = aa.tpu_features(u8, cfg)
    print(f"tpu feats {time.time() - t0:.0f}s", flush=True)
    np.savez(
        _FEAT_CACHE,
        cv2_kps=np.asarray([k for k, _ in fe_cv2], object),
        cv2_des=np.asarray([d for _, d in fe_cv2], object),
        tpu_kps=np.asarray([k for k, _ in fe_tpu], object),
        tpu_des=np.asarray([d for _, d in fe_tpu], object),
        allow_pickle=True,
    )
    return fe_cv2, fe_tpu


def main():
    want = set(sys.argv[1]) if len(sys.argv) > 1 else None
    d = np.load(_FIX, allow_pickle=True)
    u8, gt = d["u8"], d["gt"]
    b0 = int(d["blank"][0])
    u8, gt = u8[:b0], gt[:b0]
    K = np.asarray(d["K"], np.float64)
    cfg = _cfg_ref()

    fe_cv2, fe_tpu = _features(u8, cfg)
    fe_tpu_fo = None
    if want and want & set("KLMNOP"):
        cache_fo = "/root/repo/.ablate_long_feats_fo.npz"
        if os.path.exists(cache_fo):
            d2 = np.load(cache_fo, allow_pickle=True)
            fe_tpu_fo = list(zip(d2["kps"], d2["des"]))
        else:
            t0 = time.time()
            fe_tpu_fo = aa.tpu_features(
                u8,
                cfg.replace(sift_num_octaves=4, sift_first_octave=-1),
            )
            print(f"tpu fo-1 feats {time.time() - t0:.0f}s", flush=True)
            np.savez(
                cache_fo,
                kps=np.asarray([k for k, _ in fe_tpu_fo], object),
                des=np.asarray([d for _, d in fe_tpu_fo], object),
                allow_pickle=True,
            )

    def stages(which, cfg):
        return dict(
            match=(
                aa.make_cv2_match if which["match"] == "cv2" else aa.make_tpu_match
            )(cfg.lowe_ratio),
            essential=(
                aa.make_cv2_essential
                if which["ess"] == "cv2"
                else aa.make_tpu_essential
            )(K, cfg),
            pnp=(aa.make_cv2_pnp if which["pnp"] == "cv2" else aa.make_tpu_pnp)(
                K, cfg
            ),
            triangulate=(
                aa.make_cv2_triangulate
                if which["tri"] == "cv2"
                else aa.make_tpu_triangulate
            )(K, cfg),
        )

    CV2 = {"match": "cv2", "ess": "cv2", "pnp": "cv2", "tri": "cv2"}
    TPU = {"match": "tpu", "ess": "tpu", "pnp": "tpu", "tri": "tpu"}
    runs = [
        ("A cv2 feats + all-cv2    ", fe_cv2, CV2),
        ("B tpu feats + all-cv2    ", fe_tpu, CV2),
        ("C cv2 feats + tpu match  ", fe_cv2, {**CV2, "match": "tpu"}),
        ("D cv2 feats + tpu ess    ", fe_cv2, {**CV2, "ess": "tpu"}),
        ("E cv2 feats + tpu pnp    ", fe_cv2, {**CV2, "pnp": "tpu"}),
        ("F cv2 feats + tpu tri    ", fe_cv2, {**CV2, "tri": "tpu"}),
        ("G cv2 feats + pnp+tri    ", fe_cv2, {**CV2, "pnp": "tpu", "tri": "tpu"}),
        ("I cv2 feats + all-tpu    ", fe_cv2, TPU),
        ("J tpu feats + all-tpu    ", fe_tpu, TPU),
        ("K tpufo1 feats + all-tpu ", fe_tpu_fo, TPU),
        ("L tpufo1 feats + all-cv2 ", fe_tpu_fo, CV2),
        ("M tpufo1 feats + tpu pnp ", fe_tpu_fo, {**CV2, "pnp": "tpu"}),
        ("N tpufo1 feats + tpu tri ", fe_tpu_fo, {**CV2, "tri": "tpu"}),
        ("O tpufo1 feats + tpu ess ", fe_tpu_fo, {**CV2, "ess": "tpu"}),
        ("P tpufo1 feats + tpu mtch", fe_tpu_fo, {**CV2, "match": "tpu"}),
    ]
    for name, feats, which in runs:
        if want and name[0] not in want:
            continue
        pos, st = aa.run_loop(feats, K, cfg, **stages(which, cfg))
        ate = float(ate_rmse(pos[8:], gt[8:], align="sim3"))
        # drift growth to localize in time
        wd = [
            f"{t}:{float(ate_rmse(pos[8:t], gt[8:t], align='sim3')):.2f}"
            for t in (38, 68, 98, 128, 150)
        ]
        print(
            f"{name} ATE {ate:7.3f} resets {st['resets']} "
            f"kf {st['keyframes']} medinl {st['med_inl']:.0f}  {wd}",
            flush=True,
        )


if __name__ == "__main__":
    main()
