#!/usr/bin/env python
"""Parameter sweeps on top of the stage-ablation harness: quantify how
much of the PnP and feature-extraction accuracy losses each candidate
fix recovers. See scripts/ablate_accuracy.py for the harness itself."""

from __future__ import annotations

import sys

from ablate_accuracy import (  # noqa: F401  (configures jax for CPU)
    cv2_features,
    tpu_features,
    make_cv2_match,
    make_cv2_essential,
    make_cv2_pnp,
    make_cv2_triangulate,
    make_tpu_match,
    make_tpu_essential,
    make_tpu_pnp,
    make_tpu_triangulate,
    run_loop,
)

import numpy as np

from visualodometry_tpu.eval import ate_rmse

sys.path.insert(0, "/root/repo")
from bench import _build_cfg, _load_fixture, _reference_cfg


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pnp"
    u8, gt, K = _load_fixture()
    K = np.asarray(K, np.float64)
    ref_cfg = _reference_cfg()
    tpu_cfg = _build_cfg()

    fe_cv2 = cv2_features(u8, ref_cfg)

    def report(name, feats, cfg, **stage_over):
        stages = dict(
            match=make_cv2_match(cfg.lowe_ratio),
            essential=make_cv2_essential(K, cfg),
            pnp=make_cv2_pnp(K, cfg),
            triangulate=make_cv2_triangulate(K, cfg),
        )
        stages.update(stage_over)
        pos, st = run_loop(feats, K, cfg, **stages)
        ate = float(ate_rmse(pos[8:], gt[8:], align="sim3"))
        print(f"{name:58s} ATE {ate:8.4f} resets {st['resets']} "
              f"medinl {st['med_inl']:.0f}", flush=True)
        return ate

    if which == "pnp":
        report("E0 cv2 pnp (control)", fe_cv2, ref_cfg)
        for rounds in (1, 2, 3, 4):
            for iters in (10, 20):
                cfg = ref_cfg.replace(
                    pnp_refine_rounds=rounds, pnp_refine_iters=iters
                )
                report(
                    f"E  tpu pnp rounds={rounds} iters={iters}",
                    fe_cv2, cfg, pnp=make_tpu_pnp(K, cfg),
                )
        for hyp in (512, 1024):
            cfg = ref_cfg.replace(
                pnp_refine_rounds=3, pnp_refine_iters=10, pnp_hypotheses=hyp
            )
            report(
                f"E  tpu pnp rounds=3 hyp={hyp}",
                fe_cv2, cfg, pnp=make_tpu_pnp(K, cfg),
            )
    elif which == "feat":
        for contrast, peaks in (
            (0.02, 1), (0.01, 1), (0.005, 1), (0.02, 2), (0.01, 2)
        ):
            fcfg = tpu_cfg.replace(
                sift_contrast_threshold=contrast, sift_orientation_peaks=peaks
            )
            fe = tpu_features(u8, fcfg)
            med = np.median([len(k) for k, _ in fe])
            report(
                f"B  tpu feats contrast={contrast} peaks={peaks} (med {med:.0f} kps)",
                fe, ref_cfg,
            )
    elif which == "ess":
        for hyp in (256, 512, 1024):
            for thr in (1.0, 0.75):
                cfg = ref_cfg.replace(
                    essential_hypotheses=hyp, init_ransac_thresh=thr
                )
                report(
                    f"D  tpu essential hyp={hyp} thr={thr}",
                    fe_cv2, cfg, essential=make_tpu_essential(K, cfg),
                )
    elif which == "tri":
        report("F  tpu triangulate (control)", fe_cv2, ref_cfg,
               triangulate=make_tpu_triangulate(K, ref_cfg))


if __name__ == "__main__":
    main()
