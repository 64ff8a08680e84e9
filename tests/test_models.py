"""Tests for the learned-model components (SuperPoint, attention matcher).

Without released weights (no network), these verify the architecture
contracts: shapes, masks, jit-ability, depth-to-space layout, NMS, the
residual-identity initialization of the attention matcher (untrained ==
dual-softmax mutual NN on descriptors), and torch->flax weight conversion
round-trips on a synthetic checkpoint.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.models.attention_matcher import (
    AttentionMatcher,
    assignment_from_scores,
    normalize_kps,
)
from visualodometry_tpu.models.superpoint import (
    heatmap_from_logits,
    init_superpoint,
    nms_heatmap,
    superpoint_extract,
)


class TestSuperPoint:
    def test_shapes_and_jit(self):
        model, params = init_superpoint(jax.random.key(0), input_hw=(120, 160))
        img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (120, 160)),
                          jnp.float32)
        feats = jax.jit(
            lambda im: superpoint_extract(model, params, im, max_keypoints=256)
        )(img)
        assert feats.kps.shape == (256, 2)
        assert feats.desc.shape == (256, 256)
        assert feats.valid.shape == (256,)
        d = np.asarray(feats.desc)
        v = np.asarray(feats.valid)
        if v.any():
            np.testing.assert_allclose(
                np.linalg.norm(d[v], axis=1), 1.0, atol=1e-4
            )

    def test_depth_to_space_layout(self):
        # put all probability mass in cell channel c=8*3+5 -> pixel (3, 5)
        hc, wc = 2, 2
        logits = np.full((hc, wc, 65), -10.0, np.float32)
        logits[0, 0, 8 * 3 + 5] = 10.0
        heat = np.asarray(heatmap_from_logits(jnp.asarray(logits)))
        assert heat.shape == (16, 16)
        assert np.unravel_index(heat.argmax(), heat.shape) == (3, 5)

    def test_nms(self):
        heat = np.zeros((32, 32), np.float32)
        heat[10, 10] = 1.0
        heat[12, 12] = 0.5  # within radius 4 of the stronger peak
        heat[25, 25] = 0.8
        out = np.asarray(nms_heatmap(jnp.asarray(heat), radius=4))
        assert out[10, 10] == 1.0
        assert out[12, 12] == 0.0
        assert out[25, 25] == 0.8

    def test_weight_conversion(self, tmp_path):
        import torch

        from visualodometry_tpu.models.convert import load_torch_superpoint

        model, params = init_superpoint(jax.random.key(0), input_hw=(64, 64))
        # synthesize a torch state_dict with the standard names/shapes
        rng = np.random.default_rng(0)
        shapes = {
            "conv1a": (64, 1, 3, 3), "conv1b": (64, 64, 3, 3),
            "conv2a": (64, 64, 3, 3), "conv2b": (64, 64, 3, 3),
            "conv3a": (128, 64, 3, 3), "conv3b": (128, 128, 3, 3),
            "conv4a": (128, 128, 3, 3), "conv4b": (128, 128, 3, 3),
            "convPa": (256, 128, 3, 3), "convPb": (65, 256, 1, 1),
            "convDa": (256, 128, 3, 3), "convDb": (256, 256, 1, 1),
        }
        sd = {}
        for name, sh in shapes.items():
            sd[f"{name}.weight"] = torch.tensor(
                rng.normal(size=sh).astype(np.float32)
            )
            sd[f"{name}.bias"] = torch.tensor(
                rng.normal(size=sh[0]).astype(np.float32)
            )
        ckpt = tmp_path / "sp.pth"
        torch.save(sd, ckpt)

        new_params = load_torch_superpoint(str(ckpt), params)
        k = np.asarray(new_params["params"]["conv3a"]["kernel"])
        expect = np.transpose(sd["conv3a.weight"].numpy(), (2, 3, 1, 0))
        np.testing.assert_allclose(k, expect)
        # converted params actually run
        img = jnp.zeros((64, 64))
        feats = superpoint_extract(model, new_params, img, max_keypoints=128)
        assert np.isfinite(np.asarray(feats.desc)).all()


class TestAttentionMatcher:
    def _planted(self, rng, n=128, d=256, pairs=40):
        base = rng.normal(size=(pairs, d)).astype(np.float32)
        d0 = rng.normal(size=(n, d)).astype(np.float32)
        d1 = rng.normal(size=(n, d)).astype(np.float32)
        d0[:pairs] = base + 0.05 * rng.normal(size=(pairs, d))
        d1[:pairs] = base + 0.05 * rng.normal(size=(pairs, d))
        for arr in (d0, d1):
            arr /= np.linalg.norm(arr, axis=1, keepdims=True)
        return d0, d1

    def test_untrained_is_mutual_nn(self, rng):
        """Residual-identity init: matches planted pairs out of the box."""
        n = 128
        d0, d1 = self._planted(rng)
        kps = rng.uniform(0, 500, (n, 2)).astype(np.float32)
        valid = np.ones(n, bool)

        model = AttentionMatcher(depth=3)
        variables = model.init(
            jax.random.key(0),
            jnp.asarray(kps), jnp.asarray(d0), jnp.asarray(valid),
            jnp.asarray(kps), jnp.asarray(d1), jnp.asarray(valid),
        )
        sim, m0, m1 = model.apply(
            variables,
            normalize_kps(jnp.asarray(kps), (500, 500)),
            jnp.asarray(d0),
            jnp.asarray(valid),
            normalize_kps(jnp.asarray(kps), (500, 500)),
            jnp.asarray(d1),
            jnp.asarray(valid),
        )
        res = assignment_from_scores(
            sim, m0, m1, jnp.asarray(valid), jnp.asarray(valid)
        )
        ok = np.asarray(res.valid)
        idx = np.asarray(res.idx)
        # planted pairs dominate; unplanted random descriptors mostly fail
        assert ok[:40].mean() > 0.9
        assert (idx[:40] == np.arange(40))[ok[:40]].all()
        assert ok[40:].mean() < 0.2

    def test_masking(self, rng):
        n = 64
        d0, d1 = self._planted(rng, n=n, pairs=20)
        kps = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        valid0 = np.ones(n, bool)
        valid1 = np.ones(n, bool)
        valid1[:20] = False  # kill the train twins

        model = AttentionMatcher(depth=2)
        args = (
            jnp.asarray(kps), jnp.asarray(d0), jnp.asarray(valid0),
            jnp.asarray(kps), jnp.asarray(d1), jnp.asarray(valid1),
        )
        variables = model.init(jax.random.key(0), *args)
        sim, m0, m1 = model.apply(variables, *args)
        res = assignment_from_scores(
            sim, m0, m1, jnp.asarray(valid0), jnp.asarray(valid1)
        )
        matched_targets = np.asarray(res.idx)[np.asarray(res.valid)]
        assert not np.isin(matched_targets, np.arange(20)).any()


@pytest.mark.slow
class TestSuperPointPretraining:
    def test_loss_decreases_and_detects(self):
        """Short CPU pretraining run: loss drops and blobs get detected."""
        from visualodometry_tpu.models.train_superpoint import (
            pretrain,
            synthetic_batch,
        )
        from visualodometry_tpu.models.superpoint import superpoint_extract

        model, params, losses = pretrain(
            steps=60, batch=8, lr=2e-3, hw=(64, 64), log_every=59
        )
        assert losses[-1] < losses[0] * 0.5

    def test_bundled_weights_load(self):
        """The shipped synthetic-pretrained weights load and detect."""
        from visualodometry_tpu.frontend.superpoint import (
            _default_weights_path,
            make_superpoint_extractor,
        )
        from visualodometry_tpu.config import VOConfig
        from visualodometry_tpu.models.train_superpoint import synthetic_batch

        assert _default_weights_path().exists()
        cfg = VOConfig(extractor_type="superpoint", max_keypoints=128,
                       sift_n_features=128)
        extract = make_superpoint_extractor(cfg)
        rng = np.random.default_rng(2)
        b = synthetic_batch(rng, batch=1, hw=(96, 128))
        feats = extract(b.img0[0])
        v = np.asarray(feats.valid)
        assert v.sum() >= 5  # pretrained detector fires on blob images


class TestSuperPointDense:
    """r5 dense scoring head (models/superpoint.py::SuperPointDense)."""

    def _batch(self, rng, B=2, H=64, W=96):
        from visualodometry_tpu.models.train_superpoint_textured import (
            TrainBatchH,
        )
        from visualodometry_tpu.models.vo_distill import TrainBatchSub

        hc, wc = H // 8, W // 8
        labels0 = rng.integers(0, 65, (B, hc, wc)).astype(np.int32)
        return TrainBatchSub(
            h=TrainBatchH(
                img0=jnp.asarray(rng.random((B, H, W), np.float32)),
                img1=jnp.asarray(rng.random((B, H, W), np.float32)),
                labels0=jnp.asarray(labels0),
                labels1=jnp.asarray(
                    rng.integers(0, 65, (B, hc, wc)).astype(np.int32)
                ),
                cell_tgt=jnp.asarray(
                    rng.integers(0, hc, (B, hc, wc, 2)).astype(np.int32)
                ),
                cell_valid=jnp.asarray(rng.random((B, hc, wc)) > 0.5),
            ),
            sub0=jnp.asarray(
                rng.uniform(0, 8, (B, hc, wc, 2)).astype(np.float32)
            ),
            subv0=jnp.asarray(labels0 != 64),
        )

    def test_warm_start_and_arch_dispatch(self):
        import jax

        from visualodometry_tpu.models.superpoint import (
            SuperPointBackbone,
            is_dense_params,
        )
        from visualodometry_tpu.models.train_superpoint_dense import (
            warm_start_dense,
        )

        bk = SuperPointBackbone()
        bkp = bk.init(jax.random.key(0), jnp.zeros((1, 64, 96, 1)))
        model, params = warm_start_dense(
            jax.random.key(1), bkp, input_hw=(64, 96)
        )
        assert is_dense_params(params) and not is_dense_params(bkp)
        # shared layers copied exactly
        np.testing.assert_array_equal(
            params["params"]["conv1a"]["kernel"],
            bkp["params"]["conv1a"]["kernel"],
        )
        score, desc = model.apply(params, jnp.zeros((2, 64, 96, 1)))
        assert score.shape == (2, 64, 96)
        assert desc.shape == (2, 8, 12, 256)

    def test_dense_training_step_decreases_loss(self):
        import jax
        import optax

        from visualodometry_tpu.models.superpoint import SuperPointBackbone
        from visualodometry_tpu.models.train_superpoint_dense import (
            make_train_step_dense,
            warm_start_dense,
        )

        rng = np.random.default_rng(0)
        bk = SuperPointBackbone()
        bkp = bk.init(jax.random.key(0), jnp.zeros((1, 64, 96, 1)))
        model, params = warm_start_dense(
            jax.random.key(1), bkp, input_hw=(64, 96)
        )
        batch = self._batch(rng)
        tx = optax.adam(1e-3)
        opt = tx.init(params)
        step = jax.jit(make_train_step_dense(model, tx))
        losses = []
        for _ in range(8):
            params, opt, loss, _ = step(params, opt, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_localization_operator_matches_inference(self):
        """The trained refinement = the deployed refinement: with a
        peaked score map, the training-loss centroid and
        select_keypoints' subpixel output coincide."""
        import jax

        from visualodometry_tpu.models.superpoint import select_keypoints

        H, W = 32, 32
        gx, gy = 17.3, 14.8
        ys, xs = np.mgrid[0:H, 0:W]
        heat = np.exp(
            -((xs - gx) ** 2 + (ys - gy) ** 2) / (2 * 0.8**2)
        ).astype(np.float32)
        coarse = np.ones((H // 8, W // 8, 16), np.float32)
        f = select_keypoints(
            jnp.asarray(heat), jnp.asarray(coarse), 4, threshold=0.1
        )
        v = np.asarray(f.valid)
        kp = np.asarray(f.kps)[v][0]
        assert abs(kp[0] - gx) < 0.15 and abs(kp[1] - gy) < 0.15


class TestMatcherTraining:
    def test_training_improves_hard_matching(self):
        """Short training run beats identity-init on ambiguous descriptors."""
        from visualodometry_tpu.models.train_matcher import (
            evaluate,
            synthetic_match_batch,
            train_matcher,
        )

        rng = np.random.default_rng(99)
        test_batch = synthetic_match_batch(
            rng, batch=2, n=64, d=64, desc_noise=0.4
        )
        model = AttentionMatcher(depth=2)
        b0 = synthetic_match_batch(np.random.default_rng(1), batch=1, n=64, d=64)
        params0 = model.init(
            jax.random.key(0),
            b0.kps0[0], b0.desc0[0], b0.valid0[0],
            b0.kps1[0], b0.desc1[0], b0.valid1[0],
        )
        p0, _ = evaluate(params0, model, test_batch)
        model_t, params_t, losses = train_matcher(
            steps=60, batch=4, n=64, d=64, depth=2, lr=3e-4, log_every=59
        )
        assert losses[-1] < losses[0]
        p1, _ = evaluate(params_t, model_t, test_batch)
        assert p1 > p0 + 0.05, f"precision {p0:.3f} -> {p1:.3f}"

    @pytest.mark.slow
    def test_bundled_matcher_weights(self):
        """The shipped trained matcher weights load into the step."""
        from pathlib import Path

        bundled = (
            Path("visualodometry_tpu/models/weights")
            / "attention_matcher_synthetic.pkl"
        )
        assert bundled.exists()
        from visualodometry_tpu.config import VOConfig
        from visualodometry_tpu.core.step import make_step_fn
        from visualodometry_tpu.core.state import init_state
        from visualodometry_tpu.data.synthetic import (
            make_scene,
            render_features,
        )

        cfg = VOConfig(
            extractor_type="synthetic",
            max_keypoints=128,
            sift_n_features=128,
            matcher_type="attention",
            attention_depth=4,
            min_median_flow=3.0,
            essential_hypotheses=64,
            pnp_hypotheses=64,
            map_capacity=512,
        )
        rng = np.random.default_rng(0)
        scene = make_scene(rng, num_frames=3, num_landmarks=600)
        step = jax.jit(make_step_fn(cfg, scene.K))
        state = init_state(cfg, desc_dim=128)
        for f in range(3):
            feats = render_features(scene, f, 128, rng)
            state, out = step(state, feats)
        assert np.isfinite(np.asarray(out.T_wc)).all()


@pytest.mark.slow
class TestAdaptiveMatcher:
    """r4 adaptive inference path (LightGlue width pruning + early exit)."""

    def _v2(self):
        import pickle
        from pathlib import Path

        from visualodometry_tpu.models.attention_matcher import (
            AttentionMatcher,
        )

        p = (
            Path("visualodometry_tpu/models/weights")
            / "attention_matcher_sift_v2.pkl"
        )
        if not p.exists():
            pytest.skip("v2 checkpoint not bundled")
        with open(p, "rb") as f:
            params = jax.tree.map(jnp.asarray, pickle.load(f))
        return AttentionMatcher(depth=4, per_layer_heads=True), params

    def _problem(self):
        # in-distribution data: a real SIFT homography pair from the
        # matcher training recipe (models/matcher_data.py)
        from visualodometry_tpu.models.matcher_data import (
            build_sift_match_dataset,
        )

        rng = np.random.default_rng(21)
        data = build_sift_match_dataset(rng, n_pairs=2, log_every=1000)
        b = 0
        return (
            jnp.asarray(data["kps0"][b]),
            jnp.asarray(data["desc0"][b]),
            jnp.asarray(data["valid0"][b]),
            jnp.asarray(data["kps1"][b]),
            jnp.asarray(data["desc1"][b]),
            jnp.asarray(data["valid1"][b]),
            np.asarray(data["gt_idx"][b]),
        )

    def test_pruned_matches_subset_and_correct(self):
        from visualodometry_tpu.models.attention_matcher import (
            adaptive_match,
        )

        model, params = self._v2()
        kps0, d0, v0, kps1, d1, v1, gt = self._problem()
        res_full = adaptive_match(
            model, params, kps0, d0, v0, kps1, d1, v1, prune_to=0
        )
        res_pruned = adaptive_match(
            model, params, kps0, d0, v0, kps1, d1, v1,
            prune_to=d0.shape[0] // 2, exit_conf=0.95,
        )
        for res in (res_full, res_pruned):
            ok = np.asarray(res.valid)
            idx = np.asarray(res.idx)
            assert ok.sum() >= 30, ok.sum()
            correct = (gt[ok.nonzero()[0]] == idx[ok]).mean()
            assert correct > 0.85, correct
        # pruned-path indices stay in range after the scatter-back
        assert np.asarray(res_pruned.idx).min() >= 0
        assert np.asarray(res_pruned.idx).max() < d0.shape[0]
