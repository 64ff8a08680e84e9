"""Host-side VO engine: frontend + jitted step + optional windowed BA + viz.

The TPU redesign of the reference's `VisualOdometry` object + `main` loop
(reference: src/modules/vo.py:9-49, src/main.py:33-66). Device work —
feature extraction, matching, the VO step, and the BA solve — are each a
single jitted program; this class owns the thin host state around them:
the trajectory log (with the reference's reset-clears-trajectory
semantics, vo.py:295), the sliding keyframe window for BA (a capability
the reference lacks), and the optional visualization sink.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from visualodometry_tpu.ba.solver import ba_solve
from visualodometry_tpu.ba.window import assemble_window, write_back
from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.core.state import VOState, init_state
from visualodometry_tpu.core.step import make_step_fn
from visualodometry_tpu.frontend.interface import Features


@dataclass
class _KeyframeRecord:
    kps: np.ndarray
    ids: np.ndarray
    valid: np.ndarray
    T_wc: np.ndarray
    kf_index: int = -1  # position in the engine's keyframe log


@dataclass
class VOEngine:
    """Single-sequence engine. For multi-sequence DP see parallel/multiseq."""

    K: np.ndarray
    cfg: VOConfig
    enable_ba: bool = False
    viz: Any = None  # optional sink with .log_frame(engine, out, img)
    desc_dim: int = 128

    state: VOState = field(init=False)
    trajectory: list = field(init=False, default_factory=list)
    frame_id: int = field(init=False, default=0)
    _kf_window: deque = field(init=False)
    # full-sequence keyframe chain + BA-refined relative edges, consumed
    # by positions(smoothed=True) (north-star config[3]: loop-free pose-
    # graph smoothing over the sequence)
    _kf_log: list = field(init=False, default_factory=list)  # 4x4 poses
    _traj_kf: list = field(init=False, default_factory=list)  # frame->kf idx
    _ba_edges: dict = field(init=False, default_factory=dict)  # (i,j)->Z

    def __post_init__(self):
        self.K = np.asarray(self.K, np.float32)
        self._step = jax.jit(make_step_fn(self.cfg, self.K))
        if self.cfg.extractor_type == "sift":
            from visualodometry_tpu.frontend.sift import extract_sift

            self._extract = lambda img: extract_sift(jnp.asarray(img), self.cfg)
        elif self.cfg.extractor_type == "superpoint":
            from visualodometry_tpu.frontend.superpoint import (
                make_superpoint_extractor,
            )

            self._extract = make_superpoint_extractor(self.cfg)
            self.desc_dim = 256
        else:  # "synthetic" / precomputed features
            self._extract = None
        self.state = init_state(self.cfg, desc_dim=self.desc_dim)
        self._kf_window = deque(maxlen=self.cfg.ba_window)
        self._ba_jit = jax.jit(
            lambda prob: ba_solve(
                prob, iters=self.cfg.ba_iters, damping=self.cfg.ba_damping
            )
        )

    # ---- per-frame API (image in, pose out) ----
    def process_frame(self, img: np.ndarray | None, feats: Features | None = None):
        """Advance one frame from an image (uint8/float (H, W)) or Features."""
        if feats is None:
            assert self._extract is not None, "no extractor for raw images"
            arr = np.asarray(img)
            if arr.dtype == np.uint8:
                arr = arr.astype(np.float32) / 255.0
            feats = self._extract(arr)
        self.state, out = self._step(self.state, feats)
        out_host = jax.tree.map(np.asarray, out)

        if bool(out_host.did_reset):
            # reference resets the trajectory on failure (vo.py:295)
            self.trajectory = []
            self._kf_window.clear()
            self._kf_log = []
            self._traj_kf = []
            self._ba_edges = {}
        self.trajectory.append(out_host.T_wc[:3, 3].copy())

        if bool(out_host.is_keyframe):
            self._kf_log.append(out_host.T_wc.copy())
            self._kf_window.append(
                _KeyframeRecord(
                    kps=np.asarray(feats.kps),
                    ids=out_host.curr_ids.copy(),
                    valid=np.asarray(feats.valid),
                    T_wc=out_host.T_wc.copy(),
                    kf_index=len(self._kf_log) - 1,
                )
            )
            if self.enable_ba and len(self._kf_window) == self.cfg.ba_window:
                self._run_window_ba()
        self._traj_kf.append(len(self._kf_log) - 1)

        if self.viz is not None:
            self.viz.log_frame(self, out_host, img, feats)
        self.frame_id += 1
        return out_host

    # ---- sliding-window BA (beyond the reference) ----
    def _run_window_ba(self):
        recs = list(self._kf_window)
        kf_T_wc = jnp.asarray(np.stack([r.T_wc for r in recs]))
        kf_kps = jnp.asarray(np.stack([r.kps for r in recs]))
        kf_ids = jnp.asarray(np.stack([r.ids for r in recs]))
        kf_valid = jnp.asarray(np.stack([r.valid for r in recs]))
        prob, chosen = assemble_window(
            kf_T_wc,
            kf_kps,
            kf_ids,
            kf_valid,
            self.state.map,
            jnp.asarray(self.K),
            num_landmarks=self.cfg.ba_max_landmarks,
        )
        solved = self._ba_jit(prob)
        new_map = write_back(self.state.map, chosen, solved.X)

        from visualodometry_tpu.geometry.se3 import se3_inverse

        T_wc_new = np.asarray(se3_inverse(solved.T_cw))  # (P, 4, 4)
        # refresh window records + live state with refined values
        for r, T in zip(recs, T_wc_new):
            r.T_wc = T.copy()
            if 0 <= r.kf_index < len(self._kf_log):
                self._kf_log[r.kf_index] = T.copy()
        # record BA-refined relative poses between consecutive window
        # keyframes as pose-graph edges (latest refinement wins)
        for ra, rb, Ta, Tb in zip(recs, recs[1:], T_wc_new, T_wc_new[1:]):
            if ra.kf_index >= 0 and rb.kf_index >= 0:
                Z = np.linalg.solve(Ta, Tb)  # T_a^{-1} T_b
                self._ba_edges[(ra.kf_index, rb.kf_index)] = Z
        kf = self.state.keyframe._replace(T_wc=jnp.asarray(T_wc_new[-1]))
        self.state = self.state._replace(
            map=new_map,
            keyframe=kf,
            T_wc=jnp.asarray(T_wc_new[-1]),
            last_pos=jnp.asarray(T_wc_new[-1][:3, 3]),
        )
        if self.trajectory:
            self.trajectory[-1] = T_wc_new[-1][:3, 3].copy()

    # ---- evaluation ----
    def positions(self, smoothed: bool = False) -> np.ndarray:
        """Per-frame positions; `smoothed=True` applies loop-free pose-
        graph smoothing over the keyframe chain (ba/pose_graph.py) fusing
        the VO chain with the BA-refined window edges, then carries each
        keyframe's correction to the frames tracked from it."""
        if not self.trajectory:
            return np.zeros((0, 3), np.float32)
        est = np.stack(self.trajectory)
        if not smoothed or len(self._kf_log) < 3:
            return est

        from visualodometry_tpu.ba.pose_graph import (
            PoseGraph,
            smooth_pose_graph,
        )

        T_kf = np.stack(self._kf_log)  # (P, 4, 4)
        P = len(T_kf)
        # chain edges from the (possibly BA-refreshed) VO estimates
        ei = list(range(P - 1))
        ej = list(range(1, P))
        Z = [np.linalg.solve(T_kf[i], T_kf[j]) for i, j in zip(ei, ej)]
        w = [1.0] * len(ei)
        # BA-refined window edges get higher confidence; skip duplicates
        # of chain edges already refreshed to the same measurement
        for (i, j), Zij in self._ba_edges.items():
            ei.append(i)
            ej.append(j)
            Z.append(Zij)
            w.append(4.0)
        g = PoseGraph(
            T_wc=jnp.asarray(T_kf, jnp.float32),
            edges_i=jnp.asarray(ei, jnp.int32),
            edges_j=jnp.asarray(ej, jnp.int32),
            Z=jnp.asarray(np.stack(Z), jnp.float32),
            weight=jnp.asarray(w, jnp.float32),
        )
        T_sm = np.asarray(smooth_pose_graph(g, iters=10))
        # carry each keyframe's correction to frames tracked from it
        out = est.copy()
        for f, k in enumerate(self._traj_kf[: len(est)]):
            if k < 0:
                continue
            delta = T_sm[k] @ np.linalg.inv(T_kf[k])
            out[f] = (delta[:3, :3] @ est[f]) + delta[:3, 3]
        return out
