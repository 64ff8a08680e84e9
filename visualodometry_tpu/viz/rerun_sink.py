"""Rerun visualization sink, mirroring the reference's channel layout.

The reference logs inline from the VO class (reference:
src/modules/vo.py:32-33,301-368); here visualization is an optional sink
object behind an interface, so the compute path carries zero viz coupling
and the pipeline runs headless (the rerun-sdk is not installed in every
environment — the sink degrades to a no-op with a warning).

Channels reproduced (reference line refs):
  frame timeline                     vo.py:311
  world/camera/image                 vo.py:312
  metrics/speed, metrics/baseline    vo.py:315-318
  world/camera Transform3D           vo.py:321-324
  world/traj LineStrips3D (yellow)   vo.py:330
  landmarks (green) / candidates (red) Points2D   vo.py:335-343
  world/map Points3D (green=tracked, gray=idle)   vo.py:345-358
  flow Arrows2D every 10th match     vo.py:360-368
"""

from __future__ import annotations

import numpy as np


class RerunSink:
    def __init__(self, app_name: str = "TPU VO") -> None:
        try:
            import rerun as rr  # type: ignore

            self.rr = rr
            rr.init(app_name, spawn=True)
            rr.log("world", rr.ViewCoordinates.RIGHT_HAND_Y_DOWN, static=True)
            self.enabled = True
        except Exception as e:  # pragma: no cover - depends on env
            import warnings

            warnings.warn(f"rerun unavailable ({e}); visualization disabled")
            self.enabled = False

    def log_frame(self, engine, out, img, feats) -> None:
        if not self.enabled:
            return
        rr = self.rr
        rr.set_time("frame", sequence=engine.frame_id)
        if img is not None:
            rr.log("world/camera/image", rr.Image(np.asarray(img)))
        rr.log("metrics/speed", rr.Scalars(float(out.speed)))
        rr.log("metrics/baseline", rr.Scalars(float(out.baseline_speed)))
        T = np.asarray(out.T_wc)
        rr.log(
            "world/camera",
            rr.Transform3D(translation=T[:3, 3], mat3x3=T[:3, :3]),
        )
        if engine.trajectory:
            rr.log(
                "world/traj",
                rr.LineStrips3D(
                    [np.stack(engine.trajectory)], colors=[[255, 255, 0]]
                ),
            )
        kps = np.asarray(feats.kps)
        fvalid = np.asarray(feats.valid)
        ids = np.asarray(out.curr_ids)
        tracked = fvalid & (ids != -1)
        cand = fvalid & (ids == -1)
        if tracked.any():
            rr.log(
                "world/camera/image/landmarks",
                rr.Points2D(kps[tracked], colors=[0, 255, 0], radii=2),
            )
        if cand.any():
            rr.log(
                "world/camera/image/candidates",
                rr.Points2D(kps[cand], colors=[255, 0, 0], radii=2),
            )
        # 3D map: tracked landmarks green, rest gray
        map_ids = np.asarray(engine.state.map.ids)
        map_pts = np.asarray(engine.state.map.points)
        live = map_ids >= 0
        if live.any():
            active = np.isin(map_ids[live], ids[ids != -1])
            colors = np.where(
                active[:, None], [[0, 255, 0]], [[200, 200, 200]]
            ).astype(np.uint8)
            rr.log(
                "world/map",
                rr.Points3D(map_pts[live], colors=colors, radii=0.05),
            )
        # optical flow arrows, every 10th match
        midx = np.asarray(out.match_idx)
        mval = np.asarray(out.match_valid)
        if mval.any():
            origins = np.asarray(engine.state.keyframe.kps)[mval]
            vectors = kps[midx[mval]] - origins
            rr.log(
                "world/camera/image/flow",
                rr.Arrows2D(
                    origins=origins[::10],
                    vectors=vectors[::10],
                    colors=[0, 255, 255],
                ),
            )
