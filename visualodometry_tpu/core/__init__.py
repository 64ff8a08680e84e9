"""VO core: the fixed-shape functional state machine.

The reference's mutable per-frame Python state machine
(`VisualOdometry.process_frame`, reference: src/modules/vo.py:49-250)
becomes a pure `step(state, features) -> (state, output)` compiled into a
single XLA program, with `lax.cond` for the bootstrap / initialization /
tracking branches and a ring-buffer landmark store whose eviction semantics
match the reference's age-based pruning.
"""

from visualodometry_tpu.core.state import (  # noqa: F401
    Keyframe,
    MapState,
    StepOutput,
    VOState,
    init_state,
    landmark_lookup,
)
from visualodometry_tpu.core.step import make_step_fn  # noqa: F401
