"""Multi-device scaling: meshes, sharded maps, distributed Schur BA.

The reference is strictly single-process / single-GPU (SURVEY.md §2.4: no
DP/TP/PP, no torch.distributed — parallelism exists only inside OpenCV/
torch thread pools). This package *introduces* parallelism as first-class
components, per the north-star:

- data parallel: concurrent sequences, one VO state per mesh slice
  ("seq" axis), via shard_map over batched states;
- sharded map / model-parallel analog: BA landmark blocks sharded over the
  "map" axis; the reduced pose system is a Σ over landmarks, reduced with
  one psum; the tiny dense solve is replicated;
- communication: XLA collectives over ICI/DCN — no NCCL/MPI.
"""

from visualodometry_tpu.parallel.mesh import make_mesh  # noqa: F401
from visualodometry_tpu.parallel.distributed_ba import (  # noqa: F401
    ba_solve_distributed,
)
