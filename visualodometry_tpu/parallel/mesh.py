"""Device-mesh construction helpers.

Axes convention:
  "seq" — data parallel over concurrent sequences (DP);
  "map" — landmark-block sharding inside the BA solve (the model-parallel
          analog for a VO workload; SURVEY.md §2.4).

On a real slice the mesh should be laid out so "map" rides ICI (the psum
of the reduced pose system is the bandwidth-relevant collective); "seq"
involves no cross-talk except at eval time and can span DCN.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    num_seq: int | None = None,
    num_map: int | None = None,
    devices=None,
) -> Mesh:
    """Build a ("seq", "map") mesh over the available devices.

    With no arguments, factors the device count as evenly as possible.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if num_seq is None and num_map is None:
        # favor map-sharding (the compute-heavy axis)
        num_seq = 1
        for s in range(int(np.sqrt(n)), 0, -1):
            if n % s == 0:
                num_seq = s
                break
        num_map = n // num_seq
    elif num_seq is None:
        assert n % num_map == 0, (n, num_map)
        num_seq = n // num_map
    elif num_map is None:
        assert n % num_seq == 0, (n, num_seq)
        num_map = n // num_seq
    assert num_seq * num_map == n, (num_seq, num_map, n)
    dev_array = np.asarray(devices).reshape(num_seq, num_map)
    return Mesh(dev_array, axis_names=("seq", "map"))
