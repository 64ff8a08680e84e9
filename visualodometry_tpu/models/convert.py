"""Torch-checkpoint -> Flax parameter conversion for SuperPoint.

The reference pins SuperPoint weights through the lightglue package
(reference: pyproject.toml:132, uv.lock:387-389). This converter maps the
standard `superpoint_v1.pth` / lightglue `superpoint.pth` state_dict
layout (conv1a..convDb, OIHW kernels) onto the Flax module tree
(models/superpoint.py, HWIO kernels). The build environment has no
network access, so conversion runs only when a checkpoint file is present
— pass it via `VOEngine`'s config or the CLI once downloaded.
"""

from __future__ import annotations

import numpy as np

# torch name -> (flax scope, is_a/b slot)
_NAME_MAP = {
    "conv1a": "conv1a",
    "conv1b": "conv1b",
    "conv2a": "conv2a",
    "conv2b": "conv2b",
    "conv3a": "conv3a",
    "conv3b": "conv3b",
    "conv4a": "conv4a",
    "conv4b": "conv4b",
    "convPa": "convPa",
    "convPb": "convPb",
    "convDa": "convDa",
    "convDb": "convDb",
}


def load_torch_superpoint(checkpoint_path: str, params_template):
    """Fill a Flax params pytree from a torch SuperPoint state_dict.

    params_template: output of `init_superpoint` (structure source).
    Returns a new params pytree. Accepts raw `.pth` state_dicts saved by
    either the magicleap or lightglue releases (keys may be prefixed).
    """
    import torch

    state = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    # strip common prefixes
    cleaned = {}
    for k, v in state.items():
        k2 = k
        for prefix in ("module.", "superpoint.", "net."):
            if k2.startswith(prefix):
                k2 = k2[len(prefix):]
        cleaned[k2] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    new_params = {"params": {}}
    flax_params = params_template["params"]
    for torch_name, flax_name in _NAME_MAP.items():
        w_key = f"{torch_name}.weight"
        b_key = f"{torch_name}.bias"
        if w_key not in cleaned:
            raise KeyError(
                f"checkpoint missing {w_key}; found keys like "
                f"{list(cleaned)[:5]}"
            )
        w = cleaned[w_key]  # (O, I, kh, kw)
        kernel = np.transpose(w, (2, 3, 1, 0))  # -> (kh, kw, I, O)
        expect = flax_params[flax_name]["kernel"].shape
        assert kernel.shape == tuple(expect), (flax_name, kernel.shape, expect)
        new_params["params"][flax_name] = {
            "kernel": kernel.astype(np.float32),
            "bias": cleaned[b_key].astype(np.float32),
        }
    return new_params
