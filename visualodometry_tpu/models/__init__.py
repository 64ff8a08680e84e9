"""Learned models: SuperPoint extractor and attention matcher (Flax).

TPU replacements for the torch/CUDA models the reference imports from the
pinned lightglue package (reference: src/modules/frontend.py:4,17-23;
SURVEY.md §2.3 N2/N3). Inference is jitted with fixed-shape outputs;
pretrained weights convert from torch checkpoints via
`models.convert.load_torch_superpoint` when a checkpoint file is
available (the build environment has no network access — random-init
weights exercise the architecture and performance paths, and the
converter is tested against shape contracts).
"""
