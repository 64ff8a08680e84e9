"""Low-level TPU ops: convolution pyramids, extrema, Pallas kernels.

These are the from-scratch replacements for the native primitives the
reference delegates to OpenCV/torch (SURVEY.md §2.3): Gaussian/DoG
pyramids and keypoint machinery for the SIFT-style detector (N1), and the
fused descriptor-matching kernel (N4).
"""
