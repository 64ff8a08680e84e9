"""Trajectory evaluation (ATE / RPE).

The reference loads ground-truth poses but never evaluates against them
(reference: src/modules/dataset_loader.py:57-60 loads GT; SURVEY.md §5.5
notes no ATE/RPE code exists). This module adds the evaluator needed for
the BASELINE.md acceptance criterion.
"""

from visualodometry_tpu.eval.ate import ate_rmse, umeyama_alignment  # noqa: F401
