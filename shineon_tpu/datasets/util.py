"""Dataset helpers (reference: datasets/util.py:6-22).

The cloth-segmentation math itself is an on-device op —
:func:`shineon_tpu.ops.image_ops.segment_cloths_from_image`; re-exported here
for API parity."""

from shineon_tpu.ops.image_ops import segment_cloths_from_image  # noqa: F401
