"""Constants and helpers shared by the attention kernels.

Single source of truth so the log2-domain softmax convention (LOG2E
pre-multiplication of logits) and the masking constant cannot drift between
the flash kernel, the temporal kernel, and the XLA attention path.
"""

LOG2E = 1.4426950408889634

# large-but-finite additive mask; avoids NaNs if a row were fully masked
NEG_INF = -1e9


def ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m
