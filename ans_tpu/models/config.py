"""Engine configuration: lane-count policy and format selection."""

from __future__ import annotations

from ..constants import A_MAX_FRAME_LOG2


def next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def validate_lanes(lanes: int | None) -> int | None:
    """Lane counts must be powers of two: the fmt-2 section header
    stores log2(S) (framing.pack), and the placement kernel's
    row->(step,row) arithmetic assumes it."""
    if lanes is not None and (lanes < 1 or lanes & (lanes - 1)):
        raise ValueError(f"lanes must be a power of two, got {lanes}")
    return lanes


def default_lane_count(n: int, min_lanes: int = 32,
                       max_lanes: int = 2048) -> int:
    """Lanes S for an n-element block.

    Each lane costs 4 bytes of flushed state, so S ~ n/12800 keeps the
    overhead small while exposing thousands of parallel states.  The cap
    is 2048: the Pallas decode sweep showed S in {1024, 2048} fastest on
    TPU v5e (larger S grows VMEM pressure and per-step vector width
    without throughput gain).  Power of two, clamped.
    """
    if n <= 0:
        return min_lanes
    return min(max_lanes, max(min_lanes, next_pow2(-(-n // 12800))))


MAX_FRAME = 1 << A_MAX_FRAME_LOG2
