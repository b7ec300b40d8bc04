"""Engine configuration: lane-count policy and format selection."""

from __future__ import annotations

from ..constants import A_MAX_FRAME_LOG2


def next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def default_lane_count(n: int, min_lanes: int = 32,
                       max_lanes: int = 8192) -> int:
    """Lanes S for an n-element block.

    Each lane costs 8 bytes of directory + flush (u32 length + u32 state),
    so S ~ n/12800 keeps the overhead near 0.005 bits/int while still
    exposing thousands of parallel states at benchmark sizes (n >= 10M).
    Power of two, clamped to [min_lanes, max_lanes].
    """
    if n <= 0:
        return min_lanes
    return min(max_lanes, max(min_lanes, next_pow2(-(-n // 12800))))


MAX_FRAME = 1 << A_MAX_FRAME_LOG2
