"""Lane-format blob framing (docs/FORMAT.md section 2).

After the method header + prelude (identical to the compat format) comes:

    u8  fmt          (1 = fmt A: u32 state, 8-bit renorm)
    u8  log2(S)
    u16 reserved (0)
    u32 payload_len[S]   little-endian
    u32 init_state[S]    little-endian (final encoder states)
    lane payloads, concatenated in lane order (decode reads forward)
"""

from __future__ import annotations

import numpy as np

FMT_A = 1
_HDR = 4


def pack(lane_len: np.ndarray, states: np.ndarray,
         payload: np.ndarray) -> bytes:
    S = len(lane_len)
    log2s = S.bit_length() - 1
    assert 1 << log2s == S
    out = bytearray()
    out += bytes((FMT_A, log2s, 0, 0))
    out += np.asarray(lane_len, dtype="<u4").tobytes()
    out += np.asarray(states, dtype="<u4").tobytes()
    out += np.asarray(payload, dtype=np.uint8).tobytes()
    return bytes(out)


def parse(buf: bytes, off: int):
    """Returns (S, lane_len i64 (S,), states u32 (S,), payload u8 view)."""
    fmt, log2s = buf[off], buf[off + 1]
    if fmt != FMT_A:
        raise ValueError(f"unknown lane format {fmt}")
    S = 1 << log2s
    p = off + _HDR
    lane_len = np.frombuffer(buf, dtype="<u4", count=S, offset=p).astype(
        np.int64)
    p += 4 * S
    states = np.frombuffer(buf, dtype="<u4", count=S, offset=p).copy()
    p += 4 * S
    total = int(lane_len.sum())
    payload = np.frombuffer(buf, dtype=np.uint8, count=total, offset=p)
    return S, lane_len, states, payload


def overhead_bytes(S: int) -> int:
    return _HDR + 8 * S
