"""Lane-format ("ATF" fmt A) rANS engine: vectorized over S independent
states, jittable end-to-end (CPU/TPU via XLA; Pallas TPU kernels layer on
top of the same layout in pallas_kernels.py).

Massively-parallel generalization of the reference's 4-state interleave
(reference: ans_int.hpp:212-241 encode, :257-276 decode; ans_fold.hpp
:249-278, :283-310): S lanes, u32 state, 8-bit renormalization, each lane
owning its own byte substream so per-lane reads never serialize.  See
docs/FORMAT.md section 2 for the wire format.

Layout: symbol at position p = t*S + lane is handled by `lane` at step t.
Arrays are staged (T, S) so `lax.scan` consumes the step axis.

Encode is reverse-order with on-device count-then-place compaction:
the scan records each step's <=6 emitted bytes (<=3 exception + <=3
renorm) into fixed slots, then a cumulative-sum pass computes every
byte's final position (lane streams are written in decode order, i.e.
reverse emission order) and a single scatter materializes the packed
payload with all lane substreams concatenated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .tables import A_L

U32 = jnp.uint32
U8 = jnp.uint8


def lane_steps(n: int, S: int) -> int:
    """Steps per lane T = ceil(n / S)."""
    return -(-n // S) if n else 0


def stage(arr: np.ndarray, S: int, T: int, fill=0) -> np.ndarray:
    """Pad a length-n array to S*T and reshape to (T, S): element (t, l)
    is position t*S + l."""
    n = arr.shape[0]
    out = np.full((T * S,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[:n] = arr
    return out.reshape((T, S) + arr.shape[1:])


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------

def encode_lanes_impl(mapped, nb, excb, n, freq, base, ub, *, S, T, log2m):
    """Encode staged symbols into packed lane substreams.

    mapped: (T, S) u32 mapped symbol ids (pad = 0)
    nb:     (T, S) u32 exception-byte counts (pad = 0)
    excb:   (T, S, 3) u8 stripped low bytes, lowest first (pad = 0)
    n:      scalar i32 actual element count (dynamic)
    freq/base/ub: (sigma,) u32 encoder table (tables.build_enc_table)

    Returns (payload u8 (S*T*6,), lane_len i32 (S,), final_states u32 (S,)).
    Lane substreams are packed back-to-back at exclusive-cumsum(lane_len)
    offsets, already in decode order.
    """
    lanes = jnp.arange(S, dtype=jnp.int32)

    def step(state, xs):
        t, sym, nb_t, excb_t = xs
        valid = (t * S + lanes) < n
        s = sym.astype(jnp.int32)
        f = jnp.maximum(freq[s], jnp.uint32(1))
        b = base[s]
        u = ub[s]
        nb_v = jnp.where(valid, nb_t, 0).astype(jnp.int32)
        # renormalize: emit low bytes while state >= ub (needs are a prefix)
        rmask = []
        st = state
        for _ in range(3):
            need = valid & (st >= u)
            rmask.append(need)
            st = jnp.where(need, st >> jnp.uint32(8), st)
        rbytes = []
        stx = state
        for i in range(3):
            rbytes.append((stx & jnp.uint32(0xFF)).astype(U8))
            stx = stx >> jnp.uint32(8)
        # state update: ((state / f) << log2m) + state % f + base
        q = st // f
        r = st - q * f
        new_state = (q << jnp.uint32(log2m)) + r + b
        st = jnp.where(valid, new_state, state)
        rc = sum(m.astype(jnp.int32) for m in rmask)
        counts = jnp.where(valid, nb_v + rc, 0)
        out = (counts.astype(jnp.int32), nb_v,
               jnp.stack(rbytes, axis=-1),          # (S, 3)
               jnp.stack(rmask, axis=-1),           # (S, 3) bool
               excb_t)                              # (S, 3)
        return st, out

    ts = jnp.arange(T, dtype=jnp.int32)
    init = jnp.full((S,), A_L, dtype=U32)
    # encode walks positions backwards: scan steps T-1 .. 0
    states, (counts, nb_all, rbytes, rmask, excb_all) = jax.lax.scan(
        step, init, (ts, mapped, nb, excb), reverse=True)

    # ---- count-then-place compaction ------------------------------------
    # Decode reads lane streams forward, step 0 first; within a step it
    # reads the step's bytes in reverse emission order.  So emission byte i
    # of step t in lane l lands at
    #   global_start[l] + cum[t, l] - 1 - i
    # with cum the forward inclusive cumsum of per-step byte counts.
    cum = jnp.cumsum(counts, axis=0)                        # (T, S)
    lane_len = cum[-1] if T else jnp.zeros((S,), jnp.int32)
    gstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(lane_len)[:-1]])
    pos1 = gstart[None, :] + cum - 1                        # position of i=0
    total = S * T * 6
    payload = jnp.zeros((total,), dtype=U8)
    # exception byte slots j (emission index j, active when j < nb)
    for j in range(3):
        m = j < nb_all
        idx = jnp.where(m, pos1 - j, total)
        payload = payload.at[idx.reshape(-1)].set(
            excb_all[..., j].reshape(-1), mode="drop")
    # renorm byte slots i (emission index nb + i)
    for i in range(3):
        m = rmask[..., i]
        idx = jnp.where(m, pos1 - (nb_all + i), total)
        payload = payload.at[idx.reshape(-1)].set(
            rbytes[..., i].reshape(-1), mode="drop")
    return payload, lane_len, states


encode_lanes = jax.jit(encode_lanes_impl,
                       static_argnames=("S", "T", "log2m"))


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

def decode_lanes_impl(stream, lane_start, init_states, dfreq, doffset, dsym,
                      dhigh, dnb, n, *, S, T, log2m, has_exc):
    """Decode T steps of S lanes from packed substreams.

    stream:     (B,) u8 all lane payloads concatenated (+ >=8 pad bytes)
    lane_start: (S,) i32 start offset of each lane's substream
    init_states:(S,) u32 final encoder states
    dfreq/doffset/dsym[/dhigh/dnb]: (M,) u32 decode table (build_dec_table)
    n: scalar i32 element count

    Returns (T, S) u32 values; flatten()[: n] is the output sequence.
    """
    mask = jnp.uint32((1 << log2m) - 1)
    lanes = jnp.arange(S, dtype=jnp.int32)
    L = jnp.uint32(A_L)

    def step(carry, t):
        state, cur = carry
        valid = (t * S + lanes) < n
        slot = (state & mask).astype(jnp.int32)
        f = dfreq[slot]
        off = doffset[slot]
        st = f * (state >> jnp.uint32(log2m)) + off
        # refill: read high-first while below L (<= 3 bytes)
        for _ in range(3):
            need = valid & (st < L)
            byte = stream[cur].astype(U32)
            st = jnp.where(need, (st << jnp.uint32(8)) | byte, st)
            cur = cur + need.astype(jnp.int32)
        st = jnp.where(valid, st, state)
        if has_exc:
            nb = jnp.where(valid, dnb[slot], 0).astype(jnp.int32)
            low = jnp.zeros((S,), U32)
            for i in range(3):
                take = i < nb
                byte = stream[cur].astype(U32)
                low = jnp.where(take, (low << jnp.uint32(8)) | byte, low)
                cur = cur + take.astype(jnp.int32)
            val = dhigh[slot] + low
        else:
            val = dsym[slot]
        return (st, cur), val

    ts = jnp.arange(T, dtype=jnp.int32)
    (_, _), out = jax.lax.scan(step, (init_states, lane_start), ts)
    return out


decode_lanes = jax.jit(decode_lanes_impl,
                       static_argnames=("S", "T", "log2m", "has_exc"))
