"""Decode-engine crossover profile (round-3 verdict item 8).

Measures, per live-alphabet size sigma, the chip decode throughput of
every engine that can represent the table:

  * the FORMAT path (what the wire actually selects): value-cumulative
    layout + pivot-search kernel for sigma <= 2^13, frequency-grouped
    layout + grouped kernel (anchored planes) above;
  * the COUNTERFACTUAL search kernel above 2^13, on a value-cumulative
    wire produced by the XLA encoder with layout=None — this is NOT a
    reachable production wire (the slot layout is a format derivation),
    it exists to check whether the GROUPED_MIN_SIGMA = 2^13 + 1 format
    boundary sits in the right place on real silicon.

Data is mixed-frequency (alternating c/2c counts) so the tail-escape
recoding DECLINES and the engines see the raw alphabet
(ops/escape.py would otherwise fold everything past 2^13).

    python tools/bench_crossover.py [-n 24] [--runs 6]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def mixed_data(sigma: int, n: int) -> np.ndarray:
    reps = np.empty(sigma, np.int64)
    base = max(1, n // (sigma + sigma // 2))
    reps[0::2] = base
    reps[1::2] = 2 * base
    vals = np.repeat(np.arange(sigma, dtype=np.uint32), reps)
    rng = np.random.default_rng(0)
    rng.shuffle(vals)
    return vals


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=24, help="log2 n")
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--lanes", type=int, default=4096)
    ap.add_argument("--sigmas", default="2048,4096,8192,16384,32768,"
                    "65536,131072")
    args = ap.parse_args()

    from ans_tpu import models, runtime
    runtime.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ans_tpu.models import framing
    from ans_tpu.models.ans import AnsInt
    from ans_tpu.ops import escape, lane_codec, pallas_decode, tables

    n = 1 << args.n
    S = args.lanes
    for sigma in (int(s) for s in args.sigmas.split(",")):
        values = mixed_data(sigma, n)
        nv = len(values)
        codec = AnsInt(lanes=S)
        blob = codec.encode(values)
        dt, off = codec._dec_table(blob)
        nfq = dt.nfreqs
        assert escape.plan_from_freqs(nfq) is None or sigma <= (1 << 13)
        rows = {}
        engines = ["grouped"] if dt.layout is not None else ["search"]
        if dt.frame_size <= (1 << 16):
            engines.append("direct")
        for eng in engines:
            try:
                prep = models.prepare_decoder("ANS", blob, nv,
                                              engine=eng)
                first = prep.to_host(prep())
                assert np.array_equal(first, values), eng
                best = min(_t(lambda: prep().block_until_ready())
                           for _ in range(args.runs))
                rows[eng] = nv / best
            except Exception as e:  # engine cannot stage this table
                rows[eng] = f"{type(e).__name__}"[:40]
        if dt.layout is not None:
            # counterfactual value-cumulative wire for the search kernel
            et = tables.build_enc_table(nfq, None)
            T = lane_codec.lane_steps(nv, S)
            pad = T * S - nv
            m_ts = jnp.asarray(np.pad(values, (0, pad)).reshape(T, S))
            k_ts = jnp.zeros((T, S), jnp.uint32)
            b_ts = jnp.zeros((T, S, 3), jnp.uint8)
            stream, total, states, sb = lane_codec.encode_lanes(
                m_ts, k_ts, b_ts, jnp.int32(nv), jnp.asarray(et.freq),
                jnp.asarray(et.base), jnp.asarray(et.ub), S=S, T=T,
                log2m=et.log2m)
            total = int(total)
            t_sec, sec_len = framing.choose_sections(
                np.asarray(sb), total, T)
            st = tables.build_search_table(nfq)
            a, kw = pallas_decode.stage_search(
                np.asarray(stream[:total]), np.asarray(states), st, nv,
                S=S, T=T, t_sec=t_sec, sec_len=sec_len)
            out = pallas_decode._call_search(*a, **kw)
            got = np.asarray(out).reshape(-1)[:nv]
            if st.val is not None:
                got = np.asarray(st.val)[got]
            assert np.array_equal(got.astype(np.uint32), values), "cf"
            best = min(_t(lambda: pallas_decode._call_search(
                *a, **kw).block_until_ready()) for _ in range(args.runs))
            rows["search*"] = nv / best
        print({"sigma": sigma, "frame": dt.frame_size,
               **{k: (round(v / 1e6, 1) if isinstance(v, float) else v)
                  for k, v in rows.items()}},
              flush=True)


if __name__ == "__main__":
    main()
