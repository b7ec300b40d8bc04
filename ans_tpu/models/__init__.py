"""Codec registry — the counterpart of the reference's uniform methods
interface (reference: include/methods.hpp:41-637).

Every codec exposes `encode(values) -> bytes` and
`decode(buf, n) -> np.uint32 array` (decode is size-directed, like the
reference).  Two engines per ANS method:

  * "lane"   - TPU-native S-lane wire format (ops.lane_codec, default)
  * "compat" - bit-exact reference wire format (reference_model.rans_compat)
"""

from __future__ import annotations

from ..reference_model import rans_compat as _rc
from . import ans as _lane

_LANE = {
    "ANS": lambda: _lane.AnsInt(),
    "ANSmsb": lambda: _lane.AnsMsb(),
    **{f"ANSfold-{f}": (lambda f=f: _lane.AnsFold(f)) for f in range(1, 9)},
    **{f"ANSrfold-{f}": (lambda f=f: _lane.AnsReorderFold(f))
       for f in range(1, 9)},
    **{f"ANSsint-{h}": (lambda h=h: _lane.AnsSint(h))
       for h in (1, 5, 10, 20, 40, 80, 160, 320)},
    **{f"ANSsmsb-{h}": (lambda h=h: _lane.AnsSmsb(h))
       for h in (1, 5, 10, 20, 40, 80, 160, 320)},
}

_COMPAT = {
    "ANS": lambda: _rc.AnsInt(),
    "ANSmsb": lambda: _rc.AnsMsb(),
    **{f"ANSfold-{f}": (lambda f=f: _rc.AnsFold(f)) for f in range(1, 9)},
    **{f"ANSrfold-{f}": (lambda f=f: _rc.AnsReorderFold(f))
       for f in range(1, 9)},
    **{f"ANSsint-{h}": (lambda h=h: _rc.AnsSint(h))
       for h in (1, 5, 10, 20, 40, 80, 160, 320)},
    **{f"ANSsmsb-{h}": (lambda h=h: _rc.AnsSmsb(h))
       for h in (1, 5, 10, 20, 40, 80, 160, 320)},
}


def available(engine: str = "lane"):
    return sorted(_LANE if engine == "lane" else _COMPAT)


def get(name: str, engine: str = "lane"):
    reg = {"lane": _LANE, "compat": _COMPAT}[engine]
    if name not in reg:
        raise KeyError(f"unknown method {name!r}; known: {sorted(reg)}")
    return reg[name]()
