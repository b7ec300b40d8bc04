"""Paper Figure 11: BPI vs fold fidelity (encode-only).

reference: src/fold_effectiveness.cpp:132-148 — ANSfold and ANSrfold at
f = 1..8 per dataset.
"""

from __future__ import annotations

from .. import models
from . import _cli


def run(inputs, engine="lane"):
    rows = []
    for input_name, values in inputs:
        for fam in ("ANSfold", "ANSrfold"):
            for f in range(1, 9):
                codec = models.get(f"{fam}-{f}", engine)
                blob = codec.encode(values)
                bpi = 8.0 * len(blob) / len(values)
                print(f"{input_name};{fam};{f};{bpi:.4f}", flush=True)
                rows.append((input_name, fam, f, bpi))
    return rows


def main(argv=None):
    p = _cli.make_parser("BPI vs fold fidelity", methods_arg=True)
    args = p.parse_args(argv)
    run(_cli.load_inputs(args), getattr(args, "engine", "lane"))


if __name__ == "__main__":
    main()
