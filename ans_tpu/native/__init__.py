"""Native (C++) runtime bindings.

`lib` is None until the extension is built (python -m ans_tpu.native.build);
all callers fall back to pure-Python paths when it is unavailable.
"""

lib = None

try:  # pragma: no cover - exercised only when the extension is built
    from .binding import NativeLib

    lib = NativeLib.try_load()
except Exception:  # pragma: no cover
    lib = None
