"""NumPy golden model: bit-exact re-expression of the reference wire formats.

Everything here is host-side, sequential, and test-oriented; it is the
oracle against which the TPU lane codecs (ans_tpu.ops / ans_tpu.models)
are validated.
"""

from . import bitio, interp, mappings, model, rans_compat, vbyte  # noqa: F401
