"""Boolean circuit layer: CMux-gate circuits for integer arithmetic
(≙ reference `mux_circuits` crate)."""

from .mux import MuxCircuit  # noqa: F401
from . import integer  # noqa: F401
