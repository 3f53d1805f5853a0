"""The encrypted "Parasol" CPU: a 64-register, 32-bit-address processor
executing a custom ISA over plaintext or encrypted registers/memory
(≙ reference `parasol_cpu`)."""

from .isa import Instr, decode, encode  # noqa: F401
from .memory import Memory, Byte  # noqa: F401
from .processor import FheComputer  # noqa: F401
from .args import ArgsBuilder  # noqa: F401
from .runner import run_program  # noqa: F401
