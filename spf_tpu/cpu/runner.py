"""One-call program runner (≙ reference `parasol_cpu/src/runner.rs:10-27`)."""

from __future__ import annotations

from ..runtime.evaluation import Evaluation
from .args import CallData
from .memory import Memory
from .processor import FheComputer


def run_program(
    ev: Evaluation,
    elf_or_memory,
    name: str,
    call_data: CallData,
    gas_limit: int | None = None,
):
    """Load `elf_or_memory` (ELF bytes or a prepared Memory), look up the
    function entry, and run it on an `FheComputer` bound to `ev`.

    Returns (memory, return_ptr, computer)."""
    if isinstance(elf_or_memory, (bytes, bytearray)):
        memory = Memory.new_from_elf(bytes(elf_or_memory))
        entry = memory.get_function_entry(name)
    else:
        memory = elf_or_memory
        entry = memory.get_function_entry(name) if name else 0
    proc = FheComputer(ev)
    return_ptr = proc.run_program(entry, memory, call_data, gas_limit)
    return memory, return_ptr, proc
