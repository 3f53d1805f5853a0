"""Safe (de)serialization of ciphertexts and keys.

(≙ reference `parasol_runtime/src/safe_bincode.rs:1-116`: the `GetSize`
trait computes exact params-derived buffer sizes so deserialization of
untrusted payloads is bounded and shape-checked.)

Arrays are stored as .npz with explicit dtype/shape validation against
the parameter set before any use — a malformed or oversized payload is
rejected, never trusted.
"""

from __future__ import annotations

import io

import numpy as np

from ..params import Params


class DeserializationError(Exception):
    pass


def expected_shapes(params: Params) -> dict:
    """Exact array shapes for every L-typed entity at `params`
    (the analog of `GetSize::get_size`)."""
    n0 = params.l0_params.dim
    k = params.l1_params.size
    n = params.l1_params.degree
    l_cbs = params.cbs_radix.count
    return {
        "lwe0": (n0 + 1,),
        "lwe1": (k * n + 1,),
        "glwe1": (k + 1, n),
        "glev1": (l_cbs, k + 1, n),
        "ggsw1": (k + 1, l_cbs, k + 1, n),
        "lwe0_sk": (n0,),
        "glwe1_sk": (k, n),
        "ksk": (k * n, params.ks_radix.count, n0 + 1),
    }


def serialize(kind: str, array, params: Params) -> bytes:
    arr = np.asarray(array)
    _check(kind, arr, params)
    buf = io.BytesIO()
    np.savez_compressed(buf, kind=kind, data=arr)
    return buf.getvalue()


def deserialize(data: bytes, kind: str, params: Params) -> np.ndarray:
    """Validate and load an untrusted payload; size is bounded before
    parsing (`safe_bincode.rs` bounds malicious payloads)."""
    shapes = expected_shapes(params)
    if kind not in shapes:
        raise DeserializationError(f"unknown entity kind {kind!r}")
    max_bytes = int(np.prod(shapes[kind])) * 8 * 4 + 4096
    if len(data) > max_bytes:
        raise DeserializationError(
            f"payload of {len(data)} bytes exceeds bound {max_bytes} for {kind}"
        )
    with np.load(io.BytesIO(data)) as f:
        if str(f["kind"]) != kind:
            raise DeserializationError(f"expected {kind}, got {f['kind']}")
        arr = f["data"]
    _check(kind, arr, params)
    return arr


def _check(kind: str, arr: np.ndarray, params: Params) -> None:
    shapes = expected_shapes(params)
    if kind not in shapes:
        raise DeserializationError(f"unknown entity kind {kind!r}")
    if arr.shape != shapes[kind]:
        raise DeserializationError(
            f"{kind}: shape {arr.shape} != expected {shapes[kind]}"
        )
    if arr.dtype != np.uint64:
        raise DeserializationError(f"{kind}: dtype {arr.dtype} != uint64")
