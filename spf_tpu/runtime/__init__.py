"""Runtime layer: keys, high-level encryption, evaluation, circuits,
and the batched circuit executor (≙ reference `parasol_runtime`)."""

from .keys import ComputeKey, PublicKey, SecretKey, generate_keys  # noqa: F401
from .encryption import Encryption  # noqa: F401
from .evaluation import Evaluation  # noqa: F401
