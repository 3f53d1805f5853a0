"""Support utilities: safe serialization, noise measurement."""
