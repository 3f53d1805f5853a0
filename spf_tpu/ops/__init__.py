"""Crypto/math ops: the TFHE kernel layer (≙ reference `sunscreen_tfhe`)."""
