"""Dither — subtractive dither at a target bit depth.

TPU-native rebuild of src/source/dither.rs: output = x - noise * lsb where
lsb = 1 / 2^(bits-1) and the noise algorithm is one of TPDF (default,
triangular), RPDF (uniform), GPDF (gaussian), HighPass (blue, independent
per channel). Counter-based jax.random, one [C, T] noise block per emit.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.node import Node, State, mask_block
from ..core.types import check_bit_depth, float_dtype
from ..sources.noise import GAUSSIAN_STD

ALGORITHMS = ("tpdf", "rpdf", "gpdf", "highpass")


class Dither(Node):
    def __init__(self, input_node: Node, target_bits: int,
                 algorithm: str = "tpdf", seed: int = 0):
        algorithm = algorithm.lower()
        if algorithm not in ALGORITHMS:
            raise ValueError(f"unknown dither algorithm {algorithm!r}")
        self.input = input_node
        self.spec = input_node.spec
        self.algorithm = algorithm
        bits = check_bit_depth(target_bits)
        self.lsb_amplitude = float(1.0 / (1 << (bits - 1)))
        self.seed = seed

    def total_frames(self) -> Optional[int]:
        return self.input.total_frames()

    def init_state(self) -> State:
        st = {
            "in": self.input.init_state(),
            "key": jax.random.key(self.seed),
            "i": jnp.zeros((), dtype=jnp.int32),
        }
        if self.algorithm == "highpass":
            # last white sample per channel, carried across blocks so the
            # differentiated (blue) noise is continuous at block boundaries
            # and independent of block size (same carry as sources.noise.Blue)
            st["prev"] = jnp.zeros((self.spec.channels,), dtype=float_dtype())
        return st

    def _noise(self, key, c, n, prev=None):
        dt = float_dtype()
        if self.algorithm == "tpdf":
            u = jax.random.uniform(key, (2, c, n), dtype=dt)
            return u[0] - u[1], None
        if self.algorithm == "rpdf":
            return jax.random.uniform(key, (c, n), dtype=dt, minval=-1.0,
                                      maxval=1.0), None
        if self.algorithm == "gpdf":
            return jax.random.normal(key, (c, n), dtype=dt) * GAUSSIAN_STD, None
        # highpass: independent blue noise per channel = differentiated white,
        # differenced against the carried previous white sample
        u = jax.random.uniform(key, (c, n), dtype=dt, minval=-1.0, maxval=1.0)
        shifted = jnp.concatenate([prev[:, None], u[:, :-1]], axis=1)
        return u - shifted, u[:, -1]

    def emit(self, state: State, n: int):
        s, block, valid = self.input.emit(state["in"], n)
        k = jax.random.fold_in(state["key"], state["i"])
        noise, new_prev = self._noise(k, self.spec.channels, n,
                                      state.get("prev"))
        out = block - noise * self.lsb_amplitude
        out = mask_block(out, valid)
        new = {"in": s, "key": state["key"], "i": state["i"] + n}
        if self.algorithm == "highpass":
            new["prev"] = new_prev
        return new, out, valid
