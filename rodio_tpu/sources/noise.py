"""Noise generator family.

TPU-native rebuild of src/source/noise.rs. The reference draws one sample at
a time from a stateful SmallRng; the block engine uses counter-based
`jax.random` (threefry): every block's randomness is a pure function of
(key, block_counter), so generation is stateless-parallel and reproducible —
the idiomatic TPU RNG design. Mono, infinite, as in the reference.

Family (constants match src/source/noise.rs):
- WhiteUniform  — U[-1, 1] (RPDF), variance 1/3
- WhiteTriangular — Triangular(-1, 1, 0) (TPDF)
- WhiteGaussian — Normal(0, 0.6) (GPDF)
- Velvet — one +-1 impulse per grid cell, default density 2000/s (:434)
- Pink — Voss-McCartney, 16 octave generators (:427); here each octave
  generator's value is the closed form uniform(key_i, t >> i), so the whole
  block is one gather-free vectorized sum — no sequential state at all
- Blue — differentiated white (:546), Violet — differentiated blue (:614)
- Brownian / Red — leaky-integrated Gaussian/uniform white, 5 Hz leak
  center frequency, variance-normalized (IntegratedNoise, :701-716)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.node import Node, State
from ..core.types import StreamSpec, float_dtype
from ..ops.scan import linear_scan

PINK_NOISE_GENERATORS = 16
VELVET_DEFAULT_DENSITY = 2000
UNIFORM_STD = float(np.sqrt(1.0 / 3.0))
TRIANGULAR_STD = float(2.0 / np.sqrt(6.0))
GAUSSIAN_STD = 0.6


class _NoiseBase(Node):
    def __init__(self, sample_rate: int, seed: int = 0):
        self.spec = StreamSpec(1, sample_rate)
        self.seed = seed

    def total_frames(self) -> Optional[int]:
        return None

    def init_state(self) -> State:
        return {
            "key": jax.random.key(self.seed),
            "i": jnp.zeros((), dtype=jnp.int32),
        }

    def _block_key(self, state):
        return jax.random.fold_in(state["key"], state["i"])

    def _advance(self, state, n):
        return {"key": state["key"], "i": state["i"] + n}


class WhiteUniform(_NoiseBase):
    def std_dev(self):
        return UNIFORM_STD

    def emit(self, state: State, n: int):
        k = self._block_key(state)
        block = jax.random.uniform(
            k, (1, n), dtype=float_dtype(), minval=-1.0, maxval=1.0
        )
        return self._advance(state, n), block, jnp.int32(n)


class WhiteTriangular(_NoiseBase):
    def std_dev(self):
        return TRIANGULAR_STD

    def emit(self, state: State, n: int):
        k = self._block_key(state)
        u = jax.random.uniform(k, (2, 1, n), dtype=float_dtype())
        block = u[0] - u[1]  # Triangular(-1, 1, mode 0)
        return self._advance(state, n), block, jnp.int32(n)


class WhiteGaussian(_NoiseBase):
    def mean(self):
        return 0.0

    def std_dev(self):
        return GAUSSIAN_STD

    def emit(self, state: State, n: int):
        k = self._block_key(state)
        block = jax.random.normal(k, (1, n), dtype=float_dtype()) * GAUSSIAN_STD
        return self._advance(state, n), block, jnp.int32(n)


class Velvet(_NoiseBase):
    """Sparse +-1 impulses, one per grid cell (src/source/noise.rs:359-457).

    Block engine: cell c's impulse offset and sign are pure functions of
    (key, c), so any block is computed directly from sample indices."""

    def __init__(self, sample_rate: int, density: int = VELVET_DEFAULT_DENSITY,
                 seed: int = 0):
        super().__init__(sample_rate, seed)
        if density <= 0:
            raise ValueError("density must be positive")
        self.grid_size = int(np.ceil(sample_rate / density))

    def emit(self, state: State, n: int):
        g = self.grid_size
        t = state["i"] + jnp.arange(n, dtype=jnp.int32)
        cell = t // g
        pos_in_cell = t % g
        cell_key = jax.vmap(lambda c: jax.random.fold_in(state["key"], c))(cell)
        bits = jax.vmap(
            lambda k: jax.random.randint(k, (2,), 0, 2 * g)
        )(cell_key)  # [n, 2]
        impulse_pos = bits[:, 0] % g
        sign = jnp.where(bits[:, 1] % 2 == 0, 1.0, -1.0)
        out = jnp.where(pos_in_cell == impulse_pos, sign, 0.0)
        block = out[None, :].astype(float_dtype())
        return self._advance(state, n), block, jnp.int32(n)


class Pink(_NoiseBase):
    """Voss-McCartney pink noise (src/source/noise.rs:427-514 semantics).

    Octave generator i holds a fresh uniform value for 2^i samples. Here
    value_i(t) = uniform(fold_in(key, (i, t >> i))) — a closed form over the
    sample index, so the 16-generator sum vectorizes with zero carries. The
    spectrum matches the reference construction; the sample path differs
    (different RNG), as with all noise sources."""

    def emit(self, state: State, n: int):
        t = state["i"] + jnp.arange(n, dtype=jnp.int32)

        def gen_value(i, t):
            epoch = t >> i
            k = jax.random.fold_in(
                jax.random.fold_in(state["key"], i), epoch
            )
            return jax.random.uniform(
                k, (), dtype=float_dtype(), minval=-1.0, maxval=1.0
            )

        def one_gen(i):
            return jax.vmap(lambda tt: gen_value(i, tt))(t)

        vals = jax.vmap(one_gen)(jnp.arange(PINK_NOISE_GENERATORS,
                                            dtype=jnp.int32))  # [16, n]
        block = (jnp.sum(vals, axis=0) / PINK_NOISE_GENERATORS)[None, :]
        return self._advance(state, n), block.astype(float_dtype()), jnp.int32(n)


class Blue(_NoiseBase):
    """Differentiated white (src/source/noise.rs:546-608)."""

    def init_state(self) -> State:
        st = super().init_state()
        st["prev"] = jnp.zeros((), dtype=float_dtype())
        return st

    def emit(self, state: State, n: int):
        k = self._block_key(state)
        white = jax.random.uniform(
            k, (n,), dtype=float_dtype(), minval=-1.0, maxval=1.0
        )
        prev = jnp.concatenate([state["prev"][None], white[:-1]])
        block = (white - prev)[None, :]
        new = self._advance(state, n)
        new["prev"] = white[-1]
        return new, block, jnp.int32(n)


class Violet(_NoiseBase):
    """Differentiated blue (src/source/noise.rs:614-695)."""

    def init_state(self) -> State:
        st = super().init_state()
        st["prev_white"] = jnp.zeros((), dtype=float_dtype())
        st["prev_blue"] = jnp.zeros((), dtype=float_dtype())
        return st

    def emit(self, state: State, n: int):
        k = self._block_key(state)
        white = jax.random.uniform(
            k, (n,), dtype=float_dtype(), minval=-1.0, maxval=1.0
        )
        prev_w = jnp.concatenate([state["prev_white"][None], white[:-1]])
        blue = white - prev_w
        prev_b = jnp.concatenate([state["prev_blue"][None], blue[:-1]])
        violet = (blue - prev_b)[None, :]
        new = self._advance(state, n)
        new["prev_white"] = white[-1]
        new["prev_blue"] = blue[-1]
        return new, violet, jnp.int32(n)


class _Integrated(_NoiseBase):
    """Leaky integrator over a white source (src/source/noise.rs:701-716):
    acc' = acc*leak + white; output acc*scale. The integration is a linear
    first-order recurrence -> scan op."""

    white_std = 1.0

    def __init__(self, sample_rate: int, seed: int = 0):
        super().__init__(sample_rate, seed)
        center_freq_hz = 5.0
        leak = 1.0 - (2.0 * np.pi * center_freq_hz) / sample_rate
        variance = (self.white_std ** 2) / (1.0 - leak * leak)
        self.leak = float(leak)
        self.scale = float(1.0 / np.sqrt(variance))

    def init_state(self) -> State:
        st = super().init_state()
        st["acc"] = jnp.zeros((1,), dtype=float_dtype())
        return st

    def _white(self, key, n):
        raise NotImplementedError

    def emit(self, state: State, n: int):
        k = self._block_key(state)
        white = self._white(k, n)[None, :]  # [1, n]
        acc = linear_scan(
            jnp.full_like(white, self.leak), white, state["acc"], mode="exact"
        )
        block = acc * self.scale
        new = self._advance(state, n)
        new["acc"] = acc[:, -1]
        return new, block.astype(float_dtype()), jnp.int32(n)


class Brownian(_Integrated):
    """Leaky-integrated Gaussian white (src/source/noise.rs:738)."""

    white_std = GAUSSIAN_STD

    def _white(self, key, n):
        return jax.random.normal(key, (n,), dtype=float_dtype()) * GAUSSIAN_STD


class Red(_Integrated):
    """Leaky-integrated uniform white (src/source/noise.rs:821)."""

    white_std = UNIFORM_STD

    def _white(self, key, n):
        return jax.random.uniform(
            key, (n,), dtype=float_dtype(), minval=-1.0, maxval=1.0
        )
