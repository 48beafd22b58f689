"""The live-feed StreamFarm at MULTI-CHIP scale (VERDICT r4 ask #3).

``StreamFarm`` proves the constant-memory production path on one chip:
host packet-loop decode -> per-stream FIFOs -> device chunk ring -> fused
mega-kernel. This module scales exactly that path over a device mesh:

  [host]   ONE HostDecodePool over all N files (decode workers are a
           host resource — sharding them per chip would oversubscribe
           the cores, not the chips)
             -> one global wide block [N*C, push], stream-major rows
  [xfer]   jax.device_put with a mesh sharding: each chip receives ONLY
           its shard's [N*C/n_dev, push] slice (the transfer itself is
           sharded; no chip ever holds the full block)
  [device] ONE jitted SPMD program per block: per-chip ChunkRingFeed
           push -> per-chip fused mega-kernel on its local streams ->
           one psum over the mesh for the [C, T] mix (ICI; hierarchical
           over a hybrid ("dcn", "streams") mesh) -> master limiter
           in-shard on the replicated mix.

The analog of the reference's audio callback pulling while the app
thread queues sources (src/stream.rs:536-548), with the pull cadence
replaced by the push ring and the mixer's tree sum by the mesh psum
(src/mixer.rs:185-198).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..core.types import StreamSpec, float_dtype
from .farm import (
    HostDecodePool,
    _find_state_with,
    _get_path,
    _set_path,
    _wire_decode,
    _wire_encode,
)
from .sharding import ShardedFusedPipeline, _axes_tuple, _lead_spec


class ShardedFusedFarm:
    """DEVICE core of the sharded farm: per-shard chunk-ring feeds under
    a :class:`~rodio_tpu.parallel.sharding.ShardedFusedPipeline`, plus
    the push+emit SPMD step. Takes HOST blocks (so the multichip dryrun
    can drive it with synthesized PCM, no decoder required); the full
    :class:`ShardedStreamFarm` layers live file decode on top."""

    def __init__(self, mesh, n_streams: int, channels: int, in_rate: int,
                 out_rate: int, block_frames: int, *, gains=None,
                 low_pass: Optional[float] = 2000.0, wire: str = "f32",
                 axis="streams", master_mode: str = "auto", m: int = 2):
        import math

        import jax.numpy as jnp

        from ..flagship import ChunkRingFeed, FusedFarmPipeline
        from ..ops.fused import LANES

        self.mesh = mesh
        self.axis = _axes_tuple(axis)
        n_dev = int(np.prod([mesh.shape[a] for a in self.axis]))
        assert n_streams % n_dev == 0, (
            f"{n_streams} streams not divisible by {n_dev} devices"
        )
        self.n_dev = n_dev
        self.n_streams = n_streams
        s_local = n_streams // n_dev
        C = channels
        assert s_local * C <= LANES
        g = math.gcd(in_rate, out_rate)
        fr, to = in_rate // g, out_rate // g
        assert fr != to and to >= 2, (
            "fused farm needs a non-identity rational rate ratio"
        )
        assert block_frames % (m * to) == 0, (
            f"sharded farm block must be a multiple of {m * to}"
        )
        self.block_frames = block_frames
        self.spec_in = StreamSpec(C, in_rate)
        self._fr = int(fr)
        self._Kp = block_frames // to
        self.push_frames = self._Kp * self._fr
        assert wire in ("f32", "i16", "i24")
        self.wire = wire
        if gains is None:
            gains = np.full(n_streams, 1.0 / n_streams, np.float32)
        gains = np.asarray(gains, np.float32)
        per_lane = (np.repeat(gains, C) if gains.shape == (n_streams,)
                    else gains)
        assert per_lane.shape == (n_streams * C,)
        # i16 wire: raw ring + lossless int2 pieces (see StreamFarm)
        lossless_int2 = wire == "i16"
        feeds = [
            ChunkRingFeed(
                s_local * C, in_rate, self._fr, self._Kp, 4 * self._Kp,
                "int2" if lossless_int2 else "int3",
                per_lane[d * s_local * C : (d + 1) * s_local * C],
                gain_post=lossless_int2,
            )
            for d in range(n_dev)
        ]
        self._feeds = feeds

        def build(S_local, shard):
            assert S_local == s_local
            return FusedFarmPipeline(
                feeds[shard], out_rate, S_local,
                "low_pass" if low_pass is not None else None,
                low_pass if low_pass is not None else 2000.0, 0.5, m=m,
            )

        self.pipe = ShardedFusedPipeline(
            build, n_streams, mesh, axis=axis, master_mode=master_mode
        )
        self._feed_path = _find_state_with(
            self.pipe.template.init_state(), ("chunks", "carry", "w")
        )
        self._jits = None
        # block sharding: leading device axis 1-per-chip (i24 wire adds
        # a trailing byte dim)
        self._extra_dims = 1 if wire == "i24" else 0

    # ---- device plumbing ----

    def init_state(self):
        return self.pipe.init_state()

    def _block_sharding(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        lead = _lead_spec(self.axis)
        return NamedSharding(
            self.mesh, P(lead, *([None] * (2 + self._extra_dims)))
        )

    def _make_jits(self):
        import jax
        import jax.numpy as jnp
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        pipe = self.pipe
        local = pipe.template
        master = pipe.master
        feed = self._feeds[0]
        path = self._feed_path
        wire = self.wire
        n = self.block_frames
        axis = pipe.axis
        lead = _lead_spec(axis)
        chain_specs = pipe._chain_specs
        rep_specs = jax.tree_util.tree_map(
            lambda _: P(), master.init_state()
        )
        bspec = P(lead, *([None] * (2 + self._extra_dims)))
        tmap = jax.tree_util.tree_map

        def prime_chip(chain_state, blk):
            cs = tmap(lambda x: x[0], chain_state)
            fs = _get_path(cs, path)
            fs = feed.push(fs, _wire_decode(blk[0], wire), prime=True)
            cs = _set_path(cs, path, fs)
            return tmap(lambda x: x[None], cs)

        prime_fn = jax.jit(shard_map(
            prime_chip, mesh=self.mesh,
            in_specs=(chain_specs, bspec),
            out_specs=chain_specs, check_rep=False,
        ))

        def step_chip(chain_state, master_state, blk):
            cs = tmap(lambda x: x[0], chain_state)
            fs = _get_path(cs, path)
            fs = feed.push(fs, _wire_decode(blk[0], wire))
            cs = _set_path(cs, path, fs)
            cs, part, valid = local.emit(cs, n)
            mix = jax.lax.psum(part, axis)
            valid = jax.lax.pmax(valid, axis)
            mst, out, v = master.emit(
                {**master_state, "in": {"blk": mix, "v": valid}}, n
            )
            mst = {**mst, "in": {}}
            return tmap(lambda x: x[None], cs), mst, out, v

        step_fn = jax.jit(shard_map(
            step_chip, mesh=self.mesh,
            in_specs=(chain_specs, rep_specs, bspec),
            out_specs=(chain_specs, rep_specs, P(), P()),
            check_rep=False,
        ))
        return prime_fn, step_fn

    def _shard_block(self, block: np.ndarray):
        """[S*C, T] global wide block -> sharded device array
        [n_dev, S*C/n_dev, T]: stream-major rows mean shard d's slice is
        rows [d*S_local*C, (d+1)*S_local*C)."""
        import jax

        wideC = block.shape[0]
        enc = _wire_encode(block, self.wire)
        # reshape from the ENCODED shape — the i24 wire appends a
        # trailing byte dim (round-5 sharded-farm fuzzer finding)
        blk = enc.reshape(
            (self.n_dev, wideC // self.n_dev) + enc.shape[1:]
        )
        return jax.device_put(blk, self._block_sharding())

    def prime_push(self, state, host_block: np.ndarray):
        """Push the priming block ([S*C, (Kp+1)*fr] global)."""
        if self._jits is None:
            self._jits = self._make_jits()
        chain = self._jits[0](state["chain"], self._shard_block(host_block))
        return {**state, "chain": chain}

    def step(self, state, host_block: np.ndarray):
        """One SPMD block step: push [S*C, Kp*fr] + fused emit + psum mix
        + master limit. Returns (state', [C, T] mix, valid)."""
        if self._jits is None:
            self._jits = self._make_jits()
        mst_in = dict(state["master"])
        mst_in["in"] = {}
        chain, mst, out, v = self._jits[1](
            state["chain"], mst_in, self._shard_block(host_block)
        )
        return {**state, "chain": chain, "master": mst}, out, v

    def overflow(self, state) -> bool:
        import jax

        fs = _get_path(state["chain"], self._feed_path)
        return bool(np.any(jax.device_get(fs["overflow"])))

    # live knobs at farm scale (delegate to the sharded pipeline)
    def retune(self, state, **kw):
        return self.pipe.retune(state, **kw)


class ShardedStreamFarm:
    """N distinct compressed FILES -> one mixed output, sharded over a
    device mesh: :class:`~rodio_tpu.parallel.farm.HostDecodePool` feeds
    a :class:`ShardedFusedFarm`. The host assembly of block k+1 overlaps
    the (async) SPMD device step k, exactly like the single-chip farm."""

    def __init__(self, paths: Sequence[str], mesh, *,
                 out_rate: int = 48000, block_frames: int = 4096,
                 gains=None, low_pass: Optional[float] = 2000.0,
                 start_offsets: Optional[Sequence[float]] = None,
                 loop: bool = True, chunk_frames: int = 8192,
                 decode_workers: int = 8, wire: str = "f32",
                 axis="streams", master_mode: str = "auto"):
        self._host = HostDecodePool(
            paths, out_rate=out_rate, chunk_frames=chunk_frames,
            decode_workers=decode_workers, start_offsets=start_offsets,
            loop=loop,
        )
        self.spec_in = self._host.spec_in
        self.n_streams = self._host.n_streams
        self.core = ShardedFusedFarm(
            mesh, self.n_streams, self.spec_in.channels,
            self.spec_in.sample_rate, out_rate, block_frames,
            gains=gains, low_pass=low_pass, wire=wire, axis=axis,
            master_mode=master_mode,
        )
        self.block_frames = block_frames
        self._push = self.core.push_frames

    def try_seek(self, stream: int, seconds: float) -> int:
        """Sample-accurate live seek of one stream (HostDecodePool)."""
        return self._host.try_seek(stream, seconds)

    def run(self, n_blocks: int, *, on_block=None):
        """Drive n_blocks; returns (total_valid_frames, energy,
        overflow). Mirrors StreamFarm._run_fused with sharded pushes."""
        import jax.numpy as jnp

        core = self.core
        self._host.prime()
        state = core.init_state()
        fr, Kp = core._fr, core._Kp
        state = core.prime_push(
            state, self._host.assemble_frames((Kp + 1) * fr)
        )
        nxt = self._host.assemble_frames(self._push)
        energy_acc = jnp.zeros(())
        valid_acc = jnp.zeros((), jnp.int32)
        for k in range(n_blocks):
            self._host.schedule_refills(threshold=2 * self._push)
            state, out, valid = core.step(state, nxt)
            if k + 1 < n_blocks:
                nxt = self._host.assemble_frames(self._push)
            if on_block is not None:
                on_block(k, out, valid)
            valid_acc = valid_acc + valid
            energy_acc = energy_acc + jnp.sum(out * out)
            if (k + 1) % 32 == 0:
                int(valid_acc)  # bound the async dispatch queue
        total_valid = int(valid_acc)
        energy = float(energy_acc)
        overflow = core.overflow(state)
        self._final_state = state
        return total_valid, energy, overflow

    def close(self):
        self._host.close()
